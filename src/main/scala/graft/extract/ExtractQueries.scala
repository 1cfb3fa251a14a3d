package graft.extract

import graft.core.{EventLog, Oracle}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked query over the structured-columns extraction (§1.3):
  * events' `props` payload extracted with config `[{k, path "k", Int32}]`,
  * aggregated per partition. Proves path resolution, Int32 coercion, and
  * overflow pruning end-to-end against DuckDB's JSON functions. */
object ExtractQueries {
  val config: TableSchemaConfig =
    TableSchemaConfig(fields = Seq(FieldSpec("k", "k", "Int32")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_payload_extract" -> { (s, dir) =>
      PayloadExtractor
        .extract(EventLog.raw(s, dir), col("props"), config)
        .groupBy("part_id")
        .agg(
          count(lit(1)).as("n"),
          sum("k").as("sum_k"),
          count(when(col("k").isNull, 1)).as("n_null_k"),
          count(when(col("_payload_overflow").isNotNull, 1)).as("n_overflow")
        )
    },
    // §1.3 committed: the extraction applied AT FLUSH TIME — the committed
    // table's files carry typed `k` + `_payload_overflow` instead of the
    // opaque payload, under the extended Iceberg schema (IDs 100+/99).
    "x2_extracted_committed" -> { (s, dir) =>
      val root = ExtractedTables.tableRoot(s, dir)
      graft.table.EventTable
        .readCommitted(s, root)
        .groupBy(col("partition").cast("int").as("part_id"))
        .agg(
          count(lit(1)).as("n"),
          sum("k").as("sum_k"),
          max("sequence").as("max_seq"),
          count(when(col("_payload_overflow").isNotNull, 1)).as("n_overflow")
        )
    }
  )

  def oracles: Map[String, String] = Map(
    "x1_payload_extract" -> Oracle.sql(
      """SELECT part_id, count(*) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |       count(*) FILTER (json_extract_string(props, '$.k') IS NULL) AS n_null_k,
        |       count(*) FILTER (len(list_filter(json_keys(props), x -> x != 'k')) > 0) AS n_overflow
        |FROM raw GROUP BY 1""".stripMargin),
    "x2_extracted_committed" -> Oracle.sql(
      """SELECT part_id, count(*) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |       max(sequence) AS max_seq,
        |       count(*) FILTER (len(list_filter(json_keys(props), x -> x != 'k')) > 0) AS n_overflow
        |FROM evlog GROUP BY 1""".stripMargin)
  )
}

/** One extracted committed table per (JVM, sfDir). */
object ExtractedTables {
  private val cache = scala.collection.mutable.Map.empty[String, String]

  def tableRoot(spark: SparkSession, sfDir: String): String = synchronized {
    cache.getOrElseUpdate(
      sfDir, {
        val root = java.nio.file.Files.createTempDirectory("graft-extracted-").toString
        graft.table.EventTable.ingestAndCommitExtracted(spark, sfDir, root, ExtractQueries.config)
        root
      }
    )
  }
}
