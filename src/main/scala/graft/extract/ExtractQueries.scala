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
    }
  )

  def oracles: Map[String, String] = Map(
    "x1_payload_extract" -> Oracle.sql(
      """SELECT part_id, count(*) AS n,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |       count(*) FILTER (json_extract_string(props, '$.k') IS NULL) AS n_null_k,
        |       count(*) FILTER (len(list_filter(json_keys(props), x -> x != 'k')) > 0) AS n_overflow
        |FROM raw GROUP BY 1""".stripMargin)
  )
}
