package graft.streaming

import graft.core.Oracle
import graft.table.EventTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle gate for the streaming path: ingest the raw stream as 4 chunked
  * micro-batches (dedup → sequence continuation → size-targeted write →
  * snapshot batching → final flush), then read the COMMITTED table back.
  * The oracle is the batch derivation over the same events — streamed and
  * batch ingestion must converge to the identical committed state. */
object StreamQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s5_stream_ingest" -> { (s, dir) =>
      val root = StreamedTables.tableRoot(s, dir)
      EventTable
        .readCommitted(s, root)
        .groupBy(col("partition").cast("int").as("part_id"))
        .agg(
          count(lit(1)).as("n_events"),
          max("sequence").as("max_seq"),
          min("timestamp_ms").as("min_ts"),
          max("timestamp_ms").as("max_ts")
        )
    }
  )

  def oracles: Map[String, String] = Map(
    "s5_stream_ingest" -> Oracle.sql(
      """SELECT part_id, count(*) AS n_events, max(sequence) AS max_seq,
        |       min(timestamp_ms) AS min_ts, max(timestamp_ms) AS max_ts
        |FROM evlog GROUP BY 1""".stripMargin)
  )
}
