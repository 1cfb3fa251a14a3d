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
    },
    // Time travel: read the FIRST snapshot of the streamed table (the
    // commit covering micro-batches 0–1, stamped graft.batch-id-max=1) —
    // the historical state must equal the batch derivation restricted to
    // the first two event_id chunks.
    "tt1_time_travel" -> { (s, dir) =>
      val root = StreamedTables.tableRoot(s, dir)
      val c = new graft.iceberg.IcebergCommitter(
        new graft.iceberg.LocalTableIO(root), EventTable.Topic)
      val first = c.load().get.snapshots
        .find(_.summary.get("graft.batch-id-max").contains("1"))
        .getOrElse(throw new IllegalStateException("missing first streamed snapshot"))
      EventTable
        .readCommitted(s, root, c.activeDataFilesAt(first.snapshotId))
        .groupBy(col("partition").cast("int").as("part_id"))
        .agg(count(lit(1)).as("n_events"), max("sequence").as("max_seq"))
    }
  )

  def oracles: Map[String, String] = Map(
    "s5_stream_ingest" -> Oracle.sql(
      """SELECT part_id, count(*) AS n_events, max(sequence) AS max_seq,
        |       min(timestamp_ms) AS min_ts, max(timestamp_ms) AS max_ts
        |FROM evlog GROUP BY 1""".stripMargin),
    // the first two of four event_id-contiguous chunks: chunk span is
    // max(event_id) // 4 + 1, mirroring StreamIngest.stageChunks
    "tt1_time_travel" -> Oracle.sql(
      """SELECT part_id, count(*) AS n_events, max(sequence) AS max_seq
        |FROM evlog
        |WHERE event_id < 2 * ((SELECT max(event_id) FROM ev) // 4 + 1)
        |GROUP BY 1""".stripMargin)
  )
}
