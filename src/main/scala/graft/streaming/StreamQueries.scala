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
  /** One streaming-windowed-agg result per (JVM, sfDir). */
  private val windowCache = scala.collection.mutable.Map.empty[String, String]

  /** Event-time windowed aggregation as a STRUCTURED STREAMING query:
    * watermarked 1-hour tumbling windows over the chunked raw stream
    * (`withWatermark` + `window()` — Spark's native streaming agg with
    * state-store-backed incremental windows). Complete output mode so the
    * result equals the batch derivation exactly; the append-mode
    * late-drop semantics are proven separately in StreamIngestSpec. */
  private def streamWindowTable(s: SparkSession, dir: String): String = synchronized {
    windowCache.getOrElseUpdate(dir, {
      val staging = java.nio.file.Files.createTempDirectory("graft-w2-stage-").toString
      val schema  = StreamIngest.stageChunks(s, dir, staging, nChunks = 3)
      val name    = s"w2_windows_${math.abs(dir.hashCode)}"
      val q = s.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
        .withColumn("ts", timestamp_millis(col("timestamp_ms")))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             min("timestamp_ms").as("min_ts"),
             max("timestamp_ms").as("max_ts"))
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      name
    })
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w2_stream_window" -> { (s, dir) =>
      val name = streamWindowTable(s, dir)
      s.table(name).select(
        unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"),
        col("n_events"),
        col("min_ts"),
        col("max_ts"))
    },
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
    // windows are tumbling hours in event time; raw (pre-dedup) stream —
    // the windowed agg observes every arriving event like the reference's
    // per-hour flush grouping does
    "w2_stream_window" -> Oracle.sql(
      """SELECT (timestamp_ms // 3600000) * 3600000 AS window_start_ms, event_type,
        |       count(*) AS n_events, min(timestamp_ms) AS min_ts, max(timestamp_ms) AS max_ts
        |FROM raw GROUP BY 1, 2""".stripMargin),
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
