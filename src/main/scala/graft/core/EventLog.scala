package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Canonical partitioned event log — the reference's core abstraction.
  *
  * The reference (`/root/reference/src/contracts/storage.rs:204-211`) models a
  * topic as numeric partitions of `StoredEvent`s, each carrying a
  * per-partition monotonically increasing `sequence` (INV-1,
  * `/root/reference/SPEC.md:749`) assigned at write time
  * (`/root/reference/src/storage/sequence.rs:59-82`), with optional
  * idempotency-key dedup where a duplicate write is dropped and the original
  * offset returned (INV-4, `/root/reference/src/storage/rocksdb.rs:504-576`).
  *
  * Here the driver's `events.parquet` plays the role of the raw write stream:
  *   - `part_id`        = producer-chosen partition (derived `user_id % 8`)
  *   - `timestamp_ms`   = event time in epoch millis (reference `timestamp_ms`)
  *   - `idempotency_key`= retry semantics: every 97th event is a retry of the
  *                        previous event (same key), the rest are unique
  *   - `sequence`       = per-partition `row_number` over arrival order
  *                        (timestamp_ms, event_id) AFTER dedup — matching the
  *                        reference, where a duplicate never consumes a
  *                        sequence number
  *   - `event_date_days`/`event_hour` = derived partition columns, matching
  *     `derive_partition_columns` (`/root/reference/src/storage/parquet.rs:40-49`)
  *
  * Everything is pure declarative DataFrame API so Catalyst can push filters
  * and prune columns into the parquet scan; the per-partition sequence is a
  * window over `part_id` — at cluster scale this shuffles once by `part_id`
  * (8–4096 partitions) and never collects to the driver.
  */
object EventLog {
  /** Number of log partitions the synthetic producer writes to. */
  val NumPartitions = 8

  /** Raw write stream: derive partition, event-time ms, idempotency key.
    * `ts` is parquet TIMESTAMP(NANOS); read as raw Long nanos (exact) and
    * floor-divide to millis — float division would lose precision at 1.7e18.
    */
  def raw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$sfDir/events.parquet")
      .select(
        col("event_id"),
        expr("ts div 1000000").as("timestamp_ms"),
        col("user_id"),
        col("event_type"),
        col("value"),
        col("props"),
        pmod(col("user_id"), lit(NumPartitions)).cast("int").as("part_id"),
        concat(
          lit("k"),
          when(col("event_id") % 97 === 0 && col("event_id") > 0, col("event_id") - 1)
            .otherwise(col("event_id"))
            .cast("string")
        ).as("idempotency_key")
      )
  }

  /** Idempotency dedup (S7): first write per (part_id, key) wins; retries are
    * dropped. Mirrors the reference's `idem:` lookup short-circuit. */
  def deduped(rawDf: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(col("part_id"), col("idempotency_key"))
      .orderBy(col("timestamp_ms"), col("event_id"))
    rawDf
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** The committed log view (S6): per-partition monotonic sequences plus the
    * derived Iceberg partition columns. One shuffle on `part_id`; sequences
    * are dense 1..n per partition (reference seeds from the persisted HWM —
    * a fresh table starts at the same place). */
  def log(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("part_id")).orderBy(col("timestamp_ms"), col("event_id"))
    deduped(raw(spark, sfDir))
      .withColumn("sequence", row_number().over(w).cast("long"))
      .withColumn("event_date_days", expr("timestamp_ms div 86400000").cast("int"))
      .withColumn("event_hour", expr("(timestamp_ms div 3600000) % 24").cast("int"))
  }
}
