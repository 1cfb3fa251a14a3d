package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-batch idempotency dedup as KEYED STATE (S7 at scale).
  *
  * The reference keeps seen idempotency keys in RocksDB and answers each
  * write with a point lookup (`/root/reference/src/storage/rocksdb.rs:504-576`),
  * expiring them at a cleanup watermark (`rocksdb.rs:1150-1237`). The Spark
  * native equivalent is a stateful streaming operator: group the write
  * stream by (part_id, idempotency_key) and keep one boolean per key in the
  * state store — a distributed point lookup per key (per-executor RocksDB
  * by default; heap-backed opt-in for TTL-bounded state, see
  * [[StreamIngest]]), checkpoint-versioned so batch replays re-run against
  * the pre-batch state (exactly-once), and O(batch) per trigger instead of
  * the previous full anti-join re-scan of the committed table.
  *
  * Within a batch the FIRST event by (timestamp_ms, event_id) wins —
  * deterministic, matching [[graft.core.EventLog.deduped]]; Spark's own
  * `dropDuplicates` keeps an arbitrary row and would break oracle parity.
  *
  * `ttlMs` plays the reference's cleanup watermark: keys idle longer than
  * the TTL are evicted (a very-late retry after eviction re-ingests, the
  * same tradeoff the reference documents for its watermark).
  *
  * CAVEAT — set `ttlMs` only for continuous (`ProcessingTime`) triggers:
  * it registers ProcessingTimeTimeout per key, and an `AvailableNow`
  * backlog replay waits for every registered timeout before terminating —
  * a long TTL stalls the replay for the TTL's duration
  * ([[graft.llm.StreamingNearDup]] checks its horizon on arrival instead
  * for exactly this reason).
  */
object KeyedDedup {
  def apply(df: Dataset[Row], ttlMs: Option[Long] = None): Dataset[Row] = {
    val schema = df.schema
    val pIdx   = schema.fieldIndex("part_id")
    val kIdx   = schema.fieldIndex("idempotency_key")
    val tsIdx  = schema.fieldIndex("timestamp_ms")
    val eIdx   = schema.fieldIndex("event_id")
    val rowEnc = Encoders.row(schema)
    val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.STRING)
    val timeout =
      if (ttlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout

    df.groupByKey((r: Row) => (r.getInt(pIdx), r.getString(kIdx)))(keyEnc)
      .flatMapGroupsWithState[Boolean, Row](OutputMode.Append, timeout) {
        (key: (Int, String), rows: Iterator[Row], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          // NULL key = "no idempotency": the reference point-looks-up only
          // Some(key), so key-less events pass through undeduped and leave
          // no state behind (the (part, null) group would otherwise collapse
          // them to one event per partition forever). Handled INSIDE the
          // state function — a filter/union split upstream would scan every
          // staged micro-batch file twice. Key-less rows do funnel into one
          // (part, null) group per partition, but that parallelism bound is
          // the same as the per-partition sequencing window immediately
          // downstream, so it adds no new critical path; salting the group
          // would widen this stage only by breaking state-key schema
          // compatibility across restarts.
          else if (key._2 == null) rows
          else {
            val out =
              if (state.exists) Iterator.empty[Row]
              else {
                var best: Row = null
                rows.foreach { r =>
                  if (best == null ||
                      r.getLong(tsIdx) < best.getLong(tsIdx) ||
                      (r.getLong(tsIdx) == best.getLong(tsIdx) && r.getLong(eIdx) < best.getLong(eIdx)))
                    best = r
                }
                state.update(true)
                Iterator.single(best)
              }
            ttlMs.foreach(t => state.setTimeoutDuration(t))
            out
          }
      }(Encoders.scalaBoolean, rowEnc)
  }
}
