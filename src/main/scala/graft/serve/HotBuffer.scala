package graft.serve

import scala.collection.mutable

/** The reference's core record (`/root/reference/src/contracts/storage.rs:204-211`). */
final case class StoredEvent(
    sequence: Long,
    topic: String,
    partition: Int,
    payload: Array[Byte],
    timestampMs: Long,
    idempotencyKey: Option[String]
)

/** The L1 hot tier behind the HTTP gateway: per-(topic, partition) event
  * buffers with monotonic sequence assignment (S6), idempotency-key dedup
  * returning the ORIGINAL offset on duplicates (S7, INV-4 —
  * `/root/reference/src/storage/rocksdb.rs:504-576,637-710`), operational
  * reads (Q1/Q2/Q3/Q5), and post-flush cleanup with an optional retention
  * window (F11, `rocksdb.rs:1150-1237`).
  *
  * The reference stores this tier in RocksDB for durability; here the
  * durable tier is the Iceberg table itself (events are only evicted after
  * a snapshot commit covers them), so an in-memory buffer with the same
  * key semantics is the Spark-native analogue. All methods are synchronized
  * — this is the single-node front-end, not the distributed path.
  */
final class HotBuffer {
  private val events = mutable.Map.empty[(String, Int), mutable.ArrayBuffer[StoredEvent]]
  private val seqs   = mutable.Map.empty[(String, Int), Long]
  private val idem   = mutable.Map.empty[(String, Int, String), Long]

  /** Seed sequence counters from committed watermarks (F9 — the reference
    * seeds its AtomicU64 from the persisted HWM, `sequence.rs:59-82`). */
  def seed(topic: String, watermarks: Map[Int, Long]): Unit = synchronized {
    watermarks.foreach { case (p, wm) =>
      val k = (topic, p)
      if (seqs.getOrElse(k, 0L) < wm) seqs.update(k, wm)
    }
  }

  /** Returns (offset, isDuplicate); duplicates return the original offset
    * and consume no sequence number. */
  def write(topic: String, partition: Int, payload: Array[Byte], timestampMs: Long,
            idempotencyKey: Option[String]): (Long, Boolean) = synchronized {
    idempotencyKey.flatMap(k => idem.get((topic, partition, k))) match {
      case Some(orig) => (orig, true)
      case None =>
        val key  = (topic, partition)
        val next = seqs.getOrElse(key, 0L) + 1
        seqs.update(key, next)
        events.getOrElseUpdate(key, mutable.ArrayBuffer.empty) +=
          StoredEvent(next, topic, partition, payload, timestampMs, idempotencyKey)
        idempotencyKey.foreach(k => idem.update((topic, partition, k), next))
        (next, false)
    }
  }

  def topics: Seq[String] = synchronized { events.keys.map(_._1).toSeq.distinct.sorted }

  def partitions(topic: String): Seq[Int] = synchronized {
    events.keys.collect { case (t, p) if t == topic => p }.toSeq.sorted
  }

  /** Q1: offset range scan within one partition. */
  def readPartition(topic: String, partition: Int, fromSeq: Long, limit: Int): Seq[StoredEvent] =
    synchronized {
      events.getOrElse((topic, partition), mutable.ArrayBuffer.empty)
        .iterator.filter(_.sequence >= fromSeq).take(limit).toSeq
    }

  /** Q2+Q3: all-partition merge read ordered by event time, with optional
    * since filter (`rocksdb.rs:1017-1062`). */
  def readAll(topic: String, sinceMs: Option[Long], limit: Int): Seq[StoredEvent] = synchronized {
    events.iterator
      .collect { case ((t, _), buf) if t == topic => buf }
      .flatten
      .filter(e => sinceMs.forall(e.timestampMs >= _))
      .toSeq
      .sortBy(e => (e.timestampMs, e.partition, e.sequence))
      .take(limit)
  }

  /** All buffered events past the committed watermark — the flush input. */
  def pendingForFlush(topic: String, committed: Map[Int, Long]): Seq[StoredEvent] = synchronized {
    events.iterator.collect {
      case ((t, p), buf) if t == topic => buf.filter(_.sequence > committed.getOrElse(p, 0L))
    }.flatten.toSeq
  }

  /** Per-partition high watermark (highest assigned sequence). */
  def highWatermarks(topic: String): Map[Int, Long] = synchronized {
    seqs.collect { case ((t, p), s) if t == topic => p -> s }.toMap
  }

  def size(topic: String): Int = synchronized {
    events.iterator.collect { case ((t, _), buf) if t == topic => buf.size }.sum
  }

  /** F11: evict events covered by the committed watermark, except those
    * within the retention window; drop idempotency entries for evicted
    * events (the reference's cleanup-watermark semantics). */
  def cleanup(topic: String, watermarks: Map[Int, Long], retainMs: Long = 0L,
              nowMs: Long = System.currentTimeMillis()): Int = synchronized {
    var evicted = 0
    watermarks.foreach { case (p, wm) =>
      events.get((topic, p)).foreach { buf =>
        val (drop, keep) = buf.partition(e => e.sequence <= wm && e.timestampMs < nowMs - retainMs)
        evicted += drop.size
        drop.foreach(e => e.idempotencyKey.foreach(k => idem.remove((topic, p, k))))
        buf.clear(); buf ++= keep
      }
    }
    evicted
  }
}
