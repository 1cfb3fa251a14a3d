package graft.serve

import java.io.{BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException, FileOutputStream}
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.zip.CRC32
import scala.jdk.CollectionConverters._

/** Local write-ahead log for the hot tier (INV-2 analogue).
  *
  * The reference's hot buffer is RocksDB with its WAL on by default
  * (`/root/reference/src/storage/rocksdb.rs:579-592`,
  * `/root/reference/SPEC.md:183-201`): an event acknowledged with 202 is
  * durable before the flusher ever runs. Our [[HotBuffer]] is in-memory, so
  * this log restores that invariant: every accepted write is appended here
  * before the 202, and a restarting gateway replays the log to rebuild the
  * buffer — a crash between accept and flush loses nothing.
  *
  * Format: length-prefixed CRC32-framed records. Replay stops at the first
  * torn/corrupt record (a crash mid-append leaves a bad tail, never a bad
  * prefix). Two record types:
  *  - event: the full [[StoredEvent]]
  *  - seq-mark: (topic, partition, sequence) — written during compaction so
  *    sequence counters survive even when all of a partition's events have
  *    been evicted
  *
  * [[compact]] rewrites the log to the current live buffer contents
  * (new file + atomic rename), bounding the log at O(hot buffer) — called
  * after flush eviction, playing the reference's cleanup-watermark role.
  *
  * Durability level matches RocksDB's default WAL: records are flushed to
  * the OS page cache per append (survives process crash); pass
  * `fsyncEachAppend = true` to also survive power loss, at a latency cost.
  */
final class WriteAheadLog(dir: Path, fsyncEachAppend: Boolean = false) {
  private val logPath = dir.resolve("hot.wal")
  Files.createDirectories(dir)
  // a crash between writing and renaming a compaction tmp leaves the main
  // log intact and the tmp as garbage — sweep stale tmps on open
  locally {
    val s = Files.list(dir)
    try s.iterator().asScala
      .filter(_.getFileName.toString.startsWith("hot.wal.compact."))
      .foreach(Files.deleteIfExists(_))
    finally s.close()
  }

  private var out: DataOutputStream = _
  private var fileOut: FileOutputStream = _
  openAppend()

  private def openAppend(): Unit = {
    fileOut = new FileOutputStream(logPath.toFile, true)
    out = new DataOutputStream(new BufferedOutputStream(fileOut, 1 << 16))
  }

  private def frame(tpe: Byte)(write: DataOutputStream => Unit): Unit = {
    val body = new ByteArrayOutputStream()
    val d    = new DataOutputStream(body)
    d.writeByte(tpe)
    write(d)
    d.flush()
    val bytes = body.toByteArray
    val crc   = new CRC32(); crc.update(bytes)
    synchronized {
      out.writeInt(bytes.length)
      out.writeLong(crc.getValue)
      out.write(bytes)
      out.flush()
      if (fsyncEachAppend) fileOut.getFD.sync()
    }
  }

  def appendEvent(e: StoredEvent): Unit = frame(0) { d =>
    d.writeUTF(e.topic)
    d.writeInt(e.partition)
    d.writeLong(e.sequence)
    d.writeLong(e.timestampMs)
    d.writeBoolean(e.idempotencyKey.isDefined)
    e.idempotencyKey.foreach(d.writeUTF)
    d.writeInt(e.payload.length)
    d.write(e.payload)
  }

  def appendSeqMark(topic: String, partition: Int, sequence: Long): Unit = frame(1) { d =>
    d.writeUTF(topic)
    d.writeInt(partition)
    d.writeLong(sequence)
  }

  /** Replay every intact record in append order; stops (and truncates the
    * file) at the first torn or corrupt frame. */
  def replay(onEvent: StoredEvent => Unit, onSeqMark: (String, Int, Long) => Unit): Unit = synchronized {
    if (!Files.exists(logPath)) return
    val in = new DataInputStream(new java.io.BufferedInputStream(
      Files.newInputStream(logPath), 1 << 16))
    var good = 0L
    try {
      var ok = true
      while (ok) {
        try {
          val len = in.readInt()
          val crcExpect = in.readLong()
          if (len < 1 || len > (64 << 20)) ok = false
          else {
            val bytes = new Array[Byte](len)
            in.readFully(bytes)
            val crc = new CRC32(); crc.update(bytes)
            if (crc.getValue != crcExpect) ok = false
            else {
              val d = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
              d.readByte() match {
                case 0 =>
                  val topic = d.readUTF(); val part = d.readInt()
                  val seq = d.readLong(); val ts = d.readLong()
                  val key = if (d.readBoolean()) Some(d.readUTF()) else None
                  val payload = new Array[Byte](d.readInt()); d.readFully(payload)
                  onEvent(StoredEvent(seq, topic, part, payload, ts, key))
                case 1 =>
                  onSeqMark(d.readUTF(), d.readInt(), d.readLong())
                case _ => ok = false
              }
              if (ok) good += 4L + 8L + len
            }
          }
        } catch { case _: EOFException => ok = false }
      }
    } finally in.close()
    // drop any torn tail so the next append starts at a clean frame
    if (good < Files.size(logPath)) {
      val ch = java.nio.channels.FileChannel.open(logPath, java.nio.file.StandardOpenOption.WRITE)
      try ch.truncate(good) finally ch.close()
      out.close()
      openAppend()
    }
  }

  /** Atomically rewrite the log to `seqs` marks + `live` events. */
  def compact(seqs: Map[(String, Int), Long], live: Iterable[StoredEvent]): Unit = synchronized {
    val tmp    = dir.resolve(s"hot.wal.compact.${java.util.UUID.randomUUID()}")
    val tmpLog = new TmpWal(tmp)
    try {
      seqs.toSeq.sortBy(t => (t._1._1, t._1._2)).foreach { case ((t, p), s) => tmpLog.appendSeqMark(t, p, s) }
      live.foreach(tmpLog.appendEvent)
    } finally tmpLog.close()
    out.close()
    Files.move(tmp, logPath, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    openAppend()
  }

  /** Minimal writer over an arbitrary path sharing the frame format. */
  private final class TmpWal(path: Path) {
    private val o = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path.toFile), 1 << 16))
    private def fr(tpe: Byte)(write: DataOutputStream => Unit): Unit = {
      val body = new ByteArrayOutputStream(); val d = new DataOutputStream(body)
      d.writeByte(tpe); write(d); d.flush()
      val bytes = body.toByteArray
      val crc = new CRC32(); crc.update(bytes)
      o.writeInt(bytes.length); o.writeLong(crc.getValue); o.write(bytes)
    }
    def appendEvent(e: StoredEvent): Unit = fr(0) { d =>
      d.writeUTF(e.topic); d.writeInt(e.partition); d.writeLong(e.sequence)
      d.writeLong(e.timestampMs)
      d.writeBoolean(e.idempotencyKey.isDefined); e.idempotencyKey.foreach(d.writeUTF)
      d.writeInt(e.payload.length); d.write(e.payload)
    }
    def appendSeqMark(t: String, p: Int, s: Long): Unit = fr(1) { d =>
      d.writeUTF(t); d.writeInt(p); d.writeLong(s)
    }
    def close(): Unit = o.close()
  }

  def close(): Unit = synchronized { out.close() }
}
