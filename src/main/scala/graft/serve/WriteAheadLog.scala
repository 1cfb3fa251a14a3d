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
  // serializes whole compaction SEQUENCES (arm → snapshot → compact, via
  // [[exclusively]]); `side` (guarded by this WAL's monitor) captures
  // frames appended while a compaction rewrite is in flight, and
  // `sideToken` names the capture so a compaction can only drain/disarm
  // the capture IT armed — never one a concurrent cleanup just armed
  private val compactLock = new Object
  private var side: scala.collection.mutable.ArrayBuffer[Array[Byte]] = null
  private var sideToken: Long = 0L
  // TEST-ONLY fault injection: when set, the next compaction throws at the
  // worst point — after the append stream is closed, before the rename —
  // exercising the reopen-on-failure path a real rename error would hit
  private[graft] var failNextSwap: Boolean = false
  // TEST-ONLY: the next appendFrames throws after buffering its frames but
  // before the flush — simulating a mid-append IO failure, exercising the
  // clean-tail recovery plus the HotBuffer rollback
  private[graft] var failNextAppend: Boolean = false
  openAppend()

  /** Run `body` holding the compaction mutex. A caller that arms the
    * catch-up capture ([[beginCapture]]), snapshots its live set, and then
    * calls [[compact]] MUST wrap the whole sequence here: with two
    * concurrent cleanups over one shared WAL (flush daemon + HTTP flush),
    * an unserialized first compact would drain-and-disarm the capture the
    * second cleanup just armed, and a write acked between the first swap
    * and the second compact would land in neither the second snapshot nor
    * its side buffer — dropped from the WAL on the second swap. Appends
    * never take this lock, so writes are not stalled. Reentrant. */
  def exclusively[T](body: => T): T = compactLock.synchronized(body)

  // bytes known durably flushed (through the OS page cache) to the log —
  // the clean-tail watermark a failed append truncates back to
  private var committedLen: Long = 0L

  private def openAppend(): Unit = {
    fileOut = new FileOutputStream(logPath.toFile, true)
    out = new DataOutputStream(new BufferedOutputStream(fileOut, 1 << 16))
    committedLen = if (Files.exists(logPath)) Files.size(logPath) else 0L
  }

  private def encode(tpe: Byte)(write: DataOutputStream => Unit): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    val d    = new DataOutputStream(body)
    d.writeByte(tpe)
    write(d)
    d.flush()
    body.toByteArray
  }

  /** Caller must hold this WAL's monitor. */
  private def writeFrame(bytes: Array[Byte]): Unit = {
    val crc = new CRC32(); crc.update(bytes)
    out.writeInt(bytes.length)
    out.writeLong(crc.getValue)
    out.write(bytes)
    if (side != null) side += bytes // a compaction is rewriting: capture
  }

  /** Replay rejects frames above this as corrupt and TRUNCATES the log
    * there — so append must never produce one: an oversized admitted
    * event would otherwise silently discard every acked event logged
    * after it on the next restart. */
  val MaxFrameBytes: Int = 64 << 20

  private def checkFrame(bytes: Array[Byte]): Unit =
    if (bytes.length > MaxFrameBytes)
      throw new IllegalArgumentException(
        s"event frame of ${bytes.length} bytes exceeds the $MaxFrameBytes-byte WAL replay cap")

  /** Write + flush a batch of pre-encoded frames under the monitor. On ANY
    * failure the log is restored to its last clean tail (close, truncate
    * to [[committedLen]], reopen) and captured side frames are rolled
    * back — continuing to append past a torn tail would make every later
    * acked event unreachable to replay (which stops at the first torn
    * frame). The caller ([[HotBuffer]]) rolls its buffer state back too,
    * so a failed append leaves NO trace: the client's retry is safe. */
  private def appendFrames(frames: Seq[Array[Byte]]): Unit = synchronized {
    val sideMark = if (side != null) side.size else -1
    try {
      frames.foreach(writeFrame)
      if (failNextAppend) {
        failNextAppend = false
        throw new java.io.IOException("injected append failure (test hook)")
      }
      out.flush()
      if (fsyncEachAppend) fileOut.getFD.sync()
      committedLen += frames.iterator.map(b => 12L + b.length.toLong).sum
    } catch {
      case t: Throwable =>
        if (side != null && sideMark >= 0 && side.size > sideMark) side.takeInPlace(sideMark)
        recoverTail()
        throw t
    }
  }

  /** Restore a clean tail after a failed append: bytes past
    * [[committedLen]] may be torn; truncate back and reopen so later
    * appends stay replayable. Caller holds the monitor. */
  private def recoverTail(): Unit = {
    try out.close() catch { case _: Exception => () }
    try {
      val ch = java.nio.channels.FileChannel.open(logPath, java.nio.file.StandardOpenOption.WRITE)
      try ch.truncate(committedLen) finally ch.close()
    } catch { case _: Exception => () }
    try openAppend() catch { case _: Exception => () }
  }

  private def frame(tpe: Byte)(write: DataOutputStream => Unit): Unit = {
    val bytes = encode(tpe)(write)
    checkFrame(bytes)
    appendFrames(Seq(bytes))
  }

  private def eventBody(e: StoredEvent)(d: DataOutputStream): Unit = {
    d.writeUTF(e.topic)
    d.writeInt(e.partition)
    d.writeLong(e.sequence)
    d.writeLong(e.timestampMs)
    d.writeBoolean(e.idempotencyKey.isDefined)
    e.idempotencyKey.foreach(d.writeUTF)
    d.writeInt(e.payload.length)
    d.write(e.payload)
  }

  def appendEvent(e: StoredEvent): Unit = frame(0)(eventBody(e))

  /** Bulk append: every event framed individually (replay sees the same
    * record stream as N single appends) but ONE flush — and one fsync when
    * enabled — for the whole batch. A 500-record bulk write was paying 500
    * flush syscalls inside the hot-buffer lock; under double-concurrency
    * burst load that lock convoy was the gateway's worst-cycle p99. The
    * durability point is unchanged: the batch is in the OS page cache (or
    * on disk with fsync) before this returns, i.e. before the 202 ack. */
  def appendEvents(es: Iterable[StoredEvent]): Unit = {
    if (es.isEmpty) return
    val frames = es.iterator.map(e => encode(0)(eventBody(e))).toArray
    frames.foreach(checkFrame) // validate ALL before writing ANY (atomic batch)
    appendFrames(frames.toSeq)
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

  /** Arm the compaction catch-up capture: every frame appended from now on
    * is ALSO retained in memory until the [[compact]] holding the returned
    * token drains it into the rewritten log. The caller arms this while it
    * still holds whatever lock makes its live-set snapshot consistent, so
    * no append can fall between the snapshot and the rewrite — and wraps
    * the whole arm→snapshot→compact sequence in [[exclusively]], so a
    * concurrent cleanup can neither steal nor disarm this capture. */
  def beginCapture(): Long = synchronized {
    if (side == null) {
      sideToken += 1
      side = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    }
    sideToken
  }

  /** Atomically rewrite the log to `seqs` marks + `live` events WITHOUT
    * stalling appends for the duration of the rewrite. The snapshot is
    * written to a tmp file OUTSIDE the append monitor; concurrent appends
    * keep landing in the current log (still the durable copy) AND are
    * captured as raw frames in a side buffer; the final swap — bounded by
    * what arrived during the rewrite, not by the live set — drains the
    * side buffer into the tmp under the monitor and renames. Holding the
    * monitor across the whole rewrite meant every write blocked behind a
    * full live-set file write; with a large mid-burst live buffer that
    * stall was the gateway's burst worst-cycle p99. Crash safety is
    * unchanged: a crash mid-compaction leaves the old log (including every
    * frame appended meanwhile) intact, and stale tmps are swept on open. */
  def compact(seqs: Map[(String, Int), Long], live: Iterable[StoredEvent],
              token: Long = -1L): Unit =
    compactLock.synchronized {
      val tmp        = dir.resolve(s"hot.wal.compact.${java.util.UUID.randomUUID()}")
      val tmpLog     = new TmpWal(tmp)
      var swapped    = false
      var mainClosed = false
      // capture may already be armed by beginCapture() (the caller arms it
      // BEFORE snapshotting its live set, closing the window where a write
      // lands after the snapshot but before the rewrite starts, and passes
      // the returned token here); a tokenless call self-arms
      val tok = synchronized {
        if (side == null) {
          sideToken += 1
          side = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          sideToken
        } else if (token >= 0L) token else sideToken
      }
      try {
        seqs.toSeq.sortBy(t => (t._1._1, t._1._2)).foreach { case ((t, p), s) => tmpLog.appendSeqMark(t, p, s) }
        live.foreach(tmpLog.appendEvent)
        synchronized {
          side.foreach(tmpLog.writeRaw) // catch-up: frames appended during the rewrite
          side = null
          tmpLog.close()
          out.close()
          mainClosed = true
          if (failNextSwap) {
            failNextSwap = false
            throw new java.io.IOException("injected swap failure (test hook)")
          }
          Files.move(tmp, logPath, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
          openAppend()
          swapped = true
        }
      } finally {
        synchronized {
          // disarm ONLY the capture this compaction owns: an unconditional
          // clear on the failure path would silently disarm a capture a
          // concurrent cleanup armed after our swap
          if (sideToken == tok) side = null
          // if the rename threw AFTER the append stream was closed, reopen
          // it on the (still intact) old log — otherwise every later
          // append throws on a closed stream and the gateway bricks until
          // restart while the old log remains perfectly usable
          if (!swapped && mainClosed) openAppend()
        }
        if (!swapped) {
          try tmpLog.close() catch { case _: Exception => () }
          Files.deleteIfExists(tmp)
        }
      }
    }

  /** Minimal writer over an arbitrary path. Record bodies come from the
    * OUTER [[encode]]/[[eventBody]] — format-identical to the live log BY
    * CONSTRUCTION (an independent encoding here could drift and make
    * compacted logs unreadable on the next restart). */
  private final class TmpWal(path: Path) {
    private val o = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path.toFile), 1 << 16))
    def appendEvent(e: StoredEvent): Unit = writeRaw(encode(0)(eventBody(e)))
    def appendSeqMark(t: String, p: Int, s: Long): Unit = writeRaw(encode(1) { d =>
      d.writeUTF(t); d.writeInt(p); d.writeLong(s)
    })
    /** CRC-frame an encoded body (also the compaction catch-up path). */
    def writeRaw(body: Array[Byte]): Unit = {
      val crc = new CRC32(); crc.update(body)
      o.writeInt(body.length); o.writeLong(crc.getValue); o.write(body)
    }
    def close(): Unit = o.close()
  }

  def close(): Unit = synchronized { out.close() }
}
