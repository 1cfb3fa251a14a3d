package graft.serve

import java.io.ByteArrayOutputStream
import scala.collection.mutable

/** S3: hand-rolled proto3 wire codec for the reference's event messages
  * (`/root/reference/proto/event.proto:1-28`) — no spark-protobuf jar in
  * the environment, and the messages are three flat shapes:
  *
  *   Event           { bytes payload = 1; int64 timestamp_ms = 2;
  *                     string idempotency_key = 3; map headers = 4 }
  *   BulkWriteRecord { bytes payload = 1; uint32 partition = 2;
  *                     int64 timestamp_ms = 3; string idempotency_key = 4 }
  *   BulkWriteRequest{ repeated BulkWriteRecord records = 1 }
  *
  * Semantics matched to the server decode
  * (`/root/reference/src/api/handlers.rs:494-520,620-644`): timestamp 0 →
  * caller substitutes server time; empty idempotency key → None; `headers`
  * is parsed and DROPPED (the reference never reads it).
  */
object ProtoCodec {

  final case class ProtoEvent(payload: Array[Byte], timestampMs: Long, idempotencyKey: Option[String])
  final case class ProtoBulkRecord(payload: Array[Byte], partition: Int, timestampMs: Long,
                                   idempotencyKey: Option[String])

  final case class ProtoError(msg: String) extends RuntimeException(msg)

  // ---- wire primitives ----
  private final class Reader(buf: Array[Byte]) {
    var pos            = 0
    def hasMore: Boolean = pos < buf.length
    def varint(): Long = {
      var shift = 0; var res = 0L
      while (true) {
        if (pos >= buf.length || shift > 63) throw ProtoError("truncated varint")
        val b = buf(pos); pos += 1
        res |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return res
        shift += 7
      }
      res
    }
    def bytes(): Array[Byte] = {
      // length check in LONG arithmetic: a crafted multi-GB declared
      // length would overflow `pos + len` as an Int, slip past the guard,
      // and escape as an unclassified IllegalArgumentException (500)
      // instead of ProtoError (400)
      val lenL = varint()
      if (lenL < 0 || lenL > (buf.length - pos).toLong) throw ProtoError("truncated bytes")
      val len = lenL.toInt
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      out
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(); ()
      case 1 => pos += 8
      case 2 => bytes(); ()
      case 5 => pos += 4
      case w => throw ProtoError(s"unsupported wire type $w")
    }
  }

  private def noneIfEmpty(s: String): Option[String] = if (s.isEmpty) None else Some(s)

  def decodeEvent(buf: Array[Byte]): ProtoEvent = {
    val r = new Reader(buf)
    var payload: Array[Byte] = Array.emptyByteArray
    var ts                   = 0L
    var key                  = ""
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => payload = r.bytes()
        case (2, 0) => ts = r.varint()
        case (3, 2) => key = new String(r.bytes(), "UTF-8")
        case (4, 2) => r.bytes() // headers: parsed, dropped
        case (_, w) => r.skip(w)
      }
    }
    ProtoEvent(payload, ts, noneIfEmpty(key))
  }

  def decodeBulkRecord(buf: Array[Byte]): ProtoBulkRecord = {
    val r = new Reader(buf)
    var payload: Array[Byte] = Array.emptyByteArray
    var partition            = 0
    var ts                   = 0L
    var key                  = ""
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => payload = r.bytes()
        case (2, 0) => partition = r.varint().toInt
        case (3, 0) => ts = r.varint()
        case (4, 2) => key = new String(r.bytes(), "UTF-8")
        case (_, w) => r.skip(w)
      }
    }
    ProtoBulkRecord(payload, partition, ts, noneIfEmpty(key))
  }

  def decodeBulkRequest(buf: Array[Byte]): Seq[ProtoBulkRecord] = {
    val r   = new Reader(buf)
    val out = mutable.ArrayBuffer.empty[ProtoBulkRecord]
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => out += decodeBulkRecord(r.bytes())
        case (_, w) => r.skip(w)
      }
    }
    out.toSeq
  }

  // ---- encoders (test/client side) ----
  private final class Writer {
    val out = new ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    def field(num: Int, wireType: Int): Unit = varint((num.toLong << 3) | wireType)
    def bytes(num: Int, b: Array[Byte]): Unit = { field(num, 2); varint(b.length.toLong); out.write(b) }
    def int64(num: Int, v: Long): Unit = if (v != 0) { field(num, 0); varint(v) }
    def str(num: Int, s: String): Unit = if (s.nonEmpty) bytes(num, s.getBytes("UTF-8"))
  }

  def encodeEvent(e: ProtoEvent): Array[Byte] = {
    val w = new Writer
    if (e.payload.nonEmpty) w.bytes(1, e.payload)
    w.int64(2, e.timestampMs)
    w.str(3, e.idempotencyKey.getOrElse(""))
    w.out.toByteArray
  }

  def encodeBulkRequest(records: Seq[ProtoBulkRecord]): Array[Byte] = {
    val w = new Writer
    records.foreach { rec =>
      val inner = new Writer
      if (rec.payload.nonEmpty) inner.bytes(1, rec.payload)
      inner.int64(2, rec.partition.toLong)
      inner.int64(3, rec.timestampMs)
      inner.str(4, rec.idempotencyKey.getOrElse(""))
      w.bytes(1, inner.out.toByteArray)
    }
    w.out.toByteArray
  }
}
