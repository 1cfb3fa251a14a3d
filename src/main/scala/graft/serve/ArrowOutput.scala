package graft.serve

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.spark.sql.{DataFrame, Row}
import java.io.ByteArrayOutputStream
import java.nio.channels.Channels
import scala.jdk.CollectionConverters._

/** Q6: Arrow IPC stream output with column-projection validation — the
  * reference's operational read format
  * (`/root/reference/src/api/handlers.rs:816-932,953-986`; projection
  * validation against KNOWN_COLUMNS
  * `/root/reference/src/contracts/storage.rs:164-200`).
  *
  * Encoding happens on the DRIVER over an already-limited result set (the
  * reference encodes at most `limit` hot-buffer rows the same way); the
  * heavy lifting — filter, sort, limit, projection — stays distributed and
  * arrives here as collected Rows. Long/Int/String/Binary cover the whole
  * committed schema.
  */
object ArrowOutput {

  /** The projectable read columns (`KNOWN_COLUMNS`). */
  val KnownColumns: Seq[String] =
    Seq("sequence", "topic", "partition", "payload", "timestamp_ms", "idempotency_key")

  final case class UnknownColumn(name: String)
      extends IllegalArgumentException(s"unknown column: $name")

  /** Validate a `fields=` projection list; empty means "all columns". */
  def validateProjection(fields: Seq[String]): Seq[String] = {
    fields.foreach(f => if (!KnownColumns.contains(f)) throw UnknownColumn(f))
    if (fields.isEmpty) KnownColumns else fields
  }

  /** Parse + validate the HTTP `fields=` query param
    * (`/root/reference/src/api/handlers.rs:737-764`). */
  def validateProjectionOr400(fields: Option[String]): Seq[String] =
    validateProjection(fields.map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil))

  /** Encode hot-buffer events directly (no Spark) — the gateway's Arrow
    * read path over an already-limited page. */
  def encodeEvents(events: Seq[StoredEvent], fields: Seq[String]): Array[Byte] = {
    val schema = new Schema(fields.map {
      case "sequence"        => new Field("sequence", new FieldType(false, new ArrowType.Int(64, true), null), null)
      case "topic"           => new Field("topic", new FieldType(false, ArrowType.Utf8.INSTANCE, null), null)
      case "partition"       => new Field("partition", new FieldType(false, new ArrowType.Int(32, true), null), null)
      case "payload"         => new Field("payload", new FieldType(false, ArrowType.Binary.INSTANCE, null), null)
      case "timestamp_ms"    => new Field("timestamp_ms", new FieldType(false, new ArrowType.Int(64, true), null), null)
      case "idempotency_key" => new Field("idempotency_key", new FieldType(true, ArrowType.Utf8.INSTANCE, null), null)
      case other             => throw UnknownColumn(other)
    }.asJava)
    val allocator = new RootAllocator()
    try {
      val root = VectorSchemaRoot.create(schema, allocator)
      try {
        root.allocateNew()
        fields.foreach { f =>
          val vec = root.getVector(f)
          events.zipWithIndex.foreach { case (e, i) =>
            (f, vec) match {
              case ("sequence", v: BigIntVector)     => v.setSafe(i, e.sequence)
              case ("topic", v: VarCharVector)       => v.setSafe(i, e.topic.getBytes("UTF-8"))
              case ("partition", v: IntVector)       => v.setSafe(i, e.partition)
              case ("payload", v: VarBinaryVector)   => v.setSafe(i, e.payload)
              case ("timestamp_ms", v: BigIntVector) => v.setSafe(i, e.timestampMs)
              case ("idempotency_key", v: VarCharVector) =>
                e.idempotencyKey match {
                  case Some(k) => v.setSafe(i, k.getBytes("UTF-8"))
                  case None    => v.setNull(i)
                }
              case _ => throw new IllegalStateException(s"field/vector mismatch: $f")
            }
          }
        }
        root.setRowCount(events.length)
        val out    = new ByteArrayOutputStream()
        val writer = new ArrowStreamWriter(root, null, Channels.newChannel(out))
        writer.start(); writer.writeBatch(); writer.end(); writer.close()
        out.toByteArray
      } finally root.close()
    } finally allocator.close()
  }

  private def arrowField(name: String, dt: org.apache.spark.sql.types.DataType, nullable: Boolean): Field = {
    import org.apache.spark.sql.types._
    val t: ArrowType = dt match {
      case LongType    => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case StringType  => ArrowType.Utf8.INSTANCE
      case BinaryType  => ArrowType.Binary.INSTANCE
      case DateType    => new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY)
      case other       => throw new IllegalArgumentException(s"unsupported arrow type $other")
    }
    new Field(name, new FieldType(nullable, t, null), null)
  }

  /** Encode a (small, already-limited) DataFrame as one Arrow IPC stream. */
  def encode(df: DataFrame): Array[Byte] = {
    val sparkSchema = df.schema
    val rows        = df.collect()
    val schema      = new Schema(sparkSchema.map(f => arrowField(f.name, f.dataType, f.nullable)).asJava)
    val allocator   = new RootAllocator()
    try {
      val root = VectorSchemaRoot.create(schema, allocator)
      try {
        root.allocateNew()
        sparkSchema.zipWithIndex.foreach { case (f, c) =>
          val vec = root.getVector(f.name)
          rows.zipWithIndex.foreach { case (row, i) =>
            if (row.isNullAt(c)) vec.asInstanceOf[FieldVector].setNull(i)
            else
              vec match {
                case v: BigIntVector    => v.setSafe(i, row.getLong(c))
                case v: IntVector       => v.setSafe(i, row.getInt(c))
                case v: DateDayVector   => v.setSafe(i, row.getDate(c).toLocalDate.toEpochDay.toInt)
                case v: VarCharVector   => v.setSafe(i, row.getString(c).getBytes("UTF-8"))
                case v: VarBinaryVector => v.setSafe(i, row.getAs[Array[Byte]](c))
                case other              => throw new IllegalArgumentException(s"unsupported vector $other")
              }
          }
        }
        root.setRowCount(rows.length)
        val out    = new ByteArrayOutputStream()
        val writer = new ArrowStreamWriter(root, null, Channels.newChannel(out))
        writer.start(); writer.writeBatch(); writer.end(); writer.close()
        out.toByteArray
      } finally root.close()
    } finally allocator.close()
  }

  /** Decode an IPC stream back to Rows — used by tests and the oracle
    * round-trip query to prove the bytes are a faithful encoding. */
  def decode(bytes: Array[Byte]): (Seq[String], Seq[Row]) = {
    val allocator = new RootAllocator()
    val reader    = new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), allocator)
    try {
      val out  = scala.collection.mutable.ArrayBuffer.empty[Row]
      var cols = Seq.empty[String]
      while (reader.loadNextBatch()) {
        val root = reader.getVectorSchemaRoot
        cols = root.getSchema.getFields.asScala.map(_.getName).toSeq
        (0 until root.getRowCount).foreach { i =>
          out += Row.fromSeq(root.getFieldVectors.asScala.toSeq.map { v =>
            if (v.isNull(i)) null
            else
              v match {
                case b: BigIntVector    => b.get(i)
                case n: IntVector       => n.get(i)
                case d: DateDayVector   => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d.get(i).toLong))
                case s: VarCharVector   => new String(s.get(i), "UTF-8")
                case b: VarBinaryVector => b.get(i)
                case other              => throw new IllegalArgumentException(s"unsupported vector $other")
              }
          })
        }
      }
      (cols, out.toSeq)
    } finally { reader.close(); allocator.close() }
  }

  /** Accept-header content negotiation with q-values
    * (`/root/reference/src/api/handlers.rs:897-942`): returns the chosen
    * media type among JSON (default) and Arrow IPC, or None → 406. */
  def negotiate(accept: Option[String]): Option[String] = {
    val JsonT  = "application/json"
    val ArrowT = "application/vnd.apache.arrow.stream"
    accept match {
      case None | Some("") => Some(JsonT)
      case Some(h) =>
        val prefs = h.split(',').map(_.trim).filter(_.nonEmpty).map { part =>
          val bits  = part.split(';').map(_.trim)
          val mtype = bits.head.toLowerCase
          val q = bits.tail
            .collectFirst { case b if b.startsWith("q=") => b.stripPrefix("q=").toDoubleOption.getOrElse(0.0) }
            .getOrElse(1.0)
          mtype -> q
        }
        val viable = prefs
          .filter(_._2 > 0)
          .flatMap {
            case ("*/*", q)             => Seq(JsonT -> q)
            case ("application/*", q)   => Seq(JsonT -> q)
            case (t, q) if t == JsonT   => Seq(JsonT -> q)
            case (t, q) if t == ArrowT  => Seq(ArrowT -> q)
            case _                      => Nil
          }
        if (viable.isEmpty) None else Some(viable.maxBy(_._2)._1)
    }
  }
}
