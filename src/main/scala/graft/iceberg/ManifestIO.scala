package graft.iceberg

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.ByteBuffer
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import scala.jdk.CollectionConverters._

/** Data-file metadata carried through manifests. Bounds are keyed by Iceberg
  * field ID, big-endian encoded ([[Bounds]]). Mirrors the reference's
  * simplified DataFile (`/root/reference/src/storage/iceberg.rs:633-648`). */
final case class DataFile(
    content: Int,
    filePath: String,
    fileFormat: String,
    recordCount: Long,
    fileSizeInBytes: Long,
    lowerBounds: Map[Int, Array[Byte]],
    upperBounds: Map[Int, Array[Byte]]
) {
  def lowerLong(fieldId: Int): Option[Long] = lowerBounds.get(fieldId).map(Bounds.decodeLong)
  def upperLong(fieldId: Int): Option[Long] = upperBounds.get(fieldId).map(Bounds.decodeLong)
  def lowerInt(fieldId: Int): Option[Int]   = lowerBounds.get(fieldId).map(Bounds.decodeInt)
  def upperInt(fieldId: Int): Option[Int]   = upperBounds.get(fieldId).map(Bounds.decodeInt)
}

/** status: 0=existing, 1=added, 2=deleted (Iceberg v2 manifest entry).
  * `dataSequenceNumber`: the spec's explicit per-entry data sequence — None
  * inherits the manifest-list entry's sequence number (the v2 inheritance
  * rule every ordinary commit uses); a manifest REWRITE carries each file's
  * ORIGINAL sequence explicitly, because equality-delete scoping ("applies
  * only to files with a smaller data sequence") must survive coalescing
  * manifests under a new list entry. */
final case class ManifestEntry(status: Int, snapshotId: Long, dataFile: DataFile,
                               dataSequenceNumber: Option[Long] = None)

final case class ManifestListEntry(
    manifestPath: String,
    manifestLength: Long,
    partitionSpecId: Int,
    content: Int,
    sequenceNumber: Long,
    minSequenceNumber: Long,
    addedSnapshotId: Long,
    addedFilesCount: Int,
    existingFilesCount: Int,
    deletedFilesCount: Int,
    addedRowsCount: Long,
    existingRowsCount: Long,
    deletedRowsCount: Long
)

/** Avro object-container IO for Iceberg v2 manifests and manifest lists.
  *
  * The record schemas are the simplified Iceberg v2 shapes the reference
  * emits (`/root/reference/src/storage/iceberg.rs:851-929`) — the subset of
  * spec fields actually populated — with the Iceberg-required file metadata
  * keys (`schema`, `schema-id`, `partition-spec`, `partition-spec-id`,
  * `format-version`, `content`; `iceberg.rs:793-810`).
  */
object ManifestIO {
  private val entrySchemaJson =
    """{
      |  "type": "record", "name": "manifest_entry", "fields": [
      |    {"name": "status", "type": "int"},
      |    {"name": "snapshot_id", "type": ["null", "long"], "default": null},
      |    {"name": "sequence_number", "type": ["null", "long"], "default": null},
      |    {"name": "file_sequence_number", "type": ["null", "long"], "default": null},
      |    {"name": "data_file", "type": {"type": "record", "name": "r2", "fields": [
      |      {"name": "content", "type": "int", "default": 0},
      |      {"name": "file_path", "type": "string"},
      |      {"name": "file_format", "type": "string"},
      |      {"name": "record_count", "type": "long"},
      |      {"name": "file_size_in_bytes", "type": "long"},
      |      {"name": "column_sizes", "type": ["null", {"type": "map", "values": "long"}], "default": null},
      |      {"name": "value_counts", "type": ["null", {"type": "map", "values": "long"}], "default": null},
      |      {"name": "null_value_counts", "type": ["null", {"type": "map", "values": "long"}], "default": null},
      |      {"name": "lower_bounds", "type": ["null", {"type": "map", "values": "bytes"}], "default": null},
      |      {"name": "upper_bounds", "type": ["null", {"type": "map", "values": "bytes"}], "default": null},
      |      {"name": "split_offsets", "type": ["null", {"type": "array", "items": "long"}], "default": null}
      |    ]}}
      |  ]
      |}""".stripMargin

  private val listSchemaJson =
    """{
      |  "type": "record", "name": "manifest_file", "fields": [
      |    {"name": "manifest_path", "type": "string"},
      |    {"name": "manifest_length", "type": "long"},
      |    {"name": "partition_spec_id", "type": "int"},
      |    {"name": "content", "type": "int"},
      |    {"name": "sequence_number", "type": "long"},
      |    {"name": "min_sequence_number", "type": "long"},
      |    {"name": "added_snapshot_id", "type": "long"},
      |    {"name": "added_files_count", "type": "int"},
      |    {"name": "existing_files_count", "type": "int"},
      |    {"name": "deleted_files_count", "type": "int"},
      |    {"name": "added_rows_count", "type": "long"},
      |    {"name": "existing_rows_count", "type": "long"},
      |    {"name": "deleted_rows_count", "type": "long"}
      |  ]
      |}""".stripMargin

  lazy val entrySchema: Schema = new Schema.Parser().parse(entrySchemaJson)
  lazy val listSchema: Schema  = new Schema.Parser().parse(listSchemaJson)

  /** `content`: "data" for data-file manifests, "deletes" for position-
    * delete manifests (the Iceberg v2 file-metadata key — readers route
    * manifests by the manifest LIST entry's content int; this key is the
    * in-file mirror the spec requires). */
  def writeManifest(entries: Seq[ManifestEntry], schemaJson: String, partitionSpecJson: String,
                    content: String = "data", specId: Int = 0): Array[Byte] = {
    val out    = new ByteArrayOutputStream()
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](entrySchema))
    writer.setMeta("schema", schemaJson)
    writer.setMeta("schema-id", "0")
    writer.setMeta("partition-spec", partitionSpecJson)
    writer.setMeta("partition-spec-id", specId.toString)
    writer.setMeta("format-version", "2")
    writer.setMeta("content", content)
    writer.create(entrySchema, out)
    val dfSchema = entrySchema.getField("data_file").schema()
    entries.foreach { e =>
      val rec = new GenericData.Record(entrySchema)
      rec.put("status", e.status)
      rec.put("snapshot_id", java.lang.Long.valueOf(e.snapshotId))
      rec.put("sequence_number", e.dataSequenceNumber.map(java.lang.Long.valueOf).orNull)
      rec.put("file_sequence_number", null)
      val df = new GenericData.Record(dfSchema)
      df.put("content", e.dataFile.content)
      df.put("file_path", e.dataFile.filePath)
      df.put("file_format", e.dataFile.fileFormat)
      df.put("record_count", e.dataFile.recordCount)
      df.put("file_size_in_bytes", e.dataFile.fileSizeInBytes)
      df.put("column_sizes", null)
      df.put("value_counts", null)
      df.put("null_value_counts", null)
      df.put("lower_bounds", boundsToAvro(e.dataFile.lowerBounds))
      df.put("upper_bounds", boundsToAvro(e.dataFile.upperBounds))
      df.put("split_offsets", null)
      rec.put("data_file", df)
      writer.append(rec)
    }
    writer.close()
    out.toByteArray
  }

  private def boundsToAvro(bounds: Map[Int, Array[Byte]]): java.util.Map[String, ByteBuffer] =
    bounds.map { case (k, v) => k.toString -> ByteBuffer.wrap(v) }.asJava

  def readManifest(bytes: Array[Byte]): Seq[ManifestEntry] = {
    val reader  = new DataFileStream[GenericRecord](new ByteArrayInputStream(bytes), new GenericDatumReader[GenericRecord]())
    val entries = scala.collection.mutable.ArrayBuffer.empty[ManifestEntry]
    while (reader.hasNext) {
      val rec = reader.next()
      val df  = rec.get("data_file").asInstanceOf[GenericRecord]
      entries += ManifestEntry(
        rec.get("status").asInstanceOf[Int],
        Option(rec.get("snapshot_id")).map(_.asInstanceOf[Long]).getOrElse(0L),
        dataSequenceNumber = Option(rec.get("sequence_number")).map(_.asInstanceOf[Long]),
        dataFile = DataFile(
          df.get("content").asInstanceOf[Int],
          df.get("file_path").toString,
          df.get("file_format").toString,
          df.get("record_count").asInstanceOf[Long],
          df.get("file_size_in_bytes").asInstanceOf[Long],
          avroToBounds(df.get("lower_bounds")),
          avroToBounds(df.get("upper_bounds"))
        )
      )
    }
    reader.close()
    entries.toSeq
  }

  private def avroToBounds(v: AnyRef): Map[Int, Array[Byte]] = v match {
    case null => Map.empty
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) =>
        val buf = vv.asInstanceOf[ByteBuffer].duplicate()
        val arr = new Array[Byte](buf.remaining()); buf.get(arr)
        k.toString.toInt -> arr
      }.toMap
    case _ => Map.empty
  }

  def writeManifestList(entries: Seq[ManifestListEntry]): Array[Byte] = {
    val out    = new ByteArrayOutputStream()
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](listSchema))
    writer.setMeta("format-version", "2")
    writer.create(listSchema, out)
    entries.foreach { e =>
      val rec = new GenericData.Record(listSchema)
      rec.put("manifest_path", e.manifestPath)
      rec.put("manifest_length", e.manifestLength)
      rec.put("partition_spec_id", e.partitionSpecId)
      rec.put("content", e.content)
      rec.put("sequence_number", e.sequenceNumber)
      rec.put("min_sequence_number", e.minSequenceNumber)
      rec.put("added_snapshot_id", e.addedSnapshotId)
      rec.put("added_files_count", e.addedFilesCount)
      rec.put("existing_files_count", e.existingFilesCount)
      rec.put("deleted_files_count", e.deletedFilesCount)
      rec.put("added_rows_count", e.addedRowsCount)
      rec.put("existing_rows_count", e.existingRowsCount)
      rec.put("deleted_rows_count", e.deletedRowsCount)
      writer.append(rec)
    }
    writer.close()
    out.toByteArray
  }

  def readManifestList(bytes: Array[Byte]): Seq[ManifestListEntry] = {
    val reader  = new DataFileStream[GenericRecord](new ByteArrayInputStream(bytes), new GenericDatumReader[GenericRecord]())
    val entries = scala.collection.mutable.ArrayBuffer.empty[ManifestListEntry]
    while (reader.hasNext) {
      val r = reader.next()
      entries += ManifestListEntry(
        r.get("manifest_path").toString,
        r.get("manifest_length").asInstanceOf[Long],
        r.get("partition_spec_id").asInstanceOf[Int],
        r.get("content").asInstanceOf[Int],
        r.get("sequence_number").asInstanceOf[Long],
        r.get("min_sequence_number").asInstanceOf[Long],
        r.get("added_snapshot_id").asInstanceOf[Long],
        r.get("added_files_count").asInstanceOf[Int],
        r.get("existing_files_count").asInstanceOf[Int],
        r.get("deleted_files_count").asInstanceOf[Int],
        r.get("added_rows_count").asInstanceOf[Long],
        r.get("existing_rows_count").asInstanceOf[Long],
        r.get("deleted_rows_count").asInstanceOf[Long]
      )
    }
    reader.close()
    entries.toSeq
  }
}
