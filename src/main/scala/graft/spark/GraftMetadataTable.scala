package graft.spark

import graft.iceberg.{FieldIds, IcebergCommitter, TableIO}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style metadata relations — `` t$snapshots ``, `` t$history ``,
  * `` t$files ``, `` t$manifests `` — addressable from plain SQL through
  * [[GraftCatalog]] exactly like Iceberg's metadata tables
  * (`SELECT * FROM cat.default.\`events$snapshots\``).
  *
  * Rows are driver-computed from the table's metadata chain
  * (metadata.json + Avro manifest lists + manifests) and never touch row
  * data: a metadata table is metadata-sized BY CONSTRUCTION — at 100 TB
  * the files relation is ~1 row per data file (the same order of work any
  * planner pays to plan a scan), so shipping the prebuilt rows in a single
  * input partition is the honest plan, not a shortcut.
  */
object GraftMetadataTable {
  val Kinds: Set[String] = Set("snapshots", "history", "files", "manifests")

  def schemaFor(kind: String): StructType = kind match {
    case "snapshots" =>
      StructType(Seq(
        StructField("committed_at_ms", LongType, nullable = false),
        StructField("snapshot_id", LongType, nullable = false),
        StructField("parent_id", LongType, nullable = true),
        StructField("operation", StringType, nullable = true),
        StructField("manifest_list", StringType, nullable = false),
        StructField("summary", StringType, nullable = false)
      ))
    case "history" =>
      StructType(Seq(
        StructField("made_at_ms", LongType, nullable = false),
        StructField("snapshot_id", LongType, nullable = false),
        StructField("is_current", BooleanType, nullable = false)
      ))
    case "files" =>
      StructType(Seq(
        StructField("file_path", StringType, nullable = false),
        StructField("partition", IntegerType, nullable = true),
        StructField("record_count", LongType, nullable = false),
        StructField("file_size_bytes", LongType, nullable = false),
        StructField("min_sequence", LongType, nullable = true),
        StructField("max_sequence", LongType, nullable = true),
        StructField("min_timestamp_ms", LongType, nullable = true),
        StructField("max_timestamp_ms", LongType, nullable = true)
      ))
    case "manifests" =>
      StructType(Seq(
        StructField("path", StringType, nullable = false),
        StructField("length", LongType, nullable = false),
        StructField("partition_spec_id", IntegerType, nullable = false),
        StructField("added_snapshot_id", LongType, nullable = false),
        StructField("added_files_count", IntegerType, nullable = false),
        StructField("existing_files_count", IntegerType, nullable = false),
        StructField("deleted_files_count", IntegerType, nullable = false),
        StructField("added_rows_count", LongType, nullable = false),
        StructField("existing_rows_count", LongType, nullable = false),
        StructField("deleted_rows_count", LongType, nullable = false)
      ))
    case other => throw new IllegalArgumentException(s"unknown metadata table: $other")
  }

  /** GenericInternalRow-ready values (boxed primitives / UTF8String / null). */
  def rows(root: String, topic: String, kind: String): Array[Array[Any]] = {
    val c = new IcebergCommitter(TableIO.forRoot(root), topic)
    def s(x: String): AnyRef = UTF8String.fromString(x)
    kind match {
      case "snapshots" =>
        c.load().toSeq.flatMap(_.snapshots).map { sn =>
          val summaryJson = sn.summary.toSeq.sortBy(_._1)
            .map { case (k, v) => s"${graft.core.JsonUtil.quote(k)}:${graft.core.JsonUtil.quote(v)}" }
            .mkString("{", ",", "}")
          Array[Any](sn.timestampMs, sn.snapshotId, sn.parentSnapshotId.map(Long.box).orNull,
            sn.summary.get("operation").map(s).orNull, s(sn.manifestList), s(summaryJson))
        }.toArray
      case "history" =>
        val meta = c.load()
        val current = meta.flatMap(_.currentSnapshotId)
        meta.toSeq.flatMap(_.snapshotLog).map { e =>
          Array[Any](e.timestampMs, e.snapshotId, current.contains(e.snapshotId))
        }.toArray
      case "files" =>
        c.activeDataFiles().map { f =>
          Array[Any](s(f.filePath), f.lowerInt(FieldIds.Partition).map(Int.box).orNull,
            f.recordCount, f.fileSizeInBytes,
            f.lowerLong(FieldIds.Sequence).map(Long.box).orNull,
            f.upperLong(FieldIds.Sequence).map(Long.box).orNull,
            f.lowerLong(FieldIds.TimestampMs).map(Long.box).orNull,
            f.upperLong(FieldIds.TimestampMs).map(Long.box).orNull)
        }.toArray
      case "manifests" =>
        c.currentManifests().map { m =>
          Array[Any](s(m.manifestPath), m.manifestLength, m.partitionSpecId,
            m.addedSnapshotId, m.addedFilesCount, m.existingFilesCount,
            m.deletedFilesCount, m.addedRowsCount, m.existingRowsCount,
            m.deletedRowsCount)
        }.toArray
      case other => throw new IllegalArgumentException(s"unknown metadata table: $other")
    }
  }
}

final class GraftMetadataTable(root: String, topic: String, kind: String, tblName: String)
    extends Table with SupportsRead {
  override def name(): String = tblName
  override def schema(): StructType = GraftMetadataTable.schemaFor(kind)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MetadataScan(root, topic, kind, name())
}

private final class MetadataScan(root: String, topic: String, kind: String, tblName: String)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = GraftMetadataTable.schemaFor(kind)
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(MetadataPartition(GraftMetadataTable.rows(root, topic, kind)))
  override def createReaderFactory(): PartitionReaderFactory = new MetadataReaderFactory
  override def description(): String = s"GraftMetadataScan($tblName)"
}

private final case class MetadataPartition(rows: Array[Array[Any]]) extends InputPartition

private final class MetadataReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rows = p.asInstanceOf[MetadataPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = new GenericInternalRow(rows(i))
      override def close(): Unit = ()
    }
  }
}
