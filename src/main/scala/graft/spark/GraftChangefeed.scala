package graft.spark

import graft.iceberg.{FieldIds, IcebergCommitter, TableIO}
import graft.table.EventTable
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.ColumnIOFactory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** STREAMING CDC source: `spark.readStream.format("graft")
  * .option("changefeed", "true").load(root)` — the committed table as a
  * continuous feed of `_change_type` ∈ {insert, delete} rows, one
  * micro-batch per snapshot range, with the exact per-snapshot resolution
  * of the batch changefeed ([[EventTable.changesBetween]] / tt3):
  *
  *  - offsets are SNAPSHOT IDS (the same exactly-once cursor as the
  *    append-tail stream): each batch covers the parent-chain range
  *    (from, to], checkpointed like any structured stream;
  *  - an APPEND snapshot contributes its added files' rows as inserts;
  *  - a merge-on-read DELETE snapshot contributes the rows its new delete
  *    files masked, resolved against the parent's LIVE set (prior masks
  *    excluded; a row matched by both of the commit's delete kinds emits
  *    once);
  *  - a manifest REWRITE contributes nothing, and so does a
  *    DATA-PRESERVING replace (`zombi.data-preserving`: compaction / MoR
  *    fold — live row set identical), provided it only merged files whose
  *    changes precede the range ([[EventTable.validateFeedRange]]) — so a
  *    checkpointed feed SURVIVES the maintenance clock's vacuums;
  *  - any other REPLACE (CoW rewrite changes rows) fails the batch
  *    LOUDLY — a file diff cannot represent it — as does a range crossing
  *    expire-truncated history (the parent-chain walk hits an unknown
  *    snapshot), so the stream never silently skips or duplicates changes.
  *
  * `option("fromSnapshot", id)` starts the feed AFTER snapshot `id`
  * (exclusive); `option("fromTimestamp", epochMs)` resolves the newest
  * HEAD ANCESTOR committed strictly before the timestamp (so every commit
  * at or after it is delivered) — if expiry already truncated history
  * past the timestamp, the feed refuses naming the oldest retained
  * snapshot as the recovery point, never silently starts late. Without
  * either option the feed starts at the head observed at query start
  * (changes since stream start). An empty table starts at −1 and the
  * first committed snapshot's chain emits from table creation. A range
  * walk that hits expired history mid-stream (a consumer lagging past
  * the maintenance clock's retention) fails the same loud way, naming
  * the restart point.
  *
  * Scale shape: a batch reads only the files the range's commits added
  * (inserts) plus the parent-live files of each delete commit, with
  * masks resolved from the cached driver mask index — consumers tail
  * SMALL ranges per trigger, never a re-scan of the table. */
final class GraftChangefeedTable(tableRoot: String, tableSchema: StructType,
                                 fromSnapshot: Option[Long],
                                 fromTimestampMs: Option[Long] = None) extends Table with SupportsRead {
  override def name(): String = s"graft-changefeed:$tableRoot"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftChangefeedScanBuilder(tableRoot, tableSchema, fromSnapshot, fromTimestampMs)
}

final class GraftChangefeedScanBuilder(tableRoot: String, tableSchema: StructType,
                                       fromSnapshot: Option[Long],
                                       fromTimestampMs: Option[Long])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan =
    new GraftChangefeedScan(tableRoot, required, fromSnapshot, fromTimestampMs)
}

final class GraftChangefeedScan(tableRoot: String, required: StructType,
                                fromSnapshot: Option[Long],
                                fromTimestampMs: Option[Long]) extends Scan {
  override def readSchema(): StructType = required
  override def description(): String = s"GraftChangefeedScan $tableRoot"
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftChangefeedStream(tableRoot, required, fromSnapshot, fromTimestampMs)
}

/** One changefeed file read: `changeType` is the constant `_change_type`
  * value; delete partitions carry the resolution masks — a row emits iff
  * it survives every `drop*` mask (live at the parent) AND hits a `keep*`
  * mask (this commit deleted it). Insert partitions carry no masks. */
final case class ChangefeedPartition(tableRoot: String, relPath: String,
                                     changeType: String,
                                     dropPos: Array[Long] = Array.empty,
                                     dropEq: Array[Long] = Array.empty,
                                     keepPos: Array[Long] = Array.empty,
                                     keepEq: Array[Long] = Array.empty) extends InputPartition

final class GraftChangefeedStream(tableRoot: String, required: StructType,
                                  fromSnapshot: Option[Long],
                                  fromTimestampMs: Option[Long] = None)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  // validated at CONSTRUCTION, not in initialOffset: Spark only calls
  // initialOffset when no checkpoint exists, so a resumed query carrying
  // conflicting start options would otherwise silently ignore them — the
  // loud-refusal contract applies regardless of checkpoint state
  require(fromSnapshot.isEmpty || fromTimestampMs.isEmpty,
    "changefeed options fromSnapshot and fromTimestamp are mutually exclusive")
  private def committer = new IcebergCommitter(TableIO.forRoot(tableRoot), EventTable.Topic)

  private def headId(): Long =
    committer.load().flatMap(_.currentSnapshotId).getOrElse(-1L)

  @volatile private var availableNowEnd: Option[GraftOffset] = None
  override def prepareForTriggerAvailableNow(): Unit = availableNowEnd = Some(GraftOffset(headId()))
  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit):
      org.apache.spark.sql.connector.read.streaming.Offset =
    availableNowEnd.getOrElse(GraftOffset(headId()))
  override def reportLatestOffset(): org.apache.spark.sql.connector.read.streaming.Offset =
    GraftOffset(headId())

  override def initialOffset(): org.apache.spark.sql.connector.read.streaming.Offset = {
    // a named base must exist NOW — failing at first plan would bury the
    // refusal behind a checkpointed −1
    fromSnapshot.foreach { id =>
      val meta = committer.load().getOrElse(
        throw new IllegalArgumentException(s"changefeed fromSnapshot=$id but $tableRoot has no metadata"))
      require(meta.snapshots.exists(_.snapshotId == id),
        s"changefeed fromSnapshot=$id is not a known snapshot of $tableRoot (expired?)")
    }
    val from = fromSnapshot
      .orElse(fromTimestampMs.map(resolveFromTimestamp))
      .getOrElse(headId())
    GraftOffset(from)
  }

  /** The newest HEAD ANCESTOR committed strictly before `ts` — so the feed
    * delivers every commit at or after the timestamp. Ancestry (not the
    * snapshot list) guarantees the (from, head] walk resolves even across
    * rollback-abandoned branches. When expiry already truncated history
    * past `ts`, refuse naming the recovery point — a feed that silently
    * started late would be missing changes its consumer believes it has. */
  private def resolveFromTimestamp(ts: Long): Long = {
    val meta = committer.load().getOrElse(throw new IllegalArgumentException(
      s"changefeed fromTimestamp=$ts but $tableRoot has no metadata"))
    val head = meta.currentSnapshotId.getOrElse(return -1L)
    val byId = meta.snapshots.map(s => s.snapshotId -> s).toMap
    var cur = head
    while (cur != -1L) {
      byId.get(cur) match {
        case Some(s) if s.timestampMs < ts => return s.snapshotId
        case Some(s)                       => cur = s.parentSnapshotId.getOrElse(-1L)
        case None =>
          val oldest = committer.oldestRetainedAncestorOf(meta, head)
          throw new IllegalStateException(
            s"changefeed history before ${oldest.timestampMs} is expired — cannot start from " +
              s"fromTimestamp=$ts; restart from snapshot ${oldest.snapshotId} (or a full read)")
      }
    }
    -1L // every retained ancestor is at or after ts: from table creation
  }
  override def latestOffset(): org.apache.spark.sql.connector.read.streaming.Offset =
    GraftOffset(headId())
  override def deserializeOffset(json: String): org.apache.spark.sql.connector.read.streaming.Offset =
    GraftOffset(json.trim.toLong)
  override def commit(end: org.apache.spark.sql.connector.read.streaming.Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      end: org.apache.spark.sql.connector.read.streaming.Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftOffset].snapshotId
    val to   = end.asInstanceOf[GraftOffset].snapshotId
    // metadata unreadable mid-stream: planning "empty" would advance the
    // checkpoint silently — fail the batch, the stream retries
    if (to == -1L && from != -1L)
      throw new IllegalStateException(
        s"table $tableRoot metadata unreadable while the checkpoint holds snapshot $from")
    if (to == -1L || from == to) return Array.empty[InputPartition]

    val meta = committer.load().getOrElse(throw new IllegalStateException(
      s"table $tableRoot metadata unreadable while planning changefeed $from -> $to"))
    val byId = meta.snapshots.map(s => s.snapshotId -> s).toMap
    // the checkpointed END of a replayed batch can itself have expired
    // while the stream was down — validate it BEFORE the walk, or the
    // lag guard's own recovery-point resolution would crash on it
    if (!byId.contains(to)) {
      val recovery = meta.currentSnapshotId
        .map(h => committer.oldestRetainedAncestorOf(meta, h))
        .map(r => s"snapshot ${r.snapshotId} (history before ${r.timestampMs} is expired) or ")
        .getOrElse("")
      throw new IllegalStateException(
        s"changefeed history expired: end snapshot $to of range ($from, $to] is no longer " +
          s"in metadata — restart from ${recovery}a full read")
    }
    // walk the parent chain to the base (or to table creation for -1);
    // an expired snapshot in the range fails LOUD here
    var cur = to
    val rangeBuf = scala.collection.mutable.ArrayBuffer.empty[graft.iceberg.Snapshot]
    while (cur != from && cur != -1L) {
      // LAG GUARD: a consumer lagging past the maintenance clock's
      // retention hits expired history here — name the restart point, not
      // a generic unknown-snapshot error
      val s = byId.getOrElse(cur, {
        val oldest = committer.oldestRetainedAncestorOf(meta, to)
        throw new IllegalStateException(
          s"changefeed history expired at ${oldest.timestampMs}: snapshot $cur in range " +
            s"($from, $to] is no longer in metadata — restart from snapshot " +
            s"${oldest.snapshotId} (or a full read)")
      })
      rangeBuf += s
      cur = s.parentSnapshotId.getOrElse(
        if (from == -1L) -1L
        else throw new IllegalArgumentException(
          s"changefeed checkpoint snapshot $from is not an ancestor of $to"))
    }
    val ordered = rangeBuf.reverse.toSeq
    // validate the WHOLE range before building any partition (the
    // changesBetween discipline: a replace's physically-deleted files must
    // surface as the refusal, not a missing-path read error). The shared
    // rule also admits DATA-PRESERVING replaces (compaction/MoR folds),
    // which contribute nothing below — a checkpointed feed survives the
    // maintenance clock's vacuums instead of dying at every compaction.
    // Validation returns each delete commit's resolved inputs, reused
    // below instead of a second manifest walk.
    val deleteInputs = EventTable.validateFeedRange(committer, meta, ordered, from, to)

    val spark = org.apache.spark.sql.SparkSession.active
    val parts = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    ordered.foreach { s =>
      val op = s.summary.getOrElse("operation", "append")
      if (s.summary.get("zombi.rewrite-manifests").contains("true") ||
          s.summary.get("zombi.data-preserving").contains("true")) ()
      else op match {
        case "append" =>
          committer.entriesAtOf(meta, s.snapshotId)
            .filter(e => e.status == 1 && e.snapshotId == s.snapshotId)
            .foreach(e => parts += ChangefeedPartition(tableRoot, e.dataFile.filePath, "insert"))
        case "delete" =>
          val inputs = deleteInputs(s.snapshotId) // resolved once, in validation
          val newDels     = inputs.newDels
          val parentFiles = inputs.parentFiles
          if (newDels.nonEmpty && parentFiles.nonEmpty) {
            val priorDels = EventTable.pruneDeleteFiles(parentFiles, inputs.parentDeletes)
            // INLINE-TIER ONLY, on purpose: the batch scan escalates
            // inline -> broadcast at inlineMaskRows, but a streaming batch
            // has no clean broadcast lifecycle per trigger (one leak per
            // delete commit otherwise), and planInputPartitions holds every
            // per-file slice at once — so past the inline tier the right
            // answer is a fold (the auto-maintenance clock's job) + a full
            // re-read, refused loudly here rather than shipped as
            // hundreds of MB of task binaries.
            val totalRows = (newDels ++ priorDels).map(_.recordCount).sum
            require(totalRows <= GraftScan.inlineMaskCap(spark),
              s"changefeed delete snapshot ${s.snapshotId} resolves $totalRows mask rows " +
                s"(> inline cap ${GraftScan.inlineMaskCap(spark)}): the delete commit " +
                "predates a fold — vacuum the table and replay from a full read instead")
            // both mask sets ride the cached driver index reads
            val (dropPosBy, dropEqBy) = GraftScan.deleteMasksFor(tableRoot, priorDels)
            val (keepPosBy, keepEqBy) = GraftScan.deleteMasksFor(tableRoot, newDels)
            parentFiles.foreach { f =>
              val key = EventTable.morKeyOf(f.filePath)
              val pid = EventTable.pathPartitionOf(f.filePath)
              def seqSlice(m: Map[Int, Array[Long]]): Array[Long] = {
                val all = m.getOrElse(pid, Array.empty[Long])
                if (all.isEmpty) all
                else {
                  val lo = f.lowerLong(FieldIds.Sequence).getOrElse(Long.MinValue)
                  val hi = f.upperLong(FieldIds.Sequence).getOrElse(Long.MaxValue)
                  all.filter(x => x >= lo && x <= hi)
                }
              }
              val keepPos = keepPosBy.getOrElse(key, Array.empty[Long])
              val keepEq  = seqSlice(keepEqBy)
              // a parent file none of this commit's masks touch emits nothing
              if (keepPos.nonEmpty || keepEq.nonEmpty)
                parts += ChangefeedPartition(tableRoot, f.filePath, "delete",
                  dropPos = dropPosBy.getOrElse(key, Array.empty[Long]),
                  dropEq  = seqSlice(dropEqBy),
                  keepPos = keepPos, keepEq = keepEq)
            }
          }
        case other => throw new IllegalStateException( // unreachable: validated above
          s"changefeed snapshot ${s.snapshotId} has unvalidated operation '$other'")
      }
    }
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangefeedReaderFactory(required)
}

final class ChangefeedReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ChangefeedPartitionReader(partition.asInstanceOf[ChangefeedPartition], required)
}

/** Row reader for one changefeed file: inserts emit every row; deletes
  * emit exactly the rows live at the parent (survive `drop*`) that this
  * commit masked (hit `keep*`). `_change_type` and directory-key columns
  * ride as per-reader constants. */
final class ChangefeedPartitionReader(p: ChangefeedPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
    new org.apache.hadoop.fs.Path(s"${p.tableRoot}/${p.relPath}"),
    new org.apache.hadoop.conf.Configuration()))
  private val fileSchema = reader.getFooter.getFileMetaData.getSchema
  private val columnIO   = new ColumnIOFactory().getColumnIO(fileSchema)
  private val inPages: Array[Boolean] =
    required.fields.map(f => f.name != "_change_type" && fileSchema.containsField(f.name))
  private val consts: Array[AnyRef] =
    required.fields.map { f =>
      if (f.name == "_change_type") UTF8String.fromString(p.changeType)
      else GraftPathValues.constOf(p.relPath, f)
    }
  private val isDelete = p.changeType == "delete"
  require(!isDelete || (p.keepEq.isEmpty && p.dropEq.isEmpty) || fileSchema.containsField("sequence"),
    s"${p.relPath} carries equality masks but has no sequence column")

  private var recordReader: org.apache.parquet.io.RecordReader[Group] = _
  private var rowsLeftInGroup = 0L
  private var current: InternalRow = _
  private var ordinal  = -1L
  private var dropIdx  = 0
  private var keepIdx  = 0

  /** emit = survives EVERY drop mask (live at the parent) AND — for
    * deletes — hits a keep mask. Both positional cursors advance before
    * any verdict so ordinals stay aligned across early returns. */
  private def emits(g: Group): Boolean = {
    var droppedPos = false
    if (dropIdx < p.dropPos.length && p.dropPos(dropIdx) == ordinal) { dropIdx += 1; droppedPos = true }
    var keptPos = false
    if (keepIdx < p.keepPos.length && p.keepPos(keepIdx) == ordinal) { keepIdx += 1; keptPos = true }
    if (droppedPos) return false
    if (!isDelete) return true
    if (p.dropEq.isEmpty && p.keepEq.isEmpty) return keptPos
    val seq = g.getLong("sequence", 0)
    if (p.dropEq.nonEmpty && java.util.Arrays.binarySearch(p.dropEq, seq) >= 0) return false
    keptPos || (p.keepEq.nonEmpty && java.util.Arrays.binarySearch(p.keepEq, seq) >= 0)
  }

  override def next(): Boolean = {
    while (true) {
      while (rowsLeftInGroup == 0) {
        val pages = reader.readNextRowGroup()
        if (pages == null) return false
        recordReader = columnIO.getRecordReader(pages, new GroupRecordConverter(fileSchema))
        rowsLeftInGroup = pages.getRowCount
      }
      val g = recordReader.read()
      rowsLeftInGroup -= 1
      ordinal += 1
      if (emits(g)) { current = toRow(g); return true }
    }
    false // unreachable
  }

  private def toRow(g: Group): InternalRow = {
    val vals = required.fields.zipWithIndex.map { case (f, i) =>
      if (!inPages(i)) consts(i)
      else if (g.getFieldRepetitionCount(f.name) > 0) {
        f.dataType match {
          case LongType    => g.getLong(f.name, 0)
          case IntegerType => g.getInteger(f.name, 0)
          case DateType    => g.getInteger(f.name, 0)
          case StringType  => UTF8String.fromString(g.getString(f.name, 0))
          case BinaryType  => g.getBinary(f.name, 0).getBytes
          case DoubleType  => g.getDouble(f.name, 0)
          case BooleanType => g.getBoolean(f.name, 0)
          case other       => throw new IllegalArgumentException(s"unsupported type $other")
        }
      } else null
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
