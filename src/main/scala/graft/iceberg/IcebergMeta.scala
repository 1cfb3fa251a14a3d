package graft.iceberg

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** Iceberg v2 table metadata model, hand-rolled (no iceberg-spark runtime on
  * the classpath). Shapes follow the public Iceberg v2 spec; field IDs and
  * the simplified field subset match the reference gateway so tables are
  * mutually readable (`/root/reference/src/storage/iceberg.rs:16-39,126-184,
  * 458-494`).
  *
  * One deliberate divergence, documented: the reference partitions on
  * `identity(event_date), identity(event_hour)` (`iceberg.rs:297-318`) and
  * writes one file per (date, hour, partition) — which produces micro-files
  * at low volume. Here the spec declares `identity(partition)` (the log
  * partition, field 1000): files are single-`partition`, size-targeted, and
  * carry `event_date`/`event_hour`/`timestamp_ms` min-max bounds in the
  * manifests, so engines prune on time via file stats (the same mechanism
  * the reference's own SPEC delegates to, `SPEC.md:306-318`) rather than on
  * directory identity.
  */
object FieldIds {
  val Sequence        = 1
  val Topic           = 2
  val Partition       = 3
  val Payload         = 4
  val TimestampMs     = 5
  val IdempotencyKey  = 6
  val EventDate       = 7
  val EventHour       = 8
  val PayloadOverflow = 99
  val ExtractedStart  = 100
}

/** Iceberg stores bounds big-endian in lower/upper_bounds maps — match the
  * reference's encoding (`/root/reference/src/storage/iceberg.rs:41-76`). */
object Bounds {
  def encodeLong(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(v).array()
  def encodeInt(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(v).array()
  def decodeLong(b: Array[Byte]): Long = java.nio.ByteBuffer.wrap(b).getLong
  def decodeInt(b: Array[Byte]): Int   = java.nio.ByteBuffer.wrap(b).getInt
}

final case class IcebergField(id: Int, name: String, fieldType: String, required: Boolean)

final case class IcebergSchema(schemaId: Int, fields: Seq[IcebergField]) {
  def toNode(m: ObjectMapper): ObjectNode = {
    val n = m.createObjectNode()
    n.put("type", "struct")
    n.put("schema-id", schemaId)
    val fs = n.putArray("fields")
    fields.foreach { f =>
      val fn = fs.addObject()
      fn.put("id", f.id); fn.put("name", f.name)
      fn.put("type", f.fieldType); fn.put("required", f.required)
    }
    n
  }
}

object IcebergSchema {
  /** The reference's default 8-column event schema with stable field IDs. */
  val default: IcebergSchema = IcebergSchema(
    0,
    Seq(
      IcebergField(FieldIds.Sequence, "sequence", "long", required = true),
      IcebergField(FieldIds.Topic, "topic", "string", required = true),
      IcebergField(FieldIds.Partition, "partition", "int", required = true),
      IcebergField(FieldIds.Payload, "payload", "binary", required = true),
      IcebergField(FieldIds.TimestampMs, "timestamp_ms", "long", required = true),
      IcebergField(FieldIds.IdempotencyKey, "idempotency_key", "string", required = false),
      IcebergField(FieldIds.EventDate, "event_date", "date", required = true),
      IcebergField(FieldIds.EventHour, "event_hour", "int", required = true)
    )
  )

  /** §1.3 structured-columns schema: `payload` (ID 4) is REPLACED by the
    * extracted fields (IDs 100+) and a nullable `_payload_overflow` binary
    * column (ID 99) holding the unextracted JSON remainder
    * (`/root/reference/src/storage/iceberg.rs:186-266`). `icebergTypes` maps
    * the config's type names (`src/contracts/schema.rs:56-77`). */
  private val icebergTypes = Map(
    "Utf8" -> "string", "Int32" -> "int", "Int64" -> "long",
    "Float64" -> "double", "Boolean" -> "boolean", "Binary" -> "binary")

  /** The §1.3 schema-on-flush shape: typed extracted columns (ids 100+) +
    * the `_payload_overflow` remainder (id 99) INSTEAD of the raw payload
    * — the reference's extracted tables never carry a payload column.
    * `keepPayload = true` is the EVOLUTION shape for a table that
    * committed default-schema files before its extraction config
    * appeared: Iceberg evolution may not drop a field, so the payload
    * column stays (demoted to optional — post-config files read it as
    * null) and the extracted columns join it. */
  def withExtraction(fieldTypes: Seq[(String, String)], keepPayload: Boolean = false): IcebergSchema = {
    val extracted = fieldTypes.zipWithIndex.map { case ((name, dt), i) =>
      IcebergField(FieldIds.ExtractedStart + i, name,
        icebergTypes.getOrElse(dt, throw new IllegalArgumentException(s"bad type $dt")),
        required = false)
    }
    val baseFields =
      if (keepPayload)
        default.fields.map(f => if (f.id == FieldIds.Payload) f.copy(required = false) else f)
      else default.fields.filterNot(_.id == FieldIds.Payload)
    IcebergSchema(0, baseFields ++ extracted :+
      IcebergField(FieldIds.PayloadOverflow, "_payload_overflow", "string", required = false))
  }
}

final case class PartitionField(sourceId: Int, fieldId: Int, name: String, transform: String)

final case class PartitionSpec(specId: Int, fields: Seq[PartitionField]) {
  def toNode(m: ObjectMapper): ObjectNode = {
    val n = m.createObjectNode()
    n.put("spec-id", specId)
    val fs = n.putArray("fields")
    fields.foreach { f =>
      val fn = fs.addObject()
      fn.put("source-id", f.sourceId); fn.put("field-id", f.fieldId)
      fn.put("name", f.name); fn.put("transform", f.transform)
    }
    n
  }
  def fieldsJson(m: ObjectMapper): String = {
    val arr = m.createArrayNode()
    fields.foreach { f =>
      val fn = arr.addObject()
      fn.put("source-id", f.sourceId); fn.put("field-id", f.fieldId)
      fn.put("name", f.name); fn.put("transform", f.transform)
    }
    m.writeValueAsString(arr)
  }
}

object PartitionSpec {
  val default: PartitionSpec = PartitionSpec(
    0,
    Seq(
      PartitionField(FieldIds.Partition, 1000, "partition", "identity")
    )
  )

  /** The aging-table evolution target (x12): keep identity(partition), add
    * identity(event_date) — as volume grows, date dirs bound what a
    * time-ranged scan must even list. Spec ids are assigned by
    * [[IcebergCommitter.evolvePartitionSpec]]; these are the FIELDS. */
  val dateFields: Seq[PartitionField] = Seq(
    PartitionField(FieldIds.Partition, 1000, "partition", "identity"),
    PartitionField(FieldIds.EventDate, 1001, "event_date", "identity")
  )
}

final case class SortField(sourceId: Int, transform: String, direction: String, nullOrder: String)

final case class SortOrder(orderId: Int, fields: Seq[SortField]) {
  def toNode(m: ObjectMapper): ObjectNode = {
    val n = m.createObjectNode()
    n.put("order-id", orderId)
    val fs = n.putArray("fields")
    fields.foreach { f =>
      val fn = fs.addObject()
      fn.put("transform", f.transform); fn.put("source-id", f.sourceId)
      fn.put("direction", f.direction); fn.put("null-order", f.nullOrder)
    }
    n
  }
}

object SortOrder {
  /** timestamp_ms ASC, sequence ASC — the reference's file sort order
    * (`/root/reference/src/storage/iceberg.rs:363-388`). */
  val timestampSequence: SortOrder = SortOrder(
    1,
    Seq(
      SortField(FieldIds.TimestampMs, "identity", "asc", "nulls-last"),
      SortField(FieldIds.Sequence, "identity", "asc", "nulls-last")
    )
  )
}

final case class Snapshot(
    snapshotId: Long,
    parentSnapshotId: Option[Long],
    timestampMs: Long,
    manifestList: String,
    summary: Map[String, String],
    schemaId: Int
)

final case class SnapshotLogEntry(snapshotId: Long, timestampMs: Long)

/** A named snapshot reference (the Iceberg spec's `refs` map value):
  * `branch` refs move with commits, `tag` refs pin a snapshot. */
final case class SnapshotRef(snapshotId: Long, refType: String)

final case class TableMetadata(
    formatVersion: Int,
    tableUuid: String,
    location: String,
    lastSequenceNumber: Long,
    lastUpdatedMs: Long,
    lastColumnId: Int,
    schemas: Seq[IcebergSchema],
    currentSchemaId: Int,
    partitionSpecs: Seq[PartitionSpec],
    defaultSpecId: Int,
    lastPartitionId: Int,
    properties: Map[String, String],
    currentSnapshotId: Option[Long],
    snapshots: Seq[Snapshot],
    snapshotLog: Seq[SnapshotLogEntry],
    sortOrders: Seq[SortOrder],
    defaultSortOrderId: Int,
    /** USER-created named refs (tags), stored in metadata and CAS-committed
      * like any change ([[IcebergCommitter.createTag]]/[[dropTag]]) — unlike
      * the DERIVED refs (`main`, `stage-*`), which are recomputed from
      * pointer + stage state on every serialization. Tagged snapshots are
      * protected from [[IcebergCommitter.expireSnapshots]]. */
    storedRefs: Map[String, SnapshotRef] = Map.empty
) {
  def currentSnapshot: Option[Snapshot] =
    currentSnapshotId.flatMap(id => snapshots.find(_.snapshotId == id))

  /** The Iceberg `refs` map, DERIVED from pointer + stage state rather than
    * stored: `main` (branch) tracks the current snapshot — so every commit,
    * publish, and rollback moves it by construction — and each unpublished
    * write-audit-publish stage (`zombi.staged` summary, never in the
    * snapshot log) surfaces as a `stage-<id>` tag, so external engines can
    * see and read in-flight staged work by name instead of scraping our
    * summary markers. Publishing a stage logs it (tag retires, `main`
    * advances); expiring a dead stage removes its snapshot (tag retires
    * with it). Ref retention follows the engine's stage rules — live
    * stages and the current snapshot are protected by
    * [[IcebergCommitter.expireSnapshots]], dead stages are expirable — so
    * a ref can never name a snapshot the metadata no longer carries. */
  def refs: Map[String, SnapshotRef] = {
    val stageTags = snapshots.collect {
      case s if s.summary.get("zombi.staged").contains("true") &&
                !snapshotLog.exists(_.snapshotId == s.snapshotId) =>
        s"stage-${s.snapshotId}" -> SnapshotRef(s.snapshotId, "tag")
    }
    // user tags first; the derived names win on (disallowed-at-create)
    // collisions, so `main` always means the current pointer
    storedRefs ++
      (currentSnapshotId.map(id => "main" -> SnapshotRef(id, "branch")).toSeq ++ stageTags).toMap
  }

  def toJson: String = {
    val m = TableMetadata.mapper
    val n = m.createObjectNode()
    n.put("format-version", formatVersion)
    n.put("table-uuid", tableUuid)
    n.put("location", location)
    n.put("last-sequence-number", lastSequenceNumber)
    n.put("last-updated-ms", lastUpdatedMs)
    n.put("last-column-id", lastColumnId)
    val sch = n.putArray("schemas"); schemas.foreach(s => sch.add(s.toNode(m)))
    n.put("current-schema-id", currentSchemaId)
    val ps = n.putArray("partition-specs"); partitionSpecs.foreach(p => ps.add(p.toNode(m)))
    n.put("default-spec-id", defaultSpecId)
    n.put("last-partition-id", lastPartitionId)
    val props = n.putObject("properties")
    properties.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    currentSnapshotId match {
      case Some(id) => n.put("current-snapshot-id", id)
      case None     => n.put("current-snapshot-id", -1L)
    }
    val snaps = n.putArray("snapshots")
    snapshots.foreach { s =>
      val sn = snaps.addObject()
      sn.put("snapshot-id", s.snapshotId)
      s.parentSnapshotId.foreach(p => sn.put("parent-snapshot-id", p))
      sn.put("timestamp-ms", s.timestampMs)
      sn.put("manifest-list", s.manifestList)
      val sm = sn.putObject("summary")
      s.summary.toSeq.sortBy(_._1).foreach { case (k, v) => sm.put(k, v) }
      sn.put("schema-id", s.schemaId)
    }
    val slog = n.putArray("snapshot-log")
    snapshotLog.foreach { e =>
      val en = slog.addObject()
      en.put("snapshot-id", e.snapshotId); en.put("timestamp-ms", e.timestampMs)
    }
    val so = n.putArray("sort-orders"); sortOrders.foreach(s => so.add(s.toNode(m)))
    n.put("default-sort-order-id", defaultSortOrderId)
    // derived refs (main, stage-*) are recomputed on every serialization
    // (see [[refs]]); USER tags ride along and round-trip through fromJson.
    // External readers (REST catalog loads, engines reading
    // v{N}.metadata.json directly) see the merged map, per the Iceberg spec
    val rf = n.putObject("refs")
    refs.toSeq.sortBy(_._1).foreach { case (name, r) =>
      val rn = rf.putObject(name)
      rn.put("snapshot-id", r.snapshotId); rn.put("type", r.refType)
    }
    m.writerWithDefaultPrettyPrinter().writeValueAsString(n)
  }
}

object TableMetadata {
  private[iceberg] val mapper = new ObjectMapper()

  def create(location: String, schema: IcebergSchema = IcebergSchema.default): TableMetadata = TableMetadata(
    formatVersion = 2,
    tableUuid = java.util.UUID.randomUUID().toString,
    location = location,
    lastSequenceNumber = 0L,
    lastUpdatedMs = System.currentTimeMillis(),
    lastColumnId = schema.fields.map(_.id).max,
    schemas = Seq(schema),
    currentSchemaId = 0,
    partitionSpecs = Seq(PartitionSpec.default),
    defaultSpecId = 0,
    lastPartitionId = 1000,
    properties = Map("write.format.default" -> "parquet", "write.parquet.compression-codec" -> "zstd"),
    currentSnapshotId = None,
    snapshots = Nil,
    snapshotLog = Nil,
    sortOrders = Seq(SortOrder.timestampSequence),
    defaultSortOrderId = 1
  )

  def fromJson(json: String): TableMetadata = {
    val n = mapper.readTree(json)
    def optLong(node: JsonNode, k: String): Option[Long] =
      Option(node.get(k)).filterNot(_.isNull).map(_.asLong).filter(_ != -1L)
    def strMap(node: JsonNode): Map[String, String] =
      if (node == null) Map.empty
      else node.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    val schemas = Option(n.get("schemas")).toSeq.flatMap(_.elements().asScala).map { sn =>
      IcebergSchema(
        sn.get("schema-id").asInt,
        sn.get("fields").elements().asScala.map { fn =>
          IcebergField(fn.get("id").asInt, fn.get("name").asText, fn.get("type").asText, fn.get("required").asBoolean)
        }.toSeq
      )
    }
    val specs = Option(n.get("partition-specs")).toSeq.flatMap(_.elements().asScala).map { pn =>
      PartitionSpec(
        pn.get("spec-id").asInt,
        pn.get("fields").elements().asScala.map { fn =>
          PartitionField(fn.get("source-id").asInt, fn.get("field-id").asInt, fn.get("name").asText, fn.get("transform").asText)
        }.toSeq
      )
    }
    val sortOrders = Option(n.get("sort-orders")).toSeq.flatMap(_.elements().asScala).map { on =>
      SortOrder(
        on.get("order-id").asInt,
        Option(on.get("fields")).toSeq.flatMap(_.elements().asScala).map { fn =>
          SortField(fn.get("source-id").asInt, fn.get("transform").asText, fn.get("direction").asText, fn.get("null-order").asText)
        }
      )
    }
    val snapshots = Option(n.get("snapshots")).toSeq.flatMap(_.elements().asScala).map { sn =>
      Snapshot(
        sn.get("snapshot-id").asLong,
        optLong(sn, "parent-snapshot-id"),
        sn.get("timestamp-ms").asLong,
        sn.get("manifest-list").asText,
        strMap(sn.get("summary")),
        Option(sn.get("schema-id")).map(_.asInt).getOrElse(0)
      )
    }
    val slog = Option(n.get("snapshot-log")).toSeq.flatMap(_.elements().asScala).map { en =>
      SnapshotLogEntry(en.get("snapshot-id").asLong, en.get("timestamp-ms").asLong)
    }
    // user refs round-trip; the DERIVED names are dropped here and
    // recomputed from pointer/stage state — the derivation stays the
    // single source of truth for them
    val storedRefs = Option(n.get("refs")).map { rn =>
      rn.properties().asScala.collect {
        case e if e.getKey != "main" && !e.getKey.startsWith("stage-") =>
          e.getKey -> SnapshotRef(e.getValue.get("snapshot-id").asLong, e.getValue.get("type").asText)
      }.toMap
    }.getOrElse(Map.empty[String, SnapshotRef])
    TableMetadata(
      n.get("format-version").asInt,
      n.get("table-uuid").asText,
      n.get("location").asText,
      n.get("last-sequence-number").asLong,
      n.get("last-updated-ms").asLong,
      n.get("last-column-id").asInt,
      schemas,
      n.get("current-schema-id").asInt,
      specs,
      n.get("default-spec-id").asInt,
      Option(n.get("last-partition-id")).map(_.asInt).getOrElse(1000),
      strMap(n.get("properties")),
      optLong(n, "current-snapshot-id"),
      snapshots,
      slog,
      sortOrders,
      Option(n.get("default-sort-order-id")).map(_.asInt).getOrElse(0),
      storedRefs
    )
  }
}
