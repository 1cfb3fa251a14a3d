package graft.spark

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Spark V2 `TableCatalog` over a graft warehouse directory — the SQL-first
  * entry point: register once
  * (`spark.sql.catalog.zombi=graft.spark.GraftCatalog`,
  * `spark.sql.catalog.zombi.warehouse=/path/to/warehouse`) and every
  * committed table is queryable as `zombi.default.<table>` from plain SQL,
  * with the same manifest-bound file pruning and vectorized read path as
  * `format("graft")`. Read-only by design: writes go through the engine's
  * ingestion paths (gateway / StreamIngest), exactly like the reference,
  * whose REST catalog is also read-only (`/root/reference/src/api/catalog.rs:193-366`).
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var warehouse: String   = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(s"catalog $name requires option 'warehouse'"))
  }

  override def name(): String = catalogName

  private val Ns = Array("default")

  private def tableRoot(ident: Identifier): String = {
    val t = ident.name()
    require(t.matches("[a-zA-Z][a-zA-Z0-9_-]{0,127}"), s"invalid table name: $t")
    Paths.get(warehouse, t).toString
  }

  private def isCommitted(dir: java.nio.file.Path): Boolean =
    Files.isDirectory(dir.resolve("metadata"))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespace.sameElements(Ns) && namespace.nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
    val base = Paths.get(warehouse)
    if (!Files.isDirectory(base)) Array.empty
    else {
      val s = Files.list(base)
      try s.iterator().asScala
        .filter(isCommitted)
        .map(p => Identifier.of(Ns, p.getFileName.toString))
        .toArray
      finally s.close()
    }
  }

  override def loadTable(ident: Identifier): Table = {
    val n  = ident.name()
    val di = n.indexOf('$')
    if (di > 0) {
      // Iceberg-style metadata relations: `` t$snapshots ``, `` t$history ``,
      // `` t$files ``, `` t$manifests `` (backquoted in SQL).
      val (base, kind) = (n.substring(0, di), n.substring(di + 1))
      if (!GraftMetadataTable.Kinds(kind))
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
      val root = tableRoot(Identifier.of(ident.namespace(), base))
      if (!isCommitted(Paths.get(root)))
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
      return new GraftMetadataTable(root, base, kind, s"$catalogName.default.$n")
    }
    val root = tableRoot(ident)
    if (!isCommitted(Paths.get(root)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    new GraftTable(root, GraftDataSource.sparkSchema(root))
  }

  private def committerOf(ident: Identifier) = {
    val root = tableRoot(ident)
    if (!isCommitted(Paths.get(root)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    (root, new graft.iceberg.IcebergCommitter(graft.iceberg.TableIO.forRoot(root), ident.name()))
  }

  /** SQL `VERSION AS OF <snapshotId | 'ref-name'>` — any retained snapshot
    * is readable by id, and any ref (user tag, `main`, `stage-*`) by name. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val (root, c) = committerOf(ident)
    val meta = c.load().getOrElse(
      throw new IllegalArgumentException(s"table ${ident.name()} has no committed metadata"))
    new GraftTable(root, GraftDataSource.sparkSchema(root),
      Some(c.resolveVersionOf(meta, version)))
  }

  /** SQL `TIMESTAMP AS OF <ts>` (micros) — latest snapshot committed at or
    * before the timestamp. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val (root, c) = committerOf(ident)
    val tsMs = timestampMicros / 1000L
    val snap = c.load().toSeq.flatMap(_.snapshots).filter(_.timestampMs <= tsMs)
      .sortBy(_.timestampMs).lastOption.getOrElse(
        throw new IllegalArgumentException(s"no snapshot of ${ident.name()} at or before $tsMs ms"))
    new GraftTable(root, GraftDataSource.sparkSchema(root), Some(snap.snapshotId))
  }

  override def createTable(ident: Identifier, schema: StructType, partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog is read-only; ingest through the gateway or StreamIngest")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  // ---- SupportsNamespaces (single flat "default" namespace) ----

  override def listNamespaces(): Array[Array[String]] = Array(Ns)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) Array(Ns)
    else if (namespace.sameElements(Ns)) Array.empty
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] =
    if (namespace.sameElements(Ns)) java.util.Collections.emptyMap()
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String], metadata: java.util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")
}
