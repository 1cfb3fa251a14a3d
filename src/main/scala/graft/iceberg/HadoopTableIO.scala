package graft.iceberg

import java.io.IOException
import java.util.UUID
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileContext, FileSystem, Options, Path}

/** [[TableIO]] over `org.apache.hadoop.fs.FileSystem` — the deployable
  * object-store binding the reference has natively (its committer talks to
  * S3 with conditional PUTs, `/root/reference/src/storage/iceberg_storage.rs`,
  * retrying via `src/storage/retry.rs:17-123`). Any Hadoop-supported scheme
  * works unchanged: `file://`, `hdfs://`, and — with the corresponding
  * connector jar deployed — `s3a://`, `gs://`, `abfs://`.
  *
  * Atomicity mapping for the commit point (`putIfAbsent` on
  * `v{N}.metadata.json`):
  *  - HDFS / ABFS: `create(overwrite = false)` is an atomic
  *    create-if-absent at the namenode — two racing committers cannot both
  *    win.
  *  - S3A (Hadoop ≥ 3.4.1 with `fs.s3a.create.conditional.enabled`, the
  *    default): `create(overwrite = false)` issues an `If-None-Match: *`
  *    conditional PUT at close, the same primitive the reference uses.
  *  - Raw `file://`: Hadoop's LocalFileSystem checks existence before
  *    create (NOT atomic under contention), so [[TableIO.forRoot]] routes
  *    local roots — plain paths and `file://` URIs alike — to
  *    [[LocalTableIO]] (O_EXCL); this class reaches the local FS only via
  *    the explicit `GRAFT_TABLE_IO=hadoop` override or direct construction.
  *
  * Regular `put` is write-to-temp + rename, so readers never observe a
  * half-written manifest even on stores with non-atomic create.
  *
  * Retries (the reference's `retry.rs` exponential backoff) are deliberately
  * NOT re-implemented here: Hadoop FileSystem clients carry their own
  * retry/backoff policies (`fs.s3a.retry.*`, dfs client retries), and
  * double-wrapping retries around a conditional PUT turns a lost race into
  * a spurious `CommitConflict` storm.
  */
final class HadoopTableIO(val root: String, conf: Configuration = new Configuration())
    extends TableIO {
  private val rootPath      = new Path(root)
  @transient private lazy val fs: FileSystem = rootPath.getFileSystem(conf)
  private def abs(rel: String): Path = new Path(rootPath, rel)

  @transient private lazy val fc: FileContext = FileContext.getFileContext(rootPath.toUri, conf)

  override def put(relPath: String, bytes: Array[Byte]): Unit = {
    val p   = abs(relPath)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp-${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(bytes)
    finally out.close()
    // Atomic replace: FileContext rename with OVERWRITE swaps the
    // destination in one namespace operation on HDFS (no delete-then-rename
    // window where a concurrent reader sees the path absent). The temp name
    // keeps partial writes invisible everywhere.
    fc.rename(tmp, p, Options.Rename.OVERWRITE)
  }

  override def putIfAbsent(relPath: String, bytes: Array[Byte]): Boolean = {
    val p = abs(relPath)
    // overwrite=false → atomic create-if-absent on HDFS/ABFS, conditional
    // PUT (If-None-Match: *) on S3A ≥ 3.4.1. The FAILURE may surface at
    // create() (HDFS, namenode rejects) or at close() (S3A flushes the PUT
    // on close) — handled separately so a genuine write failure is never
    // misreported as a lost race.
    val out =
      try fs.create(p, false)
      catch {
        case _: FileAlreadyExistsException => return false
        // create-time IOException with the path already present = lost race
        // surfaced generically by the connector
        case _: IOException if fs.exists(p) => return false
      }
    try {
      out.write(bytes)
      out.close()
      true
    } catch {
      case e: IOException if isPreconditionFailure(e) => false // S3A lost the conditional PUT
      case e: IOException =>
        // genuine failure AFTER our create: remove the torn file so it can
        // never be mistaken for a committed metadata version, then rethrow
        try fs.delete(p, false) catch { case _: IOException => () }
        throw e
    }
  }

  /** A close-time failure that means a concurrent conditional PUT won (the
    * HTTP 412 family), as opposed to a genuine write error. */
  private def isPreconditionFailure(e: IOException): Boolean = {
    val m = Option(e.getMessage).getOrElse("")
    val cls = e.getClass.getSimpleName
    m.contains("PreconditionFailed") || m.contains("412") || m.contains("If-None-Match") ||
      m.contains("already exists") || cls.contains("RemoteFileChanged")
  }

  override def get(relPath: String): Array[Byte] = {
    val in = fs.open(abs(relPath))
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](64 * 1024)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }

  override def exists(relPath: String): Boolean = fs.exists(abs(relPath))

  override def list(relPrefix: String): Seq[String] = {
    val dir = abs(relPrefix)
    if (!fs.exists(dir)) Nil
    else
      fs.listStatus(dir).toSeq.map(st => relPrefix + "/" + st.getPath.getName)
  }

  override def delete(relPath: String): Unit = {
    fs.delete(abs(relPath), false)
    ()
  }
}
