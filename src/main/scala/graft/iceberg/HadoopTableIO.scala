package graft.iceberg

import java.util.UUID
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileSystem, Path}

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
  *  - Raw `file://`: the local FileSystem checks existence before create
  *    (not atomic under contention); single-process commits are already
  *    serialized by the committer's monitor, and multi-process local
  *    deployments should use [[LocalTableIO]] (O_EXCL) — [[TableIO.forRoot]]
  *    picks it for plain paths automatically.
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

  override def put(relPath: String, bytes: Array[Byte]): Unit = {
    val p   = abs(relPath)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp-${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(bytes)
    finally out.close()
    // Visible-or-absent: rename over the destination (atomic on HDFS;
    // delete+rename elsewhere — the temp name keeps partial writes invisible).
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"rename $tmp -> $p failed")
    }
  }

  override def putIfAbsent(relPath: String, bytes: Array[Byte]): Boolean = {
    val p = abs(relPath)
    try {
      // overwrite=false → atomic create-if-absent on HDFS/ABFS, conditional
      // PUT (If-None-Match: *) on S3A ≥ 3.4.1. The FAILURE may surface at
      // create() (HDFS) or at close() (S3A flushes the PUT on close).
      val out = fs.create(p, false)
      try out.write(bytes)
      finally out.close()
      true
    } catch {
      case _: FileAlreadyExistsException => false
      case e: java.io.IOException if e.getMessage != null &&
          (e.getMessage.contains("already exists") || e.getMessage.contains("PreconditionFailed")) =>
        false
    }
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
