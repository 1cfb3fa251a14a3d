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
    try {
      // Atomic replace: FileContext rename with OVERWRITE swaps the
      // destination in one namespace operation on HDFS (no delete-then-
      // rename window where a concurrent reader sees the path absent).
      // Connectors that ship only a FileSystem (no AbstractFileSystem
      // binding for FileContext) fall back to delete+rename — still
      // torn-write-safe via the temp name, just not absence-free.
      try fc.rename(tmp, p, Options.Rename.OVERWRITE)
      catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          if (fs.exists(p)) fs.delete(p, false)
          if (!fs.rename(tmp, p)) throw new IOException(s"rename $tmp -> $p failed")
      }
    } catch {
      case e: Exception =>
        try fs.delete(tmp, false) catch { case _: IOException => () }
        throw e
    }
  }

  /** Schemes whose FileContext rename-WITHOUT-overwrite is enforced
    * server-side as one atomic namespace op (the namenode rejects an
    * existing destination). Everything else — notably ABFS/GCS bindings
    * whose `DelegateToFileSystem.renameInternal` does a CLIENT-SIDE
    * dest-exists check — must stay on the conditional-create path below,
    * or two racing committers can both pass the exists check and both
    * report success. Extendable per-deployment via `graft.cas.rename.schemes`
    * once a connector's rename is verified server-atomic.
    */
  private[graft] val renameCasSchemes: Set[String] =
    conf.getTrimmedStrings("graft.cas.rename.schemes",
      // namenode-enforced: hdfs natively; (s)webhdfs maps to the same
      // RENAME op server-side. viewfs is deliberately NOT here: its mount
      // table may target any filesystem (local, s3a via overload scheme),
      // and a non-HDFS target's renameInternal falls back to a client-side
      // dest-exists check — add it per-deployment only when every mount is
      // known to resolve to HDFS.
      "hdfs", "webhdfs", "swebhdfs").map(_.toLowerCase).toSet
  private val scheme: String =
    Option(rootPath.toUri.getScheme).getOrElse("file").toLowerCase

  override def putIfAbsent(relPath: String, bytes: Array[Byte]): Boolean = {
    val p = abs(relPath)
    // Prefer the ATOMICALLY-WHOLE publish where it is truly atomic: write a
    // temp fully, then FileContext rename WITHOUT overwrite — on HDFS one
    // namespace op that fails (FileAlreadyExists) when the destination
    // exists. Crucially the content appears all-or-nothing, so a concurrent
    // committer can never read a REAL in-flight commit as a half-written
    // torn artifact (the create-reserves-then-stream path below exposes
    // exactly that window). Only schemes in [[renameCasSchemes]] take this
    // path: object-store FileContext bindings emulate no-overwrite rename
    // with a client-side exists check (lost-commit race), and their
    // conditional PUT is whole-object at close anyway.
    if (renameCasSchemes.contains(scheme)) try {
      val tmp = new Path(p.getParent, s".${p.getName}.cas-${UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      try out.write(bytes)
      finally out.close()
      try { fc.rename(tmp, p); return true }
      catch {
        case e: org.apache.hadoop.fs.UnsupportedFileSystemException => throw e
        case e: IOException => // includes FileAlreadyExistsException
          try fs.delete(tmp, false) catch { case _: IOException => () }
          // "destination exists" is usually the genuine loss of the race —
          // but on HTTP-fronted schemes (webhdfs) it can be OUR OWN rename
          // having succeeded with the response lost (the client's idempotent
          // retry then finds the dest present). Decide by content, same as
          // the conditional-create path below: our bytes at the path mean
          // our commit landed — reporting false here would make the caller
          // re-commit the same changes at the next version.
          val ours = try java.util.Arrays.equals(get(relPath), bytes)
                     catch { case _: IOException => false }
          if (ours) return true
          e match {
            case _: FileAlreadyExistsException => return false
            // some FileContexts surface "destination exists" as a generic
            // IOException — classify by the path's presence
            case _ => if (fs.exists(p)) return false else throw e
          }
      }
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException => () // no FileContext — fall through
    }
    // overwrite=false → conditional PUT (If-None-Match: *) on S3A ≥ 3.4.1
    // (atomic and whole-object at close). The FAILURE may surface at
    // create() or at close() (S3A flushes the PUT on close).
    val out =
      try fs.create(p, false)
      catch {
        case _: FileAlreadyExistsException => return false
        // create-time IOException with the path already present = lost race
        // surfaced generically by the connector
        case _: IOException if fs.exists(p) => return false
      }
    try {
      try out.write(bytes)
      finally out.close() // stream is never leaked; close's own error propagates
      true
    } catch {
      case e: IOException =>
        // Failure at write/close. Decide by WHAT IS AT THE PATH NOW — never
        // by exception text (connector messages vary):
        //  - different bytes: a concurrent committer's PUT landed → lost
        //    race (covers the S3A 412 family without string sniffing);
        //  - our bytes: our create materialized but errored (HDFS lease
        //    paths) → delete the torn file so it can never be read as a
        //    committed version, then surface the error;
        //  - nothing readable: our PUT never materialized → surface the
        //    error. A winner's file is never deleted: on conditional-PUT
        //    stores our failed close reserved nothing, so the path may
        //    legitimately hold someone else's commit.
        val current = try Some(get(relPath)) catch { case _: IOException => None }
        current match {
          case Some(cur) if !java.util.Arrays.equals(cur, bytes) => false
          case Some(_) =>
            try fs.delete(p, false) catch { case _: IOException => () }
            throw e
          case None => throw e
        }
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

  override def listFilesRecursive(relPrefix: String): Seq[(String, Long)] = {
    val dir = abs(relPrefix)
    if (!fs.exists(dir)) return Nil
    val rootUriPath = rootPath.toUri.getPath
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val it  = fs.listFiles(dir, true)
    while (it.hasNext) {
      val st  = it.next()
      val rel = st.getPath.toUri.getPath.stripPrefix(rootUriPath).stripPrefix("/")
      out += ((rel, st.getModificationTime))
    }
    out.toSeq
  }

  override def delete(relPath: String): Unit = {
    fs.delete(abs(relPath), false)
    ()
  }
}
