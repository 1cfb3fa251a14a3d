package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, Path, PathFilter, PositionedReadable, Seekable}
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream
import org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager
import java.io.{FileNotFoundException, InputStream}
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Local-checkpoint [[CheckpointFileManager]] on java.nio.
  *
  * Structured Streaming writes its offset log, commit log, and state-store
  * changelogs through a CheckpointFileManager on EVERY trigger. The default
  * manager goes through Hadoop's LocalFileSystem, which — when the native
  * Hadoop library is absent (this container, and most non-HDFS deploys) —
  * loads POSIX permissions for each file status by FORKING `ls -ld`: a
  * measured ~40 ms per offset-log write and ~40 ms per commit-log write,
  * ~10% of a small micro-batch's trigger budget, spent in subprocesses.
  * nio performs the identical temp-file + atomic-rename protocol in
  * microseconds, and builds [[FileStatus]] listings without touching
  * permissions.
  *
  * Non-local checkpoint locations (hdfs://, s3a:// …) delegate every call
  * to Spark's own [[FileSystemBasedCheckpointFileManager]] — behavior
  * there is exactly stock, so a cluster deployment with a remote
  * checkpoint is unaffected. Select via
  * `spark.sql.streaming.checkpointFileManagerClass`.
  *
  * Crash-atomicity contract (same as the rename-based default):
  * `createAtomic` writes `.tmp-<uuid>` in the target's directory and
  * ATOMIC_MOVEs it into place on close — readers never observe partial
  * content; with `overwriteIfPossible = false` a lost race surfaces as
  * [[FileAlreadyExistsException]], which the metadata logs treat as
  * "another writer won", exactly the HDFS semantics.
  */
final class NioCheckpointFileManager(path: Path, conf: Configuration) extends CheckpointFileManager {
  private val scheme = path.toUri.getScheme
  private val local  = scheme == null || scheme == "file"

  /** Stock manager for non-local checkpoints; instantiated lazily so plain
    * local use never opens a Hadoop FileSystem. */
  private lazy val delegate = new FileSystemBasedCheckpointFileManager(path, conf)

  private def nio(p: Path): java.nio.file.Path = Paths.get(p.toUri.getPath)

  override def createAtomic(p: Path, overwriteIfPossible: Boolean): CancellableFSDataOutputStream =
    if (!local) delegate.createAtomic(p, overwriteIfPossible)
    else {
      val target = nio(p)
      Files.createDirectories(target.getParent)
      val tmp = target.getParent.resolve(s".tmp-${java.util.UUID.randomUUID()}-${target.getFileName}")
      val out = Files.newOutputStream(tmp, StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      new CancellableFSDataOutputStream(out) {
        private var done = false
        override def close(): Unit = synchronized {
          if (done) return
          done = true
          out.close()
          if (overwriteIfPossible)
            Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
          else
            // POSIX rename REPLACES an existing target, so ATOMIC_MOVE can't
            // express create-if-absent — hard-link the temp into place
            // instead: link(2) fails atomically when the target exists,
            // which is the lost-race signal the metadata logs rely on
            try { Files.createLink(target, tmp); Files.deleteIfExists(tmp); () }
            catch {
              case e: FileAlreadyExistsException =>
                Files.deleteIfExists(tmp)
                // translate to the Hadoop exception the metadata logs catch
                throw new org.apache.hadoop.fs.FileAlreadyExistsException(e.getMessage)
              case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
                // no hard-link support (some FUSE/NFS/SMB mounts): fall back
                // to exists-check + rename — the same non-atomic window the
                // stock Hadoop local manager has always had there
                if (Files.exists(target)) {
                  Files.deleteIfExists(tmp)
                  throw new org.apache.hadoop.fs.FileAlreadyExistsException(target.toString)
                }
                Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
            }
        }
        override def cancel(): Unit = synchronized {
          if (done) return
          done = true
          out.close()
          Files.deleteIfExists(tmp)
        }
      }
    }

  override def open(p: Path): FSDataInputStream =
    if (!local) delegate.open(p)
    else {
      val f = nio(p)
      if (!Files.exists(f)) throw new FileNotFoundException(p.toString)
      // a file purged between the exists check and the open (state-store
      // maintenance) surfaces as NoSuchFileException, which Spark's
      // metadata logs don't catch — translate to the FileNotFoundException
      // contract the stock manager has
      val ch =
        try FileChannel.open(f, StandardOpenOption.READ)
        catch { case e: java.nio.file.NoSuchFileException => throw new FileNotFoundException(e.getFile) }
      new FSDataInputStream(new NioSeekableInputStream(ch))
    }

  override def list(p: Path, filter: PathFilter): Array[FileStatus] =
    if (!local) delegate.list(p, filter)
    else {
      val dir = nio(p)
      if (!Files.isDirectory(dir)) {
        if (!Files.exists(dir)) throw new FileNotFoundException(p.toString)
        return status(dir).filter(st => filter.accept(st.getPath)).toArray
      }
      val s = Files.list(dir)
      try s.iterator().asScala.flatMap(status).filter(st => filter.accept(st.getPath)).toArray
      finally s.close()
    }

  private def status(f: java.nio.file.Path): Option[FileStatus] =
    try {
      val dir = Files.isDirectory(f)
      // permission-free FileStatus: the metadata logs read only
      // path/length/mtime/isDirectory — never owner or mode
      Some(new FileStatus(if (dir) 0L else Files.size(f), dir, 1, 33554432L,
        Files.getLastModifiedTime(f).toMillis, new Path(f.toUri)))
    } catch {
      // an entry deleted between enumeration and stat (state-store
      // maintenance purging old deltas concurrently) simply drops from the
      // listing — the stock Hadoop manager tolerates the same race
      case _: java.nio.file.NoSuchFileException => None
      case _: FileNotFoundException             => None
    }

  override def mkdirs(p: Path): Unit =
    if (!local) delegate.mkdirs(p) else { Files.createDirectories(nio(p)); () }

  override def exists(p: Path): Boolean =
    if (!local) delegate.exists(p) else Files.exists(nio(p))

  override def delete(p: Path): Unit =
    if (!local) delegate.delete(p)
    else graft.core.FsUtil.deleteRecursively(nio(p))

  override def isLocal: Boolean = local

  override def createCheckpointDirectory(): Path =
    if (!local) delegate.createCheckpointDirectory()
    else { Files.createDirectories(nio(path)); path }
}

/** Seekable + positioned-readable adapter from a [[FileChannel]] to the
  * InputStream shape [[FSDataInputStream]] requires. */
private[streaming] final class NioSeekableInputStream(ch: FileChannel)
    extends InputStream with Seekable with PositionedReadable {
  override def read(): Int = {
    val b = ByteBuffer.allocate(1)
    if (ch.read(b) <= 0) -1 else b.get(0) & 0xff
  }
  override def read(b: Array[Byte], off: Int, len: Int): Int = ch.read(ByteBuffer.wrap(b, off, len))
  override def close(): Unit = ch.close()

  override def seek(pos: Long): Unit = { ch.position(pos); () }
  override def getPos: Long = ch.position()
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int =
    ch.read(ByteBuffer.wrap(buffer, offset, length), position)
  override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
    var pos = position; var off = offset; var rem = length
    while (rem > 0) {
      val n = ch.read(ByteBuffer.wrap(buffer, off, rem), pos)
      if (n < 0) throw new java.io.EOFException(s"EOF at $pos reading $rem bytes")
      pos += n; off += n; rem -= n
    }
  }
  override def readFully(position: Long, buffer: Array[Byte]): Unit =
    readFully(position, buffer, 0, buffer.length)
}
