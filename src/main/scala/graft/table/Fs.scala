package graft.table

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** All table metadata/listing IO goes through the Hadoop `FileSystem` API —
  * the engine's tables live on HDFS/S3/GCS on a real cluster, not the local
  * disk. Roots may be plain paths, `file:` URIs, `hdfs://...`, or any
  * registered scheme; the filesystem is resolved per path from the Hadoop
  * configuration (the same one Spark's own parquet IO uses, so data and
  * metadata always land on the same store).
  *
  * Atomicity: metadata writes are write-temp + rename. On HDFS and local
  * filesystems rename is atomic; on S3A it is copy+delete (non-atomic but
  * still all-or-nothing per object since the temp object is complete before
  * the copy) — the standard lake-format caveat (Iceberg/Delta document the
  * same; a production S3 deployment fronts commits with a catalog lock).
  */
final class Fs(@transient private val conf: Configuration) extends Serializable {

  private def fs(p: Path): FileSystem = p.getFileSystem(conf)

  def exists(path: String): Boolean = { val p = new Path(path); fs(p).exists(p) }

  def readString(path: String): String = {
    val p = new Path(path)
    val in = fs(p).open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** writer-unique temp name: concurrent writers of the SAME target must
    * not truncate each other's in-flight temp file
    */
  private def tmpFor(p: Path): Path =
    new Path(p.getParent, s"${p.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")

  /** write-temp + atomic rename-with-overwrite (FileContext gives the
    * POSIX-style overwrite rename that plain FileSystem.rename lacks).
    */
  def atomicWrite(path: String, content: String): Unit = {
    val p = new Path(path)
    val f = fs(p)
    f.mkdirs(p.getParent)
    val tmp = tmpFor(p)
    val out = f.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    try FileContext.getFileContext(f.getUri, conf).rename(tmp, p, Options.Rename.OVERWRITE)
    catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // scheme has a FileSystem but no AbstractFileSystem binding (e.g. a
        // custom test FS): plain rename — POSIX-overwriting on local FSs,
        // delete-then-rename otherwise (documented non-atomic window).
        if (!f.rename(tmp, p)) {
          f.delete(p, false)
          if (!f.rename(tmp, p)) {
            // last resort: rewrite the destination directly from the content
            // we still hold — a failure here must leave p PRESENT (a
            // destroyed VERSION pointer would make the whole table vanish)
            val o = f.create(p, true)
            try o.write(content.getBytes(StandardCharsets.UTF_8)) finally o.close()
            f.delete(tmp, false)
          }
        }
    }
  }

  /** write-temp + atomic rename WITHOUT overwrite — the commit-exclusivity
    * primitive (Delta's HDFS LogStore shape): returns true iff THIS writer
    * created `path`; false if it already existed (a concurrent writer won).
    * Fallback for schemes without an AbstractFileSystem binding: exclusive
    * `create(path, overwrite = false)` — still exclusive, with a
    * documented partially-visible window no concurrent test scheme hits.
    */
  def atomicCreate(path: String, content: String): Boolean = {
    val p = new Path(path)
    val f = fs(p)
    if (f.exists(p)) return false // cheap fast-path; the rename still arbitrates
    f.mkdirs(p.getParent)
    val bytes = content.getBytes(StandardCharsets.UTF_8)
    val tmp = tmpFor(p)
    val out = f.create(tmp, true)
    try out.write(bytes) finally out.close()
    // HDFS arbitrates the no-overwrite rename atomically server-side; the
    // LOCAL FileContext does a check-then-rename, so same-JVM racers (the
    // concurrency tests, multi-stream drivers) are serialized here too.
    Fs.createArbiter.synchronized {
      try {
        FileContext.getFileContext(f.getUri, conf).rename(tmp, p, Options.Rename.NONE)
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          f.delete(tmp, false); false
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          try {
            val o = f.create(p, false)
            try o.write(bytes) finally o.close()
            f.delete(tmp, false); true
          } catch {
            case _: java.io.IOException => f.delete(tmp, false); false
          }
      }
    }
  }

  def delete(path: String): Boolean = { val p = new Path(path); fs(p).delete(p, false) }
  def deleteRecursive(path: String): Boolean = { val p = new Path(path); fs(p).delete(p, true) }
  def mkdirs(path: String): Boolean = { val p = new Path(path); fs(p).mkdirs(p) }

  /** immediate children that are directories (no recursion) */
  def listDirs(path: String): Seq[String] = {
    val p = new Path(path)
    val f = fs(p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.toString).sorted
  }

  /** immediate children files whose NAME matches the predicate */
  def listFiles(path: String, name: String => Boolean): Seq[String] = {
    val p = new Path(path)
    val f = fs(p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.filter(s => s.isFile && name(s.getPath.getName))
      .map(_.getPath.toString).sorted
  }

  /** recursive count of files whose name matches (for reclaim checks).
    * Manual listStatus recursion rather than FileSystem.listFiles(recursive):
    * the latter materialises LocatedFileStatus eagerly (permission IO that
    * breaks on re-schemed local filesystems); we only need names.
    */
  def countFilesRecursive(path: String, name: String => Boolean): Long = {
    val root = new Path(path)
    val f = fs(root)
    if (!f.exists(root)) return 0L
    var n = 0L
    val stack = scala.collection.mutable.Stack(root)
    while (stack.nonEmpty) {
      f.listStatus(stack.pop()).foreach { s =>
        if (s.isDirectory) stack.push(s.getPath)
        else if (name(s.getPath.getName)) n += 1
      }
    }
    n
  }

  def mtime(path: String): Long = {
    val p = new Path(path)
    fs(p).getFileStatus(p).getModificationTime
  }

  def setTimes(path: String, mtimeMs: Long): Unit = {
    val p = new Path(path)
    fs(p).setTimes(p, mtimeMs, -1L)
  }

  /** directory move within one filesystem (table rename — tables are
    * relocatable: snapshots store root-relative paths)
    */
  def rename(src: String, dst: String): Boolean = {
    val s = new Path(src)
    fs(s).rename(s, new Path(dst))
  }
}

object Fs {
  /** same-JVM serialization point for atomicCreate's check-then-rename on
    * filesystems whose no-overwrite rename isn't server-side atomic
    */
  private[table] val createArbiter = new Object
}
