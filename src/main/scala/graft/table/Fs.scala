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

  /** FileContext.getFileContext instantiates its AbstractFileSystem
    * REFLECTIVELY on every call — unlike FileSystem.get it keeps no
    * instance cache — measured at 35-50 ms per call here, which dominated
    * commit latency (a commit is 3-4 metadata renames). FileContext is
    * thread-safe for path operations (only umask/working-dir are mutable
    * state, neither is touched), so ONE instance per filesystem URI is
    * shared process-wide; a scheme with no AbstractFileSystem binding
    * caches the miss so fallback renames stop re-paying the
    * reflection+exception cost.
    */
  private def fileContext(f: FileSystem): Option[FileContext] =
    Fs.fcCache.computeIfAbsent(f.getUri.toString, _ =>
      try FileContext.getFileContext(f.getUri, conf)
      catch { case _: org.apache.hadoop.fs.UnsupportedFileSystemException => Fs.NoFc }
    ) match {
      case fc: FileContext => Some(fc)
      case _ => None
    }

  /** The LOCAL `file` scheme serves metadata ops via java.nio (the
    * per-scheme split Delta's LogStore documents): without the native
    * hadoop library, Hadoop's local create/FileContext-rename path shells
    * out for permission handling — measured 7-25 ms PER OP here vs
    * microseconds for the raw syscalls, which made commit latency
    * metadata-bound (3-4 renames per commit). Non-local schemes — hdfs,
    * s3a, and custom test schemes — keep the Hadoop FileSystem API path
    * unchanged (the `graftfs:` lifecycle spec pins that contract).
    * `null`-scheme paths resolve through the configured default
    * filesystem first so an `fs.defaultFS = hdfs://...` deployment never
    * takes the local shortcut.
    */
  private def localPath(p: Path): Option[java.nio.file.Path] = {
    val u = p.toUri
    u.getScheme match {
      case "file" => Some(java.nio.file.Paths.get(u.getPath))
      case null if fs(p).getScheme == "file" => Some(java.nio.file.Paths.get(u.getPath))
      case _ => None
    }
  }

  /** drop a pre-fast-path ChecksumFileSystem sidecar so its stale checksum
    * can never fail a later Hadoop-API read of nio-written content
    */
  private def dropCrc(lp: java.nio.file.Path): Unit = {
    val dir = lp.getParent
    if (dir != null)
      java.nio.file.Files.deleteIfExists(dir.resolve(s".${lp.getFileName}.crc"))
    ()
  }

  def exists(path: String): Boolean = {
    val p = new Path(path)
    localPath(p) match {
      case Some(lp) => java.nio.file.Files.exists(lp)
      case None     => fs(p).exists(p)
    }
  }

  def readString(path: String): String = {
    val p = new Path(path)
    localPath(p) match {
      case Some(lp) =>
        new String(java.nio.file.Files.readAllBytes(lp), StandardCharsets.UTF_8)
      case None =>
        val in = fs(p).open(p)
        try {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          new String(out.toByteArray, StandardCharsets.UTF_8)
        } finally in.close()
    }
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
    localPath(p) match {
      case Some(lp) =>
        val dir = lp.getParent
        if (dir != null) java.nio.file.Files.createDirectories(dir)
        val tmp = dir.resolve(
          s"${lp.getFileName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
        java.nio.file.Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
        // stale sidecar first: after the move, readers skip verification
        // instead of failing it
        dropCrc(lp)
        java.nio.file.Files.move(tmp, lp,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        return
      case None => ()
    }
    val f = fs(p)
    f.mkdirs(p.getParent)
    val tmp = tmpFor(p)
    val out = f.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    fileContext(f) match {
      case Some(fc) => fc.rename(tmp, p, Options.Rename.OVERWRITE)
      case None =>
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
    localPath(p) match {
      case Some(lp) =>
        if (java.nio.file.Files.exists(lp)) return false
        val dir = lp.getParent
        if (dir != null) java.nio.file.Files.createDirectories(dir)
        val tmp = dir.resolve(
          s"${lp.getFileName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
        java.nio.file.Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
        // hard-link publish: POSIX link(2) fails EEXIST atomically, so of N
        // racing writers exactly one creates `lp` — and the full content is
        // visible the instant the name is (no torn reads). This is atomic
        // SERVER-side (kernel), unlike the FileContext check-then-rename
        // the non-local fallback uses.
        try {
          java.nio.file.Files.createLink(lp, tmp)
          dropCrc(lp)
          return true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => return false
        } finally java.nio.file.Files.deleteIfExists(tmp)
      case None => ()
    }
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
      fileContext(f) match {
        case Some(fc) =>
          try { fc.rename(tmp, p, Options.Rename.NONE); true }
          catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
              f.delete(tmp, false); false
          }
        case None =>
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

  /** FileContext instances (or the no-binding marker) per filesystem URI */
  private val fcCache = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]
  private object NoFc
}
