package graft.store

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileAlreadyExistsException, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-FileSystem file utilities for the storage layer.
  *
  * Everything the engine writes outside of Spark jobs (manifests, locks,
  * schema snapshots, logs) goes through this seam so a destination can be
  * any Hadoop-supported filesystem — local file://, HDFS, S3A, ABFS — not
  * just the driver's local disk (the reference's Destination abstraction,
  * destination/destination.py:11-53, made Spark-native: one API instead of
  * per-cloud classes). Paths stay plain strings ("s3a://bucket/dest");
  * Spark's own parquet reads/writes already handle any scheme.
  *
  * Atomicity notes: manifest publication is write-temp + rename — atomic on
  * HDFS/ABFS, best-effort on S3A (single-writer engines serialize via the
  * lock anyway); `createNew` uses create(overwrite=false), atomic on
  * HDFS/local, check-then-act on S3A. */
final class Fs(spark: SparkSession, anyPathInFs: String) {
  val fs: FileSystem =
    new Path(anyPathInFs).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(p: Path): Boolean = fs.exists(p)
  def isDir(p: Path): Boolean = fs.exists(p) && fs.getFileStatus(p).isDirectory
  def mkdirs(p: Path): Unit = fs.mkdirs(p)

  def list(p: Path): Seq[Path] =
    if (isDir(p)) fs.listStatus(p).toSeq.map(_.getPath) else Nil

  def readString(p: Path): String = {
    val in = new BufferedReader(new InputStreamReader(fs.open(p), StandardCharsets.UTF_8))
    try Iterator.continually(in.readLine()).takeWhile(_ != null).mkString("\n")
    finally in.close()
  }

  def writeString(p: Path, s: String, overwrite: Boolean = true): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Publish atomically, REPLACING any existing file: write a temp
    * sibling, then rename into place. Hadoop's FileSystem contract makes
    * rename-onto-existing return false (LocalFileSystem enforces it), so
    * replacement needs the delete-then-rename fallback — without it the
    * SECOND `_last_checkpoint` publication of a table's life (commit 20)
    * fails. The fallback's window is benign for every current caller:
    * `_last_checkpoint` is a hint file whose readers fall back to log
    * listing. Exclusive put-if-absent publication is
    * [[writeStringAtomicNew]]. */
  def writeStringAtomic(p: Path, s: String): Unit = {
    val tmp = new Path(p.getParent, s".tmp-${java.util.UUID.randomUUID()}")
    writeString(tmp, s)
    if (!fs.rename(tmp, p)) {
      fs.delete(p, false)
      if (!fs.rename(tmp, p)) {
        fs.delete(tmp, false)
        throw new java.io.IOException(s"rename $tmp -> $p failed")
      }
    }
  }

  /** Publish atomically AND exclusively — the put-if-absent primitive
    * commit protocols need: the publish itself fails when the destination
    * exists (a hard link on the local checksummed scheme, FileContext
    * rename with the default Rename.NONE elsewhere), closing the
    * exists-then-rename TOCTOU window where a second writer could
    * silently replace a committed file. Throws a FileAlreadyExists
    * exception (hadoop's or java.nio's, scheme-dependent) when the slot
    * is taken. */
  def writeStringAtomicNew(p: Path, s: String): Unit = {
    val tmp = new Path(p.getParent, s".tmp-${java.util.UUID.randomUUID()}")
    writeString(tmp, s)
    def crcOf(f: Path) = new Path(f.getParent, s".${f.getName}.crc")
    fs match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem =>
        // Local (checksummed) scheme. The put-if-absent primitive is a
        // hard LINK — atomic (link(2) EEXIST), and it touches NO sidecar,
        // so the `.crc` moves strictly AFTER the link succeeds, i.e. only
        // by the writer that OWNS the slot. This closes the r12 TOCTOU
        // two ways at once: a loser fails at the link and never touches
        // any sidecar (a racing winner's fresh crc is safe), and a stale
        // sidecar orphaned by an external raw delete cannot block a
        // legitimate re-publication (any sidecar present when our link
        // just succeeded is an orphan by definition — `p` did not exist
        // an instant ago). The previous shape (checksum-aware
        // FileContext.rename after an exists-guarded sidecar pre-delete)
        // could strip a winner's fresh crc in the guard's window, and on
        // a blocked crc rename left the data file already moved.
        val raw = c.getRawFileSystem
        def local(f: Path) = java.nio.file.Paths.get(raw.makeQualified(f).toUri)
        try java.nio.file.Files.createLink(local(p), local(tmp))
        catch { case e: Throwable => fs.delete(tmp, false); throw e }
        raw.delete(crcOf(p), false) // only ever an orphan: we own p now
        if (raw.exists(crcOf(tmp))) raw.rename(crcOf(tmp), crcOf(p)): Unit
        raw.delete(tmp, false): Unit
      case _ =>
        // non-checksummed schemes (HDFS, ABFS, …): FileContext rename with
        // the default Rename.NONE is the native put-if-absent rename
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          fs.getUri, fs.getConf)
        try fc.rename(fc.makeQualified(tmp), fc.makeQualified(p))
        catch { case e: Throwable => fs.delete(tmp, false); throw e }
    }
  }

  /** Create-if-absent; false when the file already exists. */
  def createNew(p: Path): Boolean =
    try { fs.create(p, false).close(); true }
    catch {
      case _: FileAlreadyExistsException => false
      case e: java.io.IOException if e.getMessage != null &&
        e.getMessage.contains("already exists") => false
    }

  def mtime(p: Path): Long = fs.getFileStatus(p).getModificationTime

  def delete(p: Path, recursive: Boolean = false): Boolean = fs.delete(p, recursive)

  def deleteIfExists(p: Path): Boolean =
    try fs.delete(p, false) catch { case _: java.io.FileNotFoundException => false }
}

object Fs {
  /** Databricks path fidelity (reference destination/databricks.py:6-72):
    * the POSIX fuse view `/dbfs/x` and the Hadoop scheme `dbfs:/x` name the
    * same object, and users paste either. The engine's file ops and Spark
    * jobs need the scheme form (the fuse mount only exists on the driver);
    * non-dbfs paths pass through untouched. */
  def normalize(path: String): String =
    if (path.startsWith("/dbfs/")) "dbfs:/" + path.stripPrefix("/dbfs/")
    else path
}
