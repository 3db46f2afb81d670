package graft.store

import java.io.File

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Writer-side deletion vectors: roaring encode round-trips, the DV
  * container file layout, DELETE WHERE / DV-mode merge on the versioned
  * store (merge-on-read), and the Delta-log mirror's descriptor + protocol
  * propagation (an external Delta reader of the mirror must see live rows
  * only). Complements `DeletionVectorSpec`, which proves the READ side
  * against an independently-written test encoder. */
class StoreDvSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------------- encoding

  test("encode/decode round-trip: array, bitmap, multi-high-key, fuzz") {
    def rt(xs: Seq[Long]): Unit = {
      val arr = xs.toArray
      assert(DeletionVectors.decode(DeletionVectors.encode(arr)).toSeq == xs)
    }
    rt(Seq(0L))
    rt(Seq(1L, 3L, 65543L)) // array containers across two 16-bit keys
    rt((0 until 5000).map(_.toLong * 2)) // bitmap container (>4096 per key)
    rt(Seq(5L, (1L << 32) + 9L)) // dense high keys with an empty bitmap between? no: keys 0 and 1
    rt(Seq((2L << 32) + 1L)) // leading EMPTY high-key bitmaps 0 and 1
    val rnd = new scala.util.Random(42)
    val fuzz = Seq.fill(20000)(rnd.nextLong(1L << 40)).distinct.sorted
    rt(fuzz)
  }

  test("encode refuses unsorted / duplicate / negative input") {
    intercept[IllegalArgumentException](DeletionVectors.encode(Array(3L, 1L)))
    intercept[IllegalArgumentException](DeletionVectors.encode(Array(1L, 1L)))
    intercept[IllegalArgumentException](DeletionVectors.encode(Array.emptyLongArray))
  }

  test("union merges sorted distinct arrays") {
    assert(DeletionVectors.union(Array(1L, 5L, 9L), Array(2L, 5L, 10L)).toSeq ==
      Seq(1L, 2L, 5L, 9L, 10L))
    assert(DeletionVectors.union(Array.emptyLongArray, Array(7L)).toSeq == Seq(7L))
  }

  test("writeBin/loadBin: multiple DVs per container file, CRC verified") {
    val dir = tmpDir("dvbin")
    val fs = new Fs(spark, dir).fs
    val a = DeletionVectors.encode(Array(1L, 2L, 3L))
    val b = DeletionVectors.encode((0 until 6000).map(_.toLong).toArray)
    val p = new HPath(dir, "t.bin")
    val offs = DeletionVectors.writeBin(fs, p, Seq(a, b))
    assert(offs.size == 2 && offs.head._1 == 1) // after the 1-byte version
    assert(DeletionVectors.loadBin(fs, p, offs(0)._1, offs(0)._2, 3L).toSeq ==
      Seq(1L, 2L, 3L))
    assert(DeletionVectors.loadBin(fs, p, offs(1)._1, offs(1)._2, 6000L).length == 6000)
    // wrong cardinality is refused loudly
    intercept[IllegalArgumentException](
      DeletionVectors.loadBin(fs, p, offs(0)._1, offs(0)._2, 4L))
  }

  // --------------------------------------------------------------- helpers

  private def dataFiles(path: String): Set[(String, Long)] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
    val d = new File(path, "data")
    if (!d.exists) Set.empty
    else walk(d).filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getAbsolutePath.stripPrefix(path), f.length)).toSet
  }

  private def dvBins(path: String): Set[String] = {
    val d = new File(path, "deletion_vectors")
    if (!d.exists) Set.empty
    else d.listFiles.map(_.getName).filterNot(_.startsWith(".")).toSet
  }

  private def freshTable(path: String): VersionedTable = {
    val t = new VersionedTable(spark, path)
    t.append(spark.range(0, 100).select(col("id"), (col("id") % 10).as("k"),
      concat(lit("v"), col("id")).as("s")))
    t.append(spark.range(100, 200).select(col("id"), (col("id") % 10).as("k"),
      concat(lit("v"), col("id")).as("s")))
    t
  }

  // ---------------------------------------------------------- delete where

  test("delete marks rows without rewriting any data file; time travel intact") {
    val path = tmpDir("dvdel")
    val t = freshTable(path)
    val before = dataFiles(path)
    val v = t.delete(col("k") === 3)
    assert(v == 2L)
    // merge-on-read: the data file set is byte-identical, only bitmaps landed
    assert(dataFiles(path) == before)
    assert(dvBins(path).nonEmpty)
    assert(t.read().count() == 180)
    assert(t.read().filter(col("k") === 3).count() == 0)
    // remaining rows untouched
    assert(t.read().filter(col("k") === 4).count() == 20)
    // pre-delete version still shows everything
    assert(t.readVersion(1).count() == 200)
    // history reports LIVE rows for the delete commit
    val h = t.history().filter(col("version") === 2).head()
    assert(h.getLong(h.fieldIndex("num_rows")) == 180)
  }

  test("delete with no matches is a no-op commit-wise") {
    val path = tmpDir("dvnoop")
    val t = freshTable(path)
    assert(t.delete(col("k") === 99) == 1L)
    assert(t.latestVersion.contains(1L))
  }

  test("successive deletes union into the per-file bitmaps") {
    val path = tmpDir("dvunion")
    val t = freshTable(path)
    t.delete(col("k") === 1)
    t.delete(col("k") === 2)
    assert(t.read().count() == 160)
    assert(t.read().filter(col("k").isin(1, 2)).count() == 0)
    // intermediate version sees only the first delete
    assert(t.readVersion(2).count() == 180)
    // a third delete overlapping nothing new still works on DV'd dirs
    t.delete(col("id") === 55) // k=5, undeleted so far
    assert(t.read().count() == 159)
  }

  test("delete emits CDF delete rows when the table property is set") {
    val path = tmpDir("dvcdf")
    val t = new VersionedTable(spark, path)
    t.append(spark.range(0, 50).select(col("id"), (col("id") % 5).as("k")))
    t.setProperties(Map(VersionedTable.CdfProp -> "true"))
    val v = t.delete(col("k") === 0)
    val feed = t.readChangeFeed(v, v)
    assert(feed.filter(col(VersionedTable.ChangeTypeCol) === "delete").count() == 10)
    assert(feed.count() == 10)
  }

  test("restore resurrects DV-deleted rows; vacuum sweeps dead DV bins") {
    val path = tmpDir("dvrestore")
    val t = freshTable(path)
    t.delete(col("k") === 7) // v2
    assert(t.read().count() == 180)
    t.restore(1L) // v3: back to pre-delete
    assert(t.read().count() == 200)
    // optimize rewrites clean (no DVs), then vacuum(1) drops the dv bin
    t.delete(col("k") === 7) // v4
    t.optimize() // v5: physical rewrite, DVs dissolved
    assert(t.read().count() == 180)
    assert(dvBins(path).nonEmpty)
    t.vacuum(keepVersions = 1)
    assert(dvBins(path).isEmpty)
    assert(t.read().count() == 180)
  }

  test("orphan DV container (crash between bin write and commit) vacuums away") {
    val path = tmpDir("dvorphan")
    val t = freshTable(path)
    t.delete(col("k") === 5)
    // simulate a writer that died after writing its container but before
    // publishing the manifest: an unreferenced .bin appears on disk
    val fs = new Fs(spark, path).fs
    DeletionVectors.writeBin(fs,
      new HPath(s"$path/deletion_vectors/v0000000099-orphan.bin"),
      Seq(DeletionVectors.encode(Array(1L, 2L))))
    assert(dvBins(path).size == 2)
    t.vacuum(keepVersions = 10) // keeps every real version
    // the orphan is referenced by no manifest → swept; the live DV stays
    assert(dvBins(path).size == 1)
    assert(t.read().count() == 180)
  }

  // ------------------------------------------------------------- merge MoR

  test("DV-mode merge matches copy-on-write merge exactly, without rewrites") {
    val src = spark.range(150, 260).select(col("id"), (col("id") % 10).as("k"),
      concat(lit("UPD"), col("id")).as("s"))
    val pCow = tmpDir("mcow"); val pDv = tmpDir("mdv")
    val cow = freshTable(pCow); val dv = freshTable(pDv)
    cow.merge(src, Seq("id"))
    val filesBefore = dataFiles(pDv)
    dv.merge(src, Seq("id"), useDeletionVectors = true)
    // no pre-existing file rewritten; exactly one new dir of source rows
    val newFiles = dataFiles(pDv) -- filesBefore
    assert(filesBefore.subsetOf(dataFiles(pDv)))
    assert(newFiles.nonEmpty)
    // logical content identical to the copy-on-write result
    val a = cow.read().orderBy("id").collect().toSeq
    val b = dv.read().orderBy("id").collect().toSeq
    assert(a == b)
    assert(dv.read().count() == 260)
    assert(dv.read().filter(col("s").startsWith("UPD")).count() == 110)
  }

  // ------------------------------------------------------------ the mirror

  test("delta-log mirror: external reader sees live rows; protocol upgraded") {
    val path = tmpDir("dvmirror")
    val t = freshTable(path)
    t.delete(col("k") === 9)
    // the mirrored _delta_log must resolve through the DV descriptors
    val ext = DeltaTable.read(spark, path)
    assert(ext.count() == 180)
    assert(ext.filter(col("k") === 9).count() == 0)
    assert(ext.orderBy("id").collect().toSeq ==
      t.read().orderBy("id").collect().toSeq)
    // protocol upgrade action landed exactly once with the feature listed
    val log = new File(path, "_delta_log").listFiles
      .filter(_.getName.endsWith(".json")).sortBy(_.getName)
      .flatMap(f => scala.io.Source.fromFile(f).getLines())
    val protos = log.filter(_.contains("\"protocol\""))
    assert(protos.exists(_.contains("deletionVectors")))
    // a second delete re-adds files with new descriptors, still readable
    t.delete(col("k") === 8)
    assert(DeltaTable.read(spark, path).count() == 160)
    assert(log.size > 0)
  }

  test("mirror checkpoint carries DV descriptors (reader resolves from it)") {
    val path = tmpDir("dvcp")
    val t = new VersionedTable(spark, path)
    t.append(spark.range(0, 40).select(col("id"), (col("id") % 4).as("k")))
    t.delete(col("k") === 0) // v1
    // push past the checkpoint cadence (checkpoint at v10)
    (0 until 9).foreach(i => t.append(
      spark.range(100 + i * 10, 110 + i * 10).select(col("id"), (col("id") % 4).as("k"))))
    assert(t.latestVersion.contains(10L))
    assert(new File(path, "_delta_log/00000000000000000010.checkpoint.parquet").exists)
    // drop the pre-checkpoint JSON so the reader MUST start from the
    // checkpoint — DV descriptors have to survive the parquet round-trip
    (0L to 5L).foreach { v =>
      new File(path, f"_delta_log/$v%020d.json").delete()
    }
    val ext = DeltaTable.read(spark, path)
    assert(ext.count() == t.read().count())
    assert(ext.filter(col("k") === 0 && col("id") < 40).count() == 0)
  }
}
