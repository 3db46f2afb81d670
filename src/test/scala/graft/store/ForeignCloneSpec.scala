package graft.store

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** SHALLOW CLONE of a Delta table ([[ForeignDeltaTable.shallowClone]]):
  * a metadata-only v0 referencing the source's files by absolute URI.
  * The clone reads identically (stats, DVs — re-emitted as "p"
  * descriptors — and row-tracking identity carry), evolves independently
  * afterwards, and its vacuum can NEVER delete source data (outside-root
  * paths are untouchable). */
class ForeignCloneSpec extends SparkSuite {
  import spark.implicits._

  private def graftTable(root: String, n: Int): VersionedTable = {
    val t = new VersionedTable(spark, root)
    t.append((0 until n).map(i => (i.toLong, s"r$i")).toDF("id", "s"))
    t
  }

  test("clone reads the source state; DVs convert u -> p; then diverges") {
    val src = tmpDir("clone-src")
    graftTable(src, 50)
    // strip to a pure foreign _delta_log and DV-delete through it, so the
    // source carries a "u"-storage deletion vector at clone time
    def rm(f: File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new File(src, "_graft_log"))
    val ft = new ForeignDeltaTable(spark, src)
    ft.deleteWhere(col("id") % 5 === 0, allowProtocolUpgrade = true)
    val srcRows = DeltaTable.read(spark, src).orderBy("id")
      .collect().map(_.getLong(0)).toSeq

    val dst = tmpDir("clone-dst")
    rm(new File(dst)); // tmpDir creates it; clone wants to own the layout
    assert(ForeignDeltaTable.shallowClone(spark, src, dst) == 0L)
    // identical content, zero data files under the clone root
    assert(DeltaTable.read(spark, dst).orderBy("id")
      .collect().map(_.getLong(0)).toSeq == srcRows)
    assert(!new File(dst, "data").exists && !new File(dst, "graft_data").exists)
    // the clone's descriptors are "p" (absolute) — no "u" survives
    val v0 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dst, "_delta_log", "00000000000000000000.json")), "UTF-8")
    assert(v0.contains("\"storageType\":\"p\""))
    assert(!v0.contains("\"storageType\":\"u\""))
    // divergence: writes to one side never show on the other
    new ForeignDeltaTable(spark, dst).append(Seq((1000L, "clone-only")).toDF("id", "s"))
    ft.append(Seq((2000L, "src-only")).toDF("id", "s"))
    val cloneIds = DeltaTable.read(spark, dst).select("id").as[Long].collect().toSet
    val srcIds = DeltaTable.read(spark, src).select("id").as[Long].collect().toSet
    assert(cloneIds.contains(1000L) && !cloneIds.contains(2000L))
    assert(srcIds.contains(2000L) && !srcIds.contains(1000L))
  }

  test("clone's vacuum never deletes source data") {
    val src = tmpDir("clone-vsrc")
    graftTable(src, 10)
    def rm(f: File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new File(src, "_graft_log"))
    val dst = tmpDir("clone-vdst")
    rm(new File(dst))
    ForeignDeltaTable.shallowClone(spark, src, dst)
    val ct = new ForeignDeltaTable(spark, dst)
    // overwrite tombstones every absolute (source) add, then vacuum with
    // zero retention — the source files must survive
    ct.overwrite(Seq((1L, "fresh")).toDF("id", "s"))
    ct.vacuum(retentionMs = Some(0L))
    assert(DeltaTable.read(spark, src).count() == 10L,
      "clone vacuum reached into the source table")
    assert(DeltaTable.read(spark, dst).count() == 1L)
  }

  test("row-tracked clone keeps identity and allocates above the carried mark") {
    val src = tmpDir("clone-rtsrc")
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType)))
    new File(src, "_delta_log").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(src, "_delta_log", "00000000000000000000.json"),
      Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
          """"writerFeatures":["rowTracking","domainMetadata"]}}""",
        s"""{"metaData":{"id":"rt-clone","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":${mapper.writeValueAsString(schema.json)},""" +
          s""""partitionColumns":[],"configuration":{"delta.enableRowTracking":"true"},""" +
          s""""createdTime":1}}""").mkString("\n").getBytes("UTF-8")): Unit
    val st = new ForeignDeltaTable(spark, src)
    st.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val srcIdent = DeltaTable.read(spark, src, rowIds = true).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val dst = tmpDir("clone-rtdst")
    def rm(f: File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new File(dst))
    ForeignDeltaTable.shallowClone(spark, src, dst)
    val cloneIdent = DeltaTable.read(spark, dst, rowIds = true).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cloneIdent == srcIdent, "row identity shifted through the clone")
    // the domain's high-water mark carried: fresh clone appends go ABOVE
    new ForeignDeltaTable(spark, dst).append(Seq((3L, "c")).toDF("id", "s"))
    val after = DeltaTable.read(spark, dst, rowIds = true).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(after(3L) > srcIdent.values.max)
    // SetTransaction watermarks did NOT carry (per-destination state)
    assert(DeltaTable.latestTxnVersion(spark, dst, "app-x").isEmpty)
  }

  test("refuses when the destination is already a table") {
    val src = tmpDir("clone-esrc")
    graftTable(src, 3)
    def rm(f: File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new File(src, "_graft_log"))
    intercept[IllegalArgumentException](
      ForeignDeltaTable.shallowClone(spark, src, src))
  }
}
