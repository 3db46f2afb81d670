package graft.store

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Batch CDF read over a foreign `_delta_log` ([[DeltaTable.readChanges]]):
  * cdc-bearing commits consumed from their change files alone, non-cdc
  * commits derived from dataChange add/remove actions (removed files
  * resolved against the previous version so DVs keep hiding dead rows),
  * metadata commits neutral, log-cleaned commits loud. */
class DeltaChangesSpec extends SparkSuite {
  import spark.implicits._

  private def rm(path: String): Unit = {
    def loop(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(loop)
      f.delete(): Unit
    }
    loop(new File(path))
  }

  /** CDF-enabled foreign table built the migration way: graft v0 + CDF
    * property, graft log stripped → pure `_delta_log`. */
  private def cdfForeign(root: String, v0: org.apache.spark.sql.DataFrame): Unit = {
    val t = new VersionedTable(spark, root)
    t.append(v0) // v0
    t.setProperties(Map(VersionedTable.CdfProp -> "true")) // v1: (1,4) + delta key
    rm(s"$root/_graft_log")
  }

  test("cdc commits exact, append commits derive inserts, metadata neutral") {
    val root = tmpDir("dch-cdf")
    cdfForeign(root, (0L until 40L).map(i => (i, s"r$i")).toDF("id", "s"))
    val t = new ForeignDeltaTable(spark, root)
    t.append((40L until 60L).map(i => (i, s"r$i")).toDF("id", "s")) // v2: inserts
    t.deleteWhere(col("id") % 3 === 0, allowProtocolUpgrade = true) // v3: cdc
    val ch = DeltaTable.readChanges(spark, root, 1L, 3L)
      .select(col("id"), col("_change_type"), col("__commit_version"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val expected =
      (40L until 60L).map(i => (i, "insert", 2L)).toSet ++
        (0L until 60L by 3L).map(i => (i, "delete", 3L)).toSet
    assert(ch == expected)
    // v1 (setProperties) contributed nothing; timestamps populated
    assert(DeltaTable.readChanges(spark, root, 1L, 1L).count() == 0)
    assert(DeltaTable.readChanges(spark, root, 3L, 3L)
      .filter(col("_commit_timestamp").isNull).count() == 0)
  }

  test("non-cdc rewrite derives whole-file delete+insert; DVs stay hidden") {
    val root = tmpDir("dch-derive")
    // plain (non-CDF) table: derivation is the only path
    val t0 = new VersionedTable(spark, root)
    t0.append((0L until 30L).map(i => (i, i % 3)).toDF("id", "k")) // v0
    rm(s"$root/_graft_log")
    val t = new ForeignDeltaTable(spark, root)
    t.deleteWhere(col("k") === 0, allowProtocolUpgrade = true) // v1: DV remove+re-add
    t.overwrite((100L until 105L).map(i => (i, 9L)).toDF("id", "k")) // v2: rewrite
    // v1 has no cdc (non-CDF table): whole-file derivation — the file's
    // live rows at v0 die, its live rows at v1 (DV applied) re-insert
    val v1 = DeltaTable.readChanges(spark, root, 1L, 1L)
    assert(v1.filter(col("_change_type") === "delete").count() == 30)
    val reIns = v1.filter(col("_change_type") === "insert")
    assert(reIns.count() == 20)
    assert(reIns.filter(col("k") === 0).count() == 0) // DV'd rows stay hidden
    // v2 overwrite: deletes = the 20 rows live at v1, inserts = the new 5
    val v2 = DeltaTable.readChanges(spark, root, 2L, 2L)
    assert(v2.filter(col("_change_type") === "delete").count() == 20)
    assert(v2.filter(col("_change_type") === "insert")
      .collect().map(_.getLong(0)).sorted.toSeq == (100L until 105L).toSeq)
  }

  test("log-cleaned commit in range fails loudly") {
    val root = tmpDir("dch-clean")
    val t0 = new VersionedTable(spark, root)
    (1 to 12).foreach(i => t0.append(Seq((i.toLong, s"r$i")).toDF("id", "s")))
    rm(s"$root/_graft_log")
    // v10 checkpoint exists, so deleting an early JSON still leaves the
    // TABLE readable from checkpoint + tail — but that commit's CHANGES
    // are gone: any change range touching it must fail, whether the
    // readChanges existence guard or snapshot replay trips first
    Files.delete(java.nio.file.Paths.get(root, "_delta_log",
      "00000000000000000003.json"))
    val e = intercept[Exception](
      DeltaTable.readChanges(spark, root, 1L, 5L).count())
    assert(e.getMessage.contains("3"),
      s"failure must name the missing commit, got: ${e.getMessage}")
    // ranges the checkpoint covers still work (snapshot resolves from
    // checkpoint@10 + JSON tail; each commit appended one row)
    assert(DeltaTable.readChanges(spark, root, 11L, 11L).count() == 1)
  }

  test("mirror cdc actions of a graft CDF merge read back exactly") {
    // interop loop: graft writes a CDF merge, the MIRROR emits cdc
    // actions, the foreign batch reader consumes them — pre/post pairs
    val root = tmpDir("dch-mirror")
    val t = new VersionedTable(spark, root)
    t.append((0L until 10L).map(i => (i, i * 10)).toDF("id", "v")) // v0
    t.setProperties(Map(VersionedTable.CdfProp -> "true")) // v1
    t.merge((0L until 12L).filter(_ % 2 == 0).map(i => (i, i * 10 + 1)).toDF("id", "v"),
      Seq("id")) // v2: updates evens, inserts 10
    val ch = DeltaTable.readChanges(spark, root, 2L, 2L)
      .select(col("id"), col("v"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val expected =
      (0L until 10L by 2L).map(i => (i, i * 10, "update_preimage")).toSet ++
        (0L until 10L by 2L).map(i => (i, i * 10 + 1, "update_postimage")).toSet ++
        Set((10L, 101L, "insert"))
    assert(ch == expected)
  }
}
