package graft.store

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** External Delta WRITE path ([[ForeignDeltaTable]]): continue a table
  * some other Delta writer created — append/overwrite commit real
  * `_delta_log` JSON (add actions with per-file stats), unsupported
  * features refuse loudly, and a full SCD2 sync continues a stripped
  * (mirror-log-only) destination in place. "Another Delta client reads it
  * back" is exercised through [[DeltaTable]], the protocol-faithful
  * reader spec'd against hand-crafted fixtures in DeltaReaderSpec (no
  * Delta jar exists in this environment). */
class ForeignDeltaWriterSpec extends SparkSuite {
  import spark.implicits._

  private def rm(path: String): Unit = {
    def loop(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(loop)
      f.delete(): Unit
    }
    loop(new File(path))
  }

  /** Fabricate a minimal foreign Delta table the way delta-spark lays one
    * out: one parquet part file at the root + a v0 commit with
    * protocol (1,2), metaData, and the add action. */
  private def foreignTable(
      root: String, df: org.apache.spark.sql.DataFrame,
      partCols: Seq[String] = Nil, config: String = "{}",
      protocol: String = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      schemaOverride: Option[StructType] = None): Unit = {
    val staging = tmpDir("fdw-stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dataName = "part-00000-foreign.snappy.parquet"
    Files.copy(part.toPath, java.nio.file.Paths.get(root, dataName)): Unit
    rm(staging)
    val schema = schemaOverride.getOrElse(df.schema)
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val pc = partCols.map(c => s""""$c"""").mkString(",")
    val meta = s"""{"metaData":{"id":"foreign-1","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${mapper.writeValueAsString(schema.json)},""" +
      s""""partitionColumns":[$pc],"configuration":$config,"createdTime":1}}"""
    val add = s"""{"add":{"path":"$dataName","partitionValues":{},""" +
      s""""size":${new File(root, dataName).length()},"modificationTime":1,"dataChange":true}}"""
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log",
      "00000000000000000000.json"),
      Seq(protocol, meta, add).mkString("\n").getBytes("UTF-8")): Unit
  }

  test("append commits a real Delta JSON entry with per-file stats") {
    val root = tmpDir("fdw-append")
    foreignTable(root, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val t = new ForeignDeltaTable(spark, root)
    assert(t.exists)
    val v = t.append(Seq((3L, "c"), (4L, null.asInstanceOf[String])).toDF("id", "s"))
    assert(v == 1L)
    // a Delta client sees the combined table
    val got = DeltaTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, null)))
    // the commit carries per-file add stats a reader can skip on (the
    // write may split into several part files — aggregate across adds)
    val commit = new String(Files.readAllBytes(
      java.nio.file.Paths.get(root, "_delta_log", "00000000000000000001.json")), "UTF-8")
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val statNodes = commit.split('\n').filter(_.contains("\"add\"")).toSeq
      .map(l => mapper.readTree(mapper.readTree(l).get("add").get("stats").asText()))
    assert(statNodes.nonEmpty)
    assert(statNodes.map(_.get("numRecords").asLong()).sum == 2L)
    assert(statNodes.map(_.get("minValues").get("id").asLong()).min == 3L)
    assert(statNodes.map(_.get("maxValues").get("id").asLong()).max == 4L)
    assert(statNodes.map(_.get("nullCount").get("s").asLong()).sum == 1L)
    // readCommit returns ONLY the appended rows
    assert(t.readCommit(1L).collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    // and stats-based skipping works through the graft reader too
    assert(t.readWhere(col("id") >= 3L).collect().length == 2)
  }

  test("overwrite removes the foreign files; schema drift emits metaData") {
    val root = tmpDir("fdw-ow")
    foreignTable(root, Seq((1L, "a")).toDF("id", "s"))
    val t = new ForeignDeltaTable(spark, root)
    // drift append: new column widens the schema for every reader
    t.append(Seq((2L, "b", 9L)).toDF("id", "s", "extra"))
    val drifted = DeltaTable.read(spark, root)
    assert(drifted.schema.fieldNames.toSeq == Seq("id", "s", "extra"))
    assert(drifted.filter(col("id") === 1L).head().isNullAt(2))
    // overwrite replaces content entirely
    t.overwrite(Seq((7L, "z")).toDF("id", "s"))
    val after = DeltaTable.read(spark, root).collect()
    assert(after.map(_.getLong(0)).toSeq == Seq(7L))
    assert(DeltaTable.snapshot(spark, root).numFiles == 1)
    // time travel still reaches the foreign v0
    assert(DeltaTable.read(spark, root, versionAsOf = Some(0L))
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("unsupported tables refuse loudly; appendOnly allows append only") {
    val df = Seq((1L, "a")).toDF("id", "s")
    // partitioned
    val p1 = tmpDir("fdw-part")
    foreignTable(p1, df, partCols = Seq("s"))
    intercept[UnsupportedOperationException] {
      new ForeignDeltaTable(spark, p1).append(df)
    }
    // column mapping
    val p2 = tmpDir("fdw-cm")
    foreignTable(p2, df, config = """{"delta.columnMapping.mode":"name"}""")
    intercept[UnsupportedOperationException] {
      new ForeignDeltaTable(spark, p2).append(df)
    }
    // CDF
    val p3 = tmpDir("fdw-cdf")
    foreignTable(p3, df, config = """{"delta.enableChangeDataFeed":"true"}""")
    intercept[UnsupportedOperationException] {
      new ForeignDeltaTable(spark, p3).append(df)
    }
    // writer protocol 7 with a non-benign feature
    val p4 = tmpDir("fdw-feat")
    foreignTable(p4, df, protocol = """{"protocol":{"minReaderVersion":1,""" +
      """"minWriterVersion":7,"writerFeatures":["rowTracking"]}}""")
    intercept[UnsupportedOperationException] {
      new ForeignDeltaTable(spark, p4).append(df)
    }
    // appendOnly: append fine, overwrite refused
    val p5 = tmpDir("fdw-ao")
    foreignTable(p5, df, config = """{"delta.appendOnly":"true"}""")
    val t5 = new ForeignDeltaTable(spark, p5)
    t5.append(Seq((2L, "b")).toDF("id", "s"))
    assert(DeltaTable.read(spark, p5).count() == 2)
    intercept[UnsupportedOperationException] { t5.overwrite(df) }
    // sequential writers always claim the NEXT slot (put-if-absent rename;
    // the losing side of a true race throws ConcurrentModificationException
    // at the rename — the atomic-new primitive is spec'd in
    // ConcurrentCommitSpec): a version written behind our back is observed,
    // never clobbered
    val p6 = tmpDir("fdw-race")
    foreignTable(p6, df)
    Files.write(java.nio.file.Paths.get(p6, "_delta_log",
      "00000000000000000001.json"), "{}".getBytes("UTF-8")): Unit
    val t6 = new ForeignDeltaTable(spark, p6)
    assert(t6.append(Seq((9L, "x")).toDF("id", "s")) == 2L)
    assert(new File(p6, "_delta_log/00000000000000000002.json").exists())
  }

  test("Graft.sync continues a foreign (mirror-log-only) destination in place") {
    import graft.{Graft, WriteConfig, SystemCols}
    val root = tmpDir("fdw-sync")
    val cfg = WriteConfig(deltaCol = Some("modified"))
    def src(rows: (Long, String, Long)*) =
      new graft.sources.DataFrameSource(
        rows.toSeq.toDF("id", "name", "modified"), pks = Seq("id"))
    // a graft deployment writes the dest; its mirror _delta_log IS what a
    // reference (delta-spark/delta-rs) deployment's dest/delta looks like
    Graft.sync(spark, src((1L, "ann", 10L), (2L, "bob", 10L)), root, cfg)
    // STRIP to a pure Delta table: no _graft_log, no aux tables, no meta
    rm(s"$root/delta/_graft_log")
    rm(s"$root/delta_load"); rm(s"$root/meta"); rm(s"$root/log")
    assert(!new File(s"$root/delta/_graft_log").exists())
    assert(DeltaTable.isDeltaTable(spark, s"$root/delta"))
    val before = DeltaTable.snapshot(spark, s"$root/delta").version

    // continue syncing: update bob, insert cara
    val w = Graft.writer(spark,
      src((1L, "ann", 10L), (2L, "bob2", 20L), (3L, "cara", 20L)), root, cfg)
    assert(w.dest.delta.isInstanceOf[ForeignDeltaTable])
    w.execute()

    // the combined history reads back through the plain Delta log;
    // current state = latest row per key that is not a tombstone
    def currentState() = DeltaTable.read(spark, s"$root/delta")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col(SystemCols.timestamp).desc)))
      .filter(col("__rn") === 1 && !col(SystemCols.isDeleted))
    val hist = DeltaTable.read(spark, s"$root/delta")
    val cur = currentState()
      .select("id", "name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cur == Map(1L -> "ann", 2L -> "bob2", 3L -> "cara"))
    // history kept the pre-migration rows AND the log stayed contiguous
    assert(hist.filter(col("name") === "bob").count() == 1)
    val after = DeltaTable.snapshot(spark, s"$root/delta").version
    assert(after > before)
    (0L to after).foreach { v =>
      assert(new File(f"$root/delta/_delta_log/$v%020d.json").exists() ||
        new File(f"$root/delta/_delta_log/$v%020d.checkpoint.parquet").exists(),
        s"missing log entry for version $v")
    }
    // a second continued run keeps working (delete cara → tombstone)
    val r2 = Graft.writer(spark,
      src((1L, "ann", 10L), (2L, "bob2", 20L)), root, cfg).execute()
    assert(r2 == graft.LoadResult.DeltaLoad(0L, 0L, 1L, dirty = false))
    val cur2 = currentState().select("id").collect().map(_.getLong(0)).toSet
    assert(cur2 == Set(1L, 2L))
  }
}
