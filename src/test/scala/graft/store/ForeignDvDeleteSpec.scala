package graft.store

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** DELETE WHERE on a FOREIGN Delta table via real protocol deletion
  * vectors: "u"-storage container files, remove+re-add commits with
  * carried-over partitionValues/stats, the (3,7) protocol upgrade path,
  * refusal matrix, DV union across deletes, and vacuum of superseded
  * containers. */
class ForeignDvDeleteSpec extends SparkSuite {
  import spark.implicits._

  private def rm(path: String): Unit = {
    def loop(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(loop)
      f.delete(): Unit
    }
    loop(new File(path))
  }

  /** Minimal foreign table: one root parquet + v0 commit (same fixture
    * shape as ForeignDeltaWriterSpec). */
  private def foreignTable(
      root: String, df: org.apache.spark.sql.DataFrame,
      config: String = "{}",
      protocol: String = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""")
      : Unit = {
    val staging = tmpDir("fdv-stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dataName = "part-00000-foreign.snappy.parquet"
    Files.copy(part.toPath, java.nio.file.Paths.get(root, dataName)): Unit
    rm(staging)
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val meta = s"""{"metaData":{"id":"foreign-dv","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${mapper.writeValueAsString(df.schema.json)},""" +
      s""""partitionColumns":[],"configuration":$config,"createdTime":1}}"""
    val add = s"""{"add":{"path":"$dataName","partitionValues":{},""" +
      s""""size":${new File(root, dataName).length()},"modificationTime":1,"dataChange":true}}"""
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log",
      "00000000000000000000.json"),
      Seq(protocol, meta, add).mkString("\n").getBytes("UTF-8")): Unit
  }

  private def parquetFiles(root: String): Set[(String, Long)] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) {
        if (f.getName == "_delta_log") Nil else f.listFiles.toSeq.flatMap(walk)
      } else Seq(f)
    walk(new File(root)).filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getAbsolutePath, f.length)).toSet
  }

  private def dvBins(root: String): Set[String] =
    new File(root).listFiles.filter(f =>
      f.getName.startsWith("deletion_vector_") && f.getName.endsWith(".bin"))
      .map(_.getName).toSet

  test("refuses without the feature unless the upgrade is opted into") {
    val root = tmpDir("fdv-refuse")
    foreignTable(root, (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s"))
    val t = new ForeignDeltaTable(spark, root)
    val e = intercept[UnsupportedOperationException](t.deleteWhere(col("id") < 3))
    assert(e.getMessage.contains("deletionVectors"))
    assert(e.getMessage.contains("allowProtocolUpgrade"))
  }

  test("delete upgrades legacy protocol, marks rows, rewrites nothing") {
    val root = tmpDir("fdv-del")
    foreignTable(root, (0L until 100L).map(i => (i, s"r$i")).toDF("id", "s"))
    val t = new ForeignDeltaTable(spark, root)
    t.append((100L until 200L).map(i => (i, s"r$i")).toDF("id", "s")) // v1
    val before = parquetFiles(root)
    val v = t.deleteWhere(col("id") % 10 === 0, allowProtocolUpgrade = true)
    assert(v == 2L)
    // merge-on-read: parquet byte-identical, one DV container landed
    assert(parquetFiles(root) == before)
    assert(dvBins(root).size == 1)
    val got = DeltaTable.read(spark, root)
    assert(got.count() == 180)
    assert(got.filter(col("id") % 10 === 0).count() == 0)
    // protocol upgraded with complete feature lists
    val s = DeltaTable.snapshot(spark, root)
    assert(s.minReaderVersion == 3 && s.minWriterVersion == 7)
    assert(s.readerFeatures.contains("deletionVectors"))
    assert(s.writerFeatures.contains("deletionVectors"))
    assert(s.writerFeatures.contains("appendOnly")) // legacy v2 implied
    // re-added files kept their stats (numRecords physical, bounds loose)
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val adds = new String(Files.readAllBytes(java.nio.file.Paths.get(
      root, "_delta_log", "00000000000000000002.json")), "UTF-8")
      .split('\n').filter(_.contains("\"add\"")).toSeq
      .map(l => mapper.readTree(l).get("add"))
    // every file with matches was re-added (fixture file + the 4 append
    // part files — id%10 hits all of them)
    assert(adds.size == 5)
    assert(adds.forall(a => a.get("deletionVector").get("storageType").asText() == "u"))
    assert(adds.exists(_.has("stats"))) // v1's writer-computed stats carried
    // a file gaining a DV must mark its carried stats WIDE — otherwise a
    // metadata-only MIN/MAX read can answer from deleted rows' values
    val carried = adds.filter(_.has("stats"))
      .map(a => mapper.readTree(a.get("stats").asText()))
    assert(carried.nonEmpty)
    assert(carried.forall(s =>
      s.has("tightBounds") && !s.get("tightBounds").asBoolean()))
    assert(carried.forall(_.has("numRecords"))) // physical count stays
    // time travel to v1 still sees everything
    assert(DeltaTable.read(spark, root, versionAsOf = Some(1L)).count() == 200)
  }

  test("second delete unions; superseded container vacuums away") {
    val root = tmpDir("fdv-union")
    foreignTable(root, (0L until 50L).map(i => (i, i % 5)).toDF("id", "k"))
    val t = new ForeignDeltaTable(spark, root)
    t.deleteWhere(col("k") === 0, allowProtocolUpgrade = true) // v1
    val bin1 = dvBins(root)
    t.deleteWhere(col("k") === 1) // v2: feature present, no flag needed
    assert(dvBins(root).size == 2)
    val got = DeltaTable.read(spark, root)
    assert(got.count() == 30)
    assert(got.filter(col("k").isin(0, 1)).count() == 0)
    // v1's container is now referenced by nothing live → vacuum reclaims it
    val doomed = t.vacuum(retentionMs = Some(0L))
    assert(doomed.toSet == bin1)
    assert(DeltaTable.read(spark, root).count() == 30) // still intact
    // the live container survived
    assert(dvBins(root).size == 1)
  }

  test("upgrade from (2,6) keeps columnMapping/identityColumns implied") {
    val root = tmpDir("fdv-legacy26")
    // legacy reader 2 IS column mapping; legacy writer 6 implies every
    // feature through identityColumns — the (3,7) upgrade must keep
    // licensing them all or other engines reject the table afterwards
    foreignTable(root, (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s"),
      protocol = """{"protocol":{"minReaderVersion":2,"minWriterVersion":6}}""")
    val t = new ForeignDeltaTable(spark, root)
    t.deleteWhere(col("id") < 3, allowProtocolUpgrade = true)
    val s = DeltaTable.snapshot(spark, root)
    assert(s.minReaderVersion == 3 && s.minWriterVersion == 7)
    assert(Set("columnMapping", "deletionVectors").subsetOf(s.readerFeatures.toSet))
    assert(Set("appendOnly", "invariants", "checkConstraints", "changeDataFeed",
      "generatedColumns", "columnMapping", "identityColumns", "deletionVectors")
      .subsetOf(s.writerFeatures.toSet))
    assert(DeltaTable.read(spark, root).count() == 7)
  }

  test("CDF table: delete emits cdc actions whose files hold the exact rows") {
    val root = tmpDir("fdv-cdf")
    foreignTable(root, (0L until 40L).map(i => (i, s"r$i")).toDF("id", "s"),
      config = """{"delta.enableChangeDataFeed":"true"}""",
      protocol = """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""")
    val t = new ForeignDeltaTable(spark, root)
    val v = t.deleteWhere(col("id") % 8 === 0, allowProtocolUpgrade = true)
    assert(v == 1L)
    // the snapshot hides the deleted rows
    val got = DeltaTable.read(spark, root)
    assert(got.count() == 35)
    assert(got.filter(col("id") % 8 === 0).count() == 0)
    // external table_changes-style read: parse the commit's cdc actions,
    // load exactly those files — they must contain the deleted rows with
    // _change_type = "delete" and nothing else
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val actions = new String(Files.readAllBytes(java.nio.file.Paths.get(
      root, "_delta_log", "00000000000000000001.json")), "UTF-8")
      .split('\n').filter(_.nonEmpty).toSeq.map(mapper.readTree)
    val cdcs = actions.filter(_.has("cdc")).map(_.get("cdc"))
    assert(cdcs.nonEmpty, "CDF delete commit must carry cdc actions")
    assert(cdcs.forall(c => !c.get("dataChange").asBoolean()))
    assert(cdcs.forall(_.get("path").asText().startsWith("_change_data/")))
    val changeRows = cdcs.map(c => spark.read.parquet(
        new File(root, c.get("path").asText()).getAbsolutePath))
      .reduce(_.unionByName(_))
    assert(changeRows.columns.toSet == Set("id", "s", "_change_type"))
    assert(changeRows.filter(col("_change_type") =!= "delete").count() == 0)
    assert(changeRows.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 40L by 8L).toSeq)
    // a cdc-bearing commit is read from cdc actions ALONE — the re-added
    // DV'd files still carry dataChange=true add/remove, but readers must
    // not derive from them; assert both action kinds coexist
    assert(actions.exists(_.has("add")) && actions.exists(_.has("remove")))
  }

  test("delete with no matches commits nothing") {
    val root = tmpDir("fdv-noop")
    foreignTable(root, Seq((1L, "a")).toDF("id", "s"))
    val t = new ForeignDeltaTable(spark, root)
    assert(t.deleteWhere(col("id") === 99, allowProtocolUpgrade = true) == 0L)
    assert(dvBins(root).isEmpty)
  }

  test("appendOnly tables refuse DELETE") {
    val root = tmpDir("fdv-ao")
    foreignTable(root, Seq((1L, "a")).toDF("id", "s"),
      config = """{"delta.appendOnly":"true"}""")
    val t = new ForeignDeltaTable(spark, root)
    val e = intercept[UnsupportedOperationException](
      t.deleteWhere(col("id") === 1, allowProtocolUpgrade = true))
    assert(e.getMessage.contains("appendOnly"))
  }

  test("delete on partitioned appends preserves partitionValues + pruning") {
    val root = tmpDir("fdv-part")
    // partitioned fixture: hive-dir file + partitionValues (the
    // ForeignDeltaWriterSpec shape)
    val staging = tmpDir("fdv-pstage")
    (0L until 20L).toDF("id").coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    new File(root, "seg=a").mkdirs()
    Files.copy(part.toPath,
      java.nio.file.Paths.get(root, "seg=a", "part-0-foreign.parquet")): Unit
    rm(staging)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("seg", StringType)))
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val meta = s"""{"metaData":{"id":"foreign-pdv","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${mapper.writeValueAsString(schema.json)},""" +
      s""""partitionColumns":["seg"],"configuration":{},"createdTime":1}}"""
    val add = s"""{"add":{"path":"seg=a/part-0-foreign.parquet","partitionValues":{"seg":"a"},""" +
      s""""size":${new File(root, "seg=a/part-0-foreign.parquet").length()},"modificationTime":1,"dataChange":true}}"""
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json"),
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta, add)
        .mkString("\n").getBytes("UTF-8")): Unit

    val t = new ForeignDeltaTable(spark, root)
    t.append((20L until 40L).map(i => (i, "b")).toDF("id", "seg")) // v1
    t.deleteWhere(col("id") % 4 === 0, allowProtocolUpgrade = true) // v2
    val got = DeltaTable.read(spark, root)
    assert(got.count() == 30)
    assert(got.filter(col("id") % 4 === 0).count() == 0)
    // partition pruning still works: seg=b filter must not touch seg=a
    assert(got.filter(col("seg") === "b").count() == 15)
    // the re-add carried the hive partition value through
    val adds = new String(Files.readAllBytes(java.nio.file.Paths.get(
      root, "_delta_log", "00000000000000000002.json")), "UTF-8")
      .split('\n').filter(_.contains("\"add\"")).toSeq
      .map(l => mapper.readTree(l).get("add"))
    assert(adds.exists(a => a.get("partitionValues").get("seg").asText() == "a"))
    assert(adds.exists(a => a.get("partitionValues").get("seg").asText() == "b"))
  }

  test("checkpoint after a delete carries the DV descriptors through parquet") {
    val root = tmpDir("fdv-cp")
    foreignTable(root, (0L until 60L).map(i => (i, i % 6)).toDF("id", "k"))
    val t = new ForeignDeltaTable(spark, root)
    t.deleteWhere(col("k") === 0, allowProtocolUpgrade = true) // v1
    (0 until 9).foreach(i => t.append(
      Seq((1000L + i, 7L)).toDF("id", "k"))) // v2..v10 → checkpoint at 10
    assert(new File(root, "_delta_log/00000000000000000010.checkpoint.parquet").exists)
    // force checkpoint-only resolution of the DV'd add
    (0L to 5L).foreach(v =>
      new File(root, f"_delta_log/$v%020d.json").delete())
    val got = DeltaTable.read(spark, root)
    assert(got.count() == 50 + 9)
    assert(got.filter(col("k") === 0).count() == 0)
  }

  test("MERGE: one commit DVs matched keys and lands the source; CDF gets update pairs") {
    val root = tmpDir("fdv-merge")
    foreignTable(root, (0L until 40L).map(i => (i, s"r$i")).toDF("id", "s"),
      config = """{"delta.enableChangeDataFeed":"true"}""",
      protocol = """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""")
    val t = new ForeignDeltaTable(spark, root)
    val before = parquetFiles(root)
    // update ids %8 (new payload), insert 100/101
    val src = ((0L until 40L by 8L).map(i => (i, s"u$i")) ++
      Seq((100L, "n100"), (101L, "n101"))).toDF("id", "s")
    val v = t.merge(src, Seq("id"), allowProtocolUpgrade = true)
    assert(v == 1L, "merge must be ONE commit")
    // final state: whole-key replace + inserts, merge-on-read (original
    // data files untouched on disk)
    val got = DeltaTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = (0L until 40L).map(i =>
      i -> (if (i % 8 == 0) s"u$i" else s"r$i")).toMap ++
      Map(100L -> "n100", 101L -> "n101")
    assert(got == want)
    assert(before.subsetOf(parquetFiles(root)), "merge-on-read must not rewrite")
    assert(dvBins(root).size == 1)
    // cdc actions carry exact update pre/post pairs + inserts
    val ch = graft.store.DeltaTable.readChanges(spark, root, 1L, 1L)
      .select(col("id"), col("s"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val wantCh =
      (0L until 40L by 8L).flatMap(i => Seq(
        (i, s"r$i", "update_preimage"), (i, s"u$i", "update_postimage"))).toSet ++
        Set((100L, "n100", "insert"), (101L, "n101", "insert"))
    assert(ch == wantCh)
    // a second merge with NO matches is a pure insert (no new DV bin)
    val v2 = t.merge(Seq((200L, "n200")).toDF("id", "s"), Seq("id"))
    assert(v2 == 2L)
    assert(dvBins(root).size == 1)
    assert(DeltaTable.read(spark, root).count() == 43)
    // empty source: no commit
    assert(t.merge(spark.emptyDataFrame
      .withColumn("id", lit(0L)).withColumn("s", lit("x")).limit(0)
      .select(col("id"), col("s")), Seq("id")) == 2L)
  }

  test("UPDATE WHERE: matched rows DV'd + re-landed with SET applied, one commit") {
    val root = tmpDir("fdv-upd")
    foreignTable(root, (0L until 30L).map(i => (i, s"r$i")).toDF("id", "s"),
      config = """{"delta.enableChangeDataFeed":"true"}""",
      protocol = """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""")
    val t = new ForeignDeltaTable(spark, root)
    val before = parquetFiles(root)
    val v = t.updateWhere(col("id") % 5 === 0,
      Map("s" -> concat(col("s"), lit("_upd"))), allowProtocolUpgrade = true)
    assert(v == 1L, "update must be ONE commit")
    val got = DeltaTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = (0L until 30L).map(i =>
      i -> (if (i % 5 == 0) s"r${i}_upd" else s"r$i")).toMap
    assert(got == want)
    assert(before.subsetOf(parquetFiles(root)), "merge-on-read must not rewrite")
    // exact cdc update pairs
    val ch = DeltaTable.readChanges(spark, root, 1L, 1L)
      .select(col("id"), col("s"), col("_change_type"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(ch == (0L until 30L by 5L).flatMap(i => Seq(
      (i, s"r$i", "update_preimage"), (i, s"r${i}_upd", "update_postimage"))).toSet)
    // no matches: no commit; unknown SET column refuses
    assert(t.updateWhere(col("id") === 999L, Map("s" -> lit("x"))) == 1L)
    intercept[IllegalArgumentException] {
      t.updateWhere(col("id") === 1L, Map("nope" -> lit("x")))
    }
  }
}
