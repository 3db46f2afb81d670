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
      schemaOverride: Option[StructType] = None,
      commitInfo: Option[String] = None): Unit = {
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
      (commitInfo.toSeq ++ Seq(protocol, meta, add))
        .mkString("\n").getBytes("UTF-8")): Unit
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

  test("in-commit timestamps: active feature honored with a monotonic clock") {
    val df = Seq((1L, "a")).toDF("id", "s")
    val root = tmpDir("fdw-ict")
    // ICT-active fixture whose v0 carries a FUTURE in-commit timestamp —
    // the next commit must emit prev+1 (monotonic), not the wall clock
    val future = System.currentTimeMillis() + 10000000000L
    foreignTable(root, df,
      config = """{"delta.enableInCommitTimestamps":"true"}""",
      protocol = """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["inCommitTimestamp"],"writerFeatures":["inCommitTimestamp"]}}""",
      commitInfo = Some(s"""{"commitInfo":{"timestamp":1,"inCommitTimestamp":$future}}"""))
    val t = new ForeignDeltaTable(spark, root)
    t.append(Seq((2L, "b")).toDF("id", "s")) // v1
    t.append(Seq((3L, "c")).toDF("id", "s")) // v2
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    def ictOf(v: Long): Long = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_delta_log", f"$v%020d.json")), "UTF-8")
      .split('\n').filter(_.nonEmpty).map(mapper.readTree)
      .find(_.has("commitInfo")).get.get("commitInfo")
      .get("inCommitTimestamp").asLong()
    assert(ictOf(1) == future + 1)
    assert(ictOf(2) == future + 2)
    // timestamp time travel over the combined log rides the ICT clock
    assert(DeltaTable.read(spark, root,
      timestampAsOf = Some(future + 1)).count() == 2)
    assert(DeltaTable.read(spark, root,
      timestampAsOf = Some(future + 2)).count() == 3)
  }

  test("row tracking honored: fresh disjoint id ranges, DV re-add carries, checkpoint keeps the mark") {
    val root = tmpDir("fdw-rt")
    // hand-build an rt-active fixture: v0 add owns row ids [0,0], the
    // delta.rowTracking domain records high-water mark 0
    val stage = tmpDir("fdw-rt-stage")
    Seq((1L, "a")).toDF("id", "s").coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, java.nio.file.Paths.get(root, "part-0-rt.parquet")): Unit
    rm(stage)
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val schemaJ = mapper.writeValueAsString(
      Seq((1L, "a")).toDF("id", "s").schema.json)
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json"),
      Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["rowTracking","domainMetadata"]}}""",
        s"""{"metaData":{"id":"rt-1","format":{"provider":"parquet","options":{}},"schemaString":$schemaJ,"partitionColumns":[],"configuration":{"delta.enableRowTracking":"true"},"createdTime":1}}""",
        s"""{"add":{"path":"part-0-rt.parquet","partitionValues":{},"size":${new File(root, "part-0-rt.parquet").length()},"modificationTime":1,"dataChange":true,"baseRowId":0,"defaultRowCommitVersion":0}}""",
        """{"domainMetadata":{"domain":"delta.rowTracking","configuration":"{\"rowIdHighWaterMark\":0}","removed":false}}""")
        .mkString("\n").getBytes("UTF-8")): Unit

    val t = new ForeignDeltaTable(spark, root)
    t.append((2L until 5L).map(i => (i, s"r$i")).toDF("id", "s")) // v1: 3 rows
    def addsOf(v: Long) = new String(Files.readAllBytes(java.nio.file.Paths.get(
      root, "_delta_log", f"$v%020d.json")), "UTF-8")
      .split('\n').filter(_.nonEmpty).map(mapper.readTree)
    val v1 = addsOf(1)
    val v1Adds = v1.filter(_.has("add")).map(_.get("add"))
    // fresh files take DISJOINT ranges above the water mark, covering
    // exactly [1, 3]; every add stamps this commit's version
    val ranges = v1Adds.map { a =>
      val base = a.get("baseRowId").asLong()
      val n = mapper.readTree(a.get("stats").asText()).get("numRecords").asLong()
      assert(a.get("defaultRowCommitVersion").asLong() == 1L)
      (base, base + n - 1)
    }.sortBy(_._1)
    assert(ranges.head._1 == 1L)
    assert(ranges.last._2 == 3L)
    ranges.sliding(2).foreach {
      case Array((_, e), (b, _)) => assert(b == e + 1, "ranges must tile")
      case _ => ()
    }
    val dm1 = v1.find(_.has("domainMetadata")).get.get("domainMetadata")
    assert(dm1.get("domain").asText() == "delta.rowTracking")
    assert(mapper.readTree(dm1.get("configuration").asText())
      .get("rowIdHighWaterMark").asLong() == 3L)
    // DV delete re-adds carry the row-tracking fields verbatim
    t.deleteWhere(col("id") === 1L, allowProtocolUpgrade = true) // v2
    val readd = addsOf(2).filter(_.has("add")).map(_.get("add"))
      .find(_.get("path").asText() == "part-0-rt.parquet").get
    assert(readd.get("baseRowId").asLong() == 0L)
    assert(readd.get("defaultRowCommitVersion").asLong() == 0L)
    // (OPTIMIZE on rt tables materializes ids — ForeignOptimizeSpec)
    // checkpoint at v10 keeps the domain + per-add ids; later appends
    // continue ABOVE the mark even when early JSONs are gone
    (3 to 10).foreach(i => t.append(Seq((100L + i, "x")).toDF("id", "s"))) // ...v10
    assert(new File(root, "_delta_log/00000000000000000010.checkpoint.parquet").exists)
    (0L to 5L).foreach(v =>
      new File(root, f"_delta_log/$v%020d.json").delete())
    val hwmAfter = {
      val s = DeltaTable.snapshot(spark, root)
      mapper.readTree(s.domainMetadata("delta.rowTracking"))
        .get("rowIdHighWaterMark").asLong()
    }
    t.append(Seq((999L, "z")).toDF("id", "s")) // v11, resolved via checkpoint
    val v11Add = addsOf(11).filter(_.has("add")).map(_.get("add")).head
    assert(v11Add.get("baseRowId").asLong() == hwmAfter + 1)
    // the checkpointed snapshot still exposes every add's row ids
    val snap = DeltaTable.snapshot(spark, root)
    assert(snap.adds.forall(_.baseRowId.isDefined))
  }

  test("appendIdempotent: txn watermark makes replays no-ops and survives checkpoints") {
    val root = tmpDir("fdw-txn")
    val df = Seq((1L, "a")).toDF("id", "s")
    foreignTable(root, df) // v0, one row
    val t = new ForeignDeltaTable(spark, root)
    val v1 = t.appendIdempotent(Seq((2L, "b")).toDF("id", "s"), "streamA", 7L)
    assert(v1 == 1L)
    assert(DeltaTable.latestTxnVersion(spark, root, "streamA").contains(7L))
    assert(DeltaTable.latestTxnVersion(spark, root, "other").isEmpty)
    // the txn action is IN the commit, after commitInfo
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val v1Lines = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      root, "_delta_log", f"${1L}%020d.json")), "UTF-8")
      .split('\n').filter(_.nonEmpty).map(mapper.readTree)
    assert(v1Lines.head.has("commitInfo"))
    val tx = v1Lines.find(_.has("txn")).get.get("txn")
    assert(tx.get("appId").asText() == "streamA" && tx.get("version").asLong() == 7L)
    // replay of the same batch (and anything older): NO-OP, no new version
    assert(t.appendIdempotent(Seq((2L, "b")).toDF("id", "s"), "streamA", 7L) == 1L)
    assert(t.appendIdempotent(Seq((9L, "x")).toDF("id", "s"), "streamA", 3L) == 1L)
    assert(DeltaTable.read(spark, root).count() == 2L)
    // the next batch applies; independent appIds don't interfere
    assert(t.appendIdempotent(Seq((3L, "c")).toDF("id", "s"), "streamA", 8L) == 2L)
    assert(t.appendIdempotent(Seq((4L, "d")).toDF("id", "s"), "streamB", 1L) == 3L)
    assert(DeltaTable.latestTxnVersion(spark, root, "streamA").contains(8L))
    assert(DeltaTable.latestTxnVersion(spark, root, "streamB").contains(1L))
    // checkpoint at v10, drop the early JSONs: watermarks must survive
    (4 to 10).foreach(i => t.append(Seq((100L + i, "z")).toDF("id", "s")))
    assert(new File(root, "_delta_log/00000000000000000010.checkpoint.parquet").exists)
    (0L to 5L).foreach(v => new File(root, f"_delta_log/$v%020d.json").delete())
    assert(DeltaTable.latestTxnVersion(spark, root, "streamA").contains(8L))
    assert(DeltaTable.latestTxnVersion(spark, root, "streamB").contains(1L))
    assert(t.appendIdempotent(Seq((9L, "x")).toDF("id", "s"), "streamA", 8L)
      == 10L) // still a no-op, resolved via the checkpoint
    assert(DeltaTable.read(spark, root).count() == 11L)
  }

  test("delta.checkpointInterval: the owner's cadence is honored (foreign writes)") {
    val root = tmpDir("fdw-cpint")
    foreignTable(root, Seq((0L, "seed")).toDF("id", "s"),
      config = """{"delta.checkpointInterval": "2"}""")
    val t = new ForeignDeltaTable(spark, root)
    (1 to 5).foreach(i => t.append(Seq((i.toLong, "x")).toDF("id", "s")))
    def cp(v: Long) = new File(root, f"_delta_log/$v%020d.checkpoint.parquet")
    assert(cp(2).exists && cp(4).exists, "cadence-2 checkpoints at v2/v4")
    assert(!cp(1).exists && !cp(3).exists && !cp(5).exists)
    // the checkpoint is a usable snapshot: drop the JSONs below it
    (0L to 3L).foreach(v => new File(root, f"_delta_log/$v%020d.json").delete())
    assert(DeltaTable.read(spark, root).count() == 6L)
  }

  test("checkpointPolicy v2: the 10th commit writes a v2 manifest + sidecar, not classic") {
    val root = tmpDir("fdw-v2cp")
    val df = Seq((0L, "seed")).toDF("id", "s")
    foreignTable(root, df, protocol = """{"protocol":{"minReaderVersion":3,""" +
      """"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],""" +
      """"writerFeatures":["v2Checkpoint"]}}""",
      config = """{"delta.checkpointPolicy":"v2"}""")
    val t = new ForeignDeltaTable(spark, root)
    (1 to 10).foreach(i => t.append(Seq((i.toLong, s"r$i")).toDF("id", "s")))
    val logFiles = new File(root, "_delta_log").listFiles().map(_.getName)
    // the policy forbids the classic single-file form; the v2 manifest +
    // exactly one sidecar must be there instead
    assert(!logFiles.contains("00000000000000000010.checkpoint.parquet"))
    assert(logFiles.exists(n => n.startsWith("00000000000000000010.checkpoint.")
      && n.endsWith(".parquet")))
    val sidecars = new File(root, "_delta_log/_sidecars").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(sidecars.length == 1)
    // state resolves from the v2 checkpoint ALONE once early JSONs are gone
    (0L to 5L).foreach(v => new File(root, f"_delta_log/$v%020d.json").delete())
    assert(DeltaTable.read(spark, root).select("id").as[Long].collect().sorted.toSeq
      == (0L to 10L))
    // and the table keeps accepting commits on top of it
    t.append(Seq((99L, "z")).toDF("id", "s"))
    assert(DeltaTable.read(spark, root).count() == 12L)
  }

  test("data-skipping config bounds the stats pass (numIndexedCols / statsColumns)") {
    val df = Seq((1L, "a", 10)).toDF("id", "s", "q")
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    def statsOfAppend(root: String): com.fasterxml.jackson.databind.JsonNode = {
      val t = new ForeignDeltaTable(spark, root)
      t.append(Seq((2L, "b", 20)).toDF("id", "s", "q"))
      val commit = new String(Files.readAllBytes(java.nio.file.Paths.get(
        root, "_delta_log", "00000000000000000001.json")), "UTF-8")
      val add = commit.split('\n').filter(_.contains("\"add\"")).head
      mapper.readTree(mapper.readTree(add).get("add").get("stats").asText())
    }
    // first-N rule: only `id` (schema column 1) gets min/max/nullCount
    val p1 = tmpDir("fdw-skipn")
    foreignTable(p1, df, config = """{"delta.dataSkippingNumIndexedCols":"1"}""")
    val s1 = statsOfAppend(p1)
    assert(s1.get("numRecords").asLong() == 1L)
    assert(s1.get("minValues").has("id") && !s1.get("minValues").has("s") &&
      !s1.get("minValues").has("q"))
    assert(!s1.get("nullCount").has("s"))
    // explicit list OUTRANKS the count: only `q` gets stats
    val p2 = tmpDir("fdw-skipc")
    foreignTable(p2, df, config = """{"delta.dataSkippingStatsColumns":"q",""" +
      """"delta.dataSkippingNumIndexedCols":"1"}""")
    val s2 = statsOfAppend(p2)
    assert(s2.get("minValues").has("q") && !s2.get("minValues").has("id"))
  }

  test("delta.checkpoint.partSize: the checkpoint splits into protocol multi-part files") {
    val root = tmpDir("fdw-multicp")
    foreignTable(root, Seq((0L, "seed")).toDF("id", "s"),
      config = """{"delta.checkpoint.partSize":"5"}""")
    val t = new ForeignDeltaTable(spark, root)
    (1 to 10).foreach(i => t.append(Seq((i.toLong, s"r$i")).toDF("id", "s"))) // cp@10
    val logFiles = new File(root, "_delta_log").listFiles().map(_.getName)
    // multi-part form only — no single-file checkpoint
    assert(!logFiles.contains("00000000000000000010.checkpoint.parquet"))
    val parts = logFiles.filter(_.matches(
      """00000000000000000010\.checkpoint\.\d{10}\.\d{10}\.parquet"""))
    assert(parts.length >= 2, s"expected multi-part checkpoint, got ${logFiles.toSeq}")
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val lc = mapper.readTree(new String(Files.readAllBytes(
      java.nio.file.Paths.get(root, "_delta_log", "_last_checkpoint")), "UTF-8"))
    assert(lc.get("parts").asInt() == parts.length)
    // the state resolves from the parts alone once early JSONs are gone
    (0L to 5L).foreach(v => new File(root, f"_delta_log/$v%020d.json").delete())
    assert(DeltaTable.read(spark, root).select("id").as[Long].collect().sorted.toSeq
      == (0L to 10L))
    t.append(Seq((99L, "z")).toDF("id", "s"))
    assert(DeltaTable.read(spark, root).count() == 12L)
  }

  test("cleanupMetadata: expired logs below the newest expired checkpoint go") {
    val root = tmpDir("fdw-logclean")
    foreignTable(root, Seq((0L, "seed")).toDF("id", "s"))
    val t = new ForeignDeltaTable(spark, root)
    (1 to 12).foreach(i => t.append(Seq((i.toLong, s"r$i")).toDF("id", "s"))) // v1..v12, cp@10
    val before = DeltaTable.read(spark, root).count()
    // everything "expired" (cutoff in the future): floor = checkpoint 10,
    // jsons 0..9 + their crc sidecars deleted (v0 was fabricated by hand,
    // so it has no crc), json 10..12 + the checkpoint survive
    val gone = t.cleanupMetadata(retentionMs = Some(-60000L))
    assert(gone.toSet == ((0L to 9L).map(v => f"$v%020d.json") ++
      (1L to 9L).map(v => f"$v%020d.crc")).toSet, gone)
    assert(new File(root, "_delta_log/00000000000000000010.checkpoint.parquet").exists)
    assert(DeltaTable.read(spark, root).count() == before)
    assert(DeltaTable.snapshot(spark, root).version == 12L)
    // time travel at/above the floor resolves; below it is gone, loudly
    assert(DeltaTable.read(spark, root, versionAsOf = Some(10L)).count() == 11)
    intercept[Exception](
      DeltaTable.read(spark, root, versionAsOf = Some(5L)).count())
    // idempotent: nothing further below the floor
    assert(t.cleanupMetadata(retentionMs = Some(-60000L)).isEmpty)
    // nothing expired (cutoff in the past) → no-op
    (13 to 22).foreach(i => t.append(Seq((i.toLong, s"r$i")).toDF("id", "s"))) // cp@20
    assert(t.cleanupMetadata(retentionMs = Some(3600L * 1000)).isEmpty)
  }

  test("cleanupMetadata on a v2 table deletes the doomed manifest's sidecar") {
    val root = tmpDir("fdw-logclean2")
    foreignTable(root, Seq((0L, "seed")).toDF("id", "s"),
      protocol = """{"protocol":{"minReaderVersion":3,""" +
        """"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],""" +
        """"writerFeatures":["v2Checkpoint"]}}""",
      config = """{"delta.checkpointPolicy":"v2"}""")
    val t = new ForeignDeltaTable(spark, root)
    (1 to 20).foreach(i => t.append(Seq((i.toLong, s"r$i")).toDF("id", "s"))) // cps @10, @20
    def sidecars() = new File(root, "_delta_log/_sidecars").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(sidecars().size == 2)
    val gone = t.cleanupMetadata(retentionMs = Some(-60000L))
    // floor = v2 checkpoint 20: jsons 0..19, the v10 manifest, AND the
    // v10 manifest's sidecar are gone; v20's sidecar survives
    assert(gone.exists(n => n.startsWith("00000000000000000010.checkpoint.")))
    assert(sidecars().size == 1)
    assert(DeltaTable.read(spark, root).count() == 21)
    // the surviving v2 checkpoint still resolves the whole state
    assert(DeltaTable.read(spark, root, versionAsOf = Some(20L)).count() == 21)
  }

  test("unsupported tables refuse loudly; appendOnly allows append only") {
    val df = Seq((1L, "a")).toDF("id", "s")
    // column mapping DECLARED but the schema carries no physicalName
    // metadata — malformed; a well-formed CM table writes fine
    // (ForeignCmWriteSpec)
    val p2 = tmpDir("fdw-cm")
    foreignTable(p2, df, config = """{"delta.columnMapping.mode":"name"}""")
    intercept[UnsupportedOperationException] {
      new ForeignDeltaTable(spark, p2).append(df)
    }
    // CDF: blind appends are protocol-legal WITHOUT cdc actions; a DV
    // delete emits real cdc actions (row-level coverage in
    // ForeignDvDeleteSpec) — supported, not refused
    val p3 = tmpDir("fdw-cdf")
    foreignTable(p3, df, config = """{"delta.enableChangeDataFeed":"true"}""")
    val t3 = new ForeignDeltaTable(spark, p3)
    t3.append(Seq((2L, "b")).toDF("id", "s"))
    assert(DeltaTable.read(spark, p3).count() == 2)
    t3.deleteWhere(col("id") === 1, allowProtocolUpgrade = true)
    assert(DeltaTable.read(spark, p3).collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(new java.io.File(p3, "_change_data").isDirectory)
    // writer protocol 7 with a feature this writer does not implement
    val p4 = tmpDir("fdw-feat")
    foreignTable(p4, df, protocol = """{"protocol":{"minReaderVersion":1,""" +
      """"minWriterVersion":7,"writerFeatures":["futureFancyFeature"]}}""")
    intercept[UnsupportedOperationException] {
      new ForeignDeltaTable(spark, p4).append(df)
    }
    // ... and VACUUM runs the same protocol check (vacuumProtocolCheck
    // semantics): an ununderstood writer feature may govern file liveness
    val eVac = intercept[UnsupportedOperationException] {
      new ForeignDeltaTable(spark, p4).vacuum(retentionMs = Some(0L))
    }
    assert(eVac.getMessage.contains("VACUUM protocol check"))
    // liquid-clustered tables accept appends: clustering is BEST-EFFORT
    // per the spec — a non-clustering writer's files are simply
    // unclustered until the owner's next OPTIMIZE
    val p7 = tmpDir("fdw-cluster")
    foreignTable(p7, df, protocol = """{"protocol":{"minReaderVersion":1,""" +
      """"minWriterVersion":7,"writerFeatures":["clustering","domainMetadata"]}}""")
    val t7 = new ForeignDeltaTable(spark, p7)
    t7.append(Seq((2L, "b")).toDF("id", "s"))
    assert(DeltaTable.read(spark, p7).count() == 2)
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

  test("partitioned appends: hive dirs, partitionValues, planning-time pruning") {
    val root = tmpDir("fdw-partapp")
    // hand-crafted PARTITIONED foreign table the way delta-spark lays one
    // out: the data file sits under seg=a/ and does NOT contain the
    // partition column — that lives in metaData.partitionColumns + each
    // add's partitionValues
    val staging = tmpDir("fdw-partstage")
    Seq(1L).toDF("id").coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    new File(root, "seg=a").mkdirs()
    Files.copy(part.toPath,
      java.nio.file.Paths.get(root, "seg=a", "part-0-foreign.parquet")): Unit
    rm(staging)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("seg", StringType)))
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val meta = s"""{"metaData":{"id":"foreign-p","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${mapper.writeValueAsString(schema.json)},""" +
      s""""partitionColumns":["seg"],"configuration":{},"createdTime":1}}"""
    val add = s"""{"add":{"path":"seg=a/part-0-foreign.parquet","partitionValues":{"seg":"a"},""" +
      s""""size":${new File(root, "seg=a/part-0-foreign.parquet").length()},"modificationTime":1,"dataChange":true}}"""
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json"),
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta, add)
        .mkString("\n").getBytes("UTF-8")): Unit

    val t = new ForeignDeltaTable(spark, root)
    // append across three partitions, one value with a space (URI-encoding
    // path) and one null (__HIVE_DEFAULT_PARTITION__ path)
    assert(t.append(Seq((2L, "a"), (3L, "b b"), (4L, null.asInstanceOf[String]))
      .toDF("id", "seg")) == 1L)
    val got = DeltaTable.read(spark, root).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a"), (2L, "a"), (3L, "b b"), (4L, null)))
    // the commit's add actions carry decoded partitionValues and the
    // on-disk hive dir in the (percent-encoded) path
    val commit = new String(Files.readAllBytes(
      java.nio.file.Paths.get(root, "_delta_log", "00000000000000000001.json")), "UTF-8")
    val adds = commit.split('\n').filter(_.contains("\"add\"")).toSeq
      .map(l => mapper.readTree(l).get("add"))
    assert(adds.exists(a => a.get("partitionValues").get("seg") != null &&
      !a.get("partitionValues").get("seg").isNull &&
      a.get("partitionValues").get("seg").asText() == "b b"))
    assert(adds.exists(a => a.get("partitionValues").get("seg") != null &&
      a.get("partitionValues").get("seg").isNull))
    assert(adds.exists(a => a.get("path").asText().contains("seg=b%20b/")))
    // readCommit reconstructs partition columns from the adds'
    // partitionValues (the SCD2 full-load pk snapshot rides this)
    assert(t.readCommit(1L).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .sortBy(_._1).toSeq == Seq((2L, "a"), (3L, "b b"), (4L, null)))
    // partition stats exclude the partition column itself
    adds.filter(_.has("stats")).foreach { a =>
      val st = mapper.readTree(a.get("stats").asText())
      assert(st.get("minValues").get("seg") == null)
      assert(st.get("nullCount").get("id") != null)
    }
    // PLANNING-TIME pruning: hand-commit an add whose file does not exist
    // in partition seg=zz — a partition-filtered read must never try to
    // open it, while an unfiltered read fails on the missing file
    Files.write(java.nio.file.Paths.get(root, "_delta_log", "00000000000000000002.json"),
      ("""{"add":{"path":"seg=zz/ghost.parquet","partitionValues":{"seg":"zz"},""" +
        """"size":10,"modificationTime":1,"dataChange":true}}""").getBytes("UTF-8")): Unit
    assert(DeltaTable.read(spark, root).filter(col("seg") === "a")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    intercept[Throwable] { DeltaTable.read(spark, root).count() }
    // partitioned overwrite: removes every live file (ghost included —
    // remove actions never touch disk), rewrites hive-layout content
    assert(t.overwrite(Seq((7L, "x"), (8L, "y")).toDF("id", "seg")) == 3L)
    assert(DeltaTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((7L, "x"), (8L, "y")))
    // a write that would DROP the partition column refuses loudly
    intercept[UnsupportedOperationException] { t.overwrite(Seq(9L).toDF("id")) }
  }

  test("checkpoint every 10 commits: readers resolve from checkpoint + tail") {
    val root = tmpDir("fdw-cp")
    foreignTable(root, Seq((0L, "r0")).toDF("id", "s"))
    val t = new ForeignDeltaTable(spark, root)
    (1 to 4).foreach(i => t.append(Seq((i.toLong, s"r$i")).toDF("id", "s")))
    // v5 is an overwrite — its removed files must survive as checkpoint
    // tombstones (foreign VACUUMs depend on them)
    t.overwrite(Seq((100L, "base")).toDF("id", "s"))
    (6 to 12).foreach(i => t.append(Seq((i.toLong, s"r$i")).toDF("id", "s")))
    val cp = new File(root, "_delta_log/00000000000000000010.checkpoint.parquet")
    assert(cp.exists())
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val lc = mapper.readTree(new String(Files.readAllBytes(
      java.nio.file.Paths.get(root, "_delta_log", "_last_checkpoint")), "UTF-8"))
    assert(lc.get("version").asLong() == 10L)
    // the checkpoint carries the table's protocol, unexpired remove
    // tombstones, and per-file stats on its adds
    val cpDf = spark.read.parquet(cp.toString)
    assert(cpDf.filter(col("protocol.minReaderVersion") === 1).count() == 1)
    assert(cpDf.filter(col("remove.path").isNotNull).count() >= 5)
    assert(cpDf.filter(col("add.path").isNotNull &&
      col("add.stats").isNotNull).count() >= 6)
    val before = DeltaTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(before == (Seq((100L, "base")) ++ (6 to 12).map(i => (i.toLong, s"r$i"))).sorted)
    // resolution from checkpoint@10 + JSON tail ALONE: delete commits 0-10
    (0 to 10).foreach(v => java.nio.file.Files.delete(
      java.nio.file.Paths.get(root, "_delta_log", f"$v%020d.json")))
    val after = DeltaTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(after == before)
    // stats survived through the checkpoint — equality skipping still exact
    assert(t.readWhere(col("id") === 7L).count() == 1)
    // and the writer itself keeps committing on the truncated log
    assert(t.append(Seq((13L, "r13")).toDF("id", "s")) == 13L)
    assert(DeltaTable.read(spark, root).count() == before.size + 1L)
  }

  test("string stats are bounded: 32-cp prefix min, prefix-successor max") {
    val root = tmpDir("fdw-longstr")
    foreignTable(root, Seq((1L, "a")).toDF("id", "s"))
    val t = new ForeignDeltaTable(spark, root)
    val long = "zz" + ("x" * 20000)
    t.append(Seq((2L, long)).toDF("id", "s"))
    val commit = new String(Files.readAllBytes(
      java.nio.file.Paths.get(root, "_delta_log", "00000000000000000001.json")), "UTF-8")
    // the whole commit stays small — no 20 KB value embedded twice
    assert(commit.length < 2000, s"commit is ${commit.length} bytes")
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val st = commit.split('\n').filter(_.contains("\"add\"")).toSeq
      .map(l => mapper.readTree(mapper.readTree(l).get("add").get("stats").asText())).head
    assert(st.get("minValues").get("s").asText() == long.take(32))
    assert(st.get("maxValues").get("s").asText() == long.take(31) + "y")
    // bounded stats never FALSELY prune: the long value is still found
    assert(t.readWhere(col("s") === long).count() == 1)
    assert(t.readWhere(col("s") === "a").count() == 1)
  }

  test("two concurrent appenders both land every commit (optimistic retry)") {
    val root = tmpDir("fdw-conc")
    foreignTable(root, Seq((0L, "seed")).toDF("id", "s"))
    val perWriter = 6
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 2).map { w =>
      Future {
        val t = new ForeignDeltaTable(spark, root)
        (1 to perWriter).map { i =>
          t.append(Seq((w * 1000L + i, s"w$w-$i")).toDF("id", "s"))
        }
      }
    }
    val versions = fs.flatMap(Await.result(_, 5.minutes))
    // every commit landed on its own version, log is contiguous
    assert(versions.size == 2 * perWriter)
    assert(versions.toSet.size == 2 * perWriter)
    assert(versions.toSet == (1L to 2L * perWriter).toSet)
    val got = DeltaTable.read(spark, root).collect().map(_.getLong(0)).toSet
    assert(got.size == 2 * perWriter + 1)
  }

  test("vacuum deletes only expired tombstoned files; live data untouched") {
    val root = tmpDir("fdw-vac")
    foreignTable(root, Seq((1L, "a")).toDF("id", "s"))
    val t = new ForeignDeltaTable(spark, root)
    t.append(Seq((2L, "b")).toDF("id", "s"))
    t.overwrite(Seq((9L, "z")).toDF("id", "s")) // tombstones v0 + append files
    val goneCount = DeltaTable.snapshot(spark, root).tombstones.size
    assert(goneCount >= 2)
    // inside retention: nothing deleted, dry or not
    assert(t.vacuum() == Nil)
    // dry run past retention lists but leaves files on disk
    val dry = t.vacuum(retentionMs = Some(0L), dryRun = true)
    assert(dry.size == goneCount)
    assert(new File(root, "part-00000-foreign.snappy.parquet").exists())
    // an ORPHAN (crashed writer's uncommitted dir — no log action at all):
    // swept once past retention, kept while fresh
    new File(root, "graft_data/orphan1").mkdirs()
    val orphan = new File(root, "graft_data/orphan1/part-0-orphan.parquet")
    Files.write(orphan.toPath, Array[Byte](1, 2, 3)): Unit
    orphan.setLastModified(System.currentTimeMillis() - 1000000L): Unit
    val fresh = new File(root, "graft_data/orphan1/part-1-fresh.parquet")
    Files.write(fresh.toPath, Array[Byte](4, 5)): Unit
    // future mtime stands in for "younger than retention" under the
    // retention-0 sweep that the tombstone assertions need
    fresh.setLastModified(System.currentTimeMillis() + 600000L): Unit
    // real vacuum deletes tombstoned + aged orphan; the fresh orphan (a
    // possibly in-flight commit) and the live table survive
    val deleted = t.vacuum(retentionMs = Some(0L))
    assert(deleted.toSet == dry.toSet + "graft_data/orphan1/part-0-orphan.parquet")
    assert(!new File(root, "part-00000-foreign.snappy.parquet").exists())
    assert(!orphan.exists() && fresh.exists())
    assert(DeltaTable.read(spark, root).collect().map(_.getLong(0)).toSeq == Seq(9L))
    // and the writer keeps committing afterwards
    assert(t.append(Seq((10L, "y")).toDF("id", "s")) == 3L)
    assert(DeltaTable.read(spark, root).count() == 2)
  }

  test("truncation + retention helpers") {
    import ForeignDeltaTable.{truncateMin, truncateMaxBound, retentionMillis}
    assert(truncateMin("short") == "short")
    assert(truncateMin("a" * 40) == "a" * 32)
    assert(truncateMaxBound("short") == Some("short"))
    assert(truncateMaxBound("a" * 40) == Some("a" * 31 + "b"))
    // surrogate gap: 0xD7FF increments to 0xE000, never an unpaired surrogate
    assert(truncateMaxBound("퟿" * 40) == Some("퟿" * 31 + ""))
    // trailing max code points drop until something can increment
    val maxCp = new String(Character.toChars(Character.MAX_CODE_POINT))
    assert(truncateMaxBound("a" + maxCp * 39) == Some("b"))
    assert(truncateMaxBound(maxCp * 40) == None)
    assert(retentionMillis(None) == 7L * 24 * 3600 * 1000)
    assert(retentionMillis(Some("interval 1 hour")) == 3600L * 1000)
    assert(retentionMillis(Some("INTERVAL 2 days")) == 2L * 24 * 3600 * 1000)
    assert(retentionMillis(Some("not an interval")) == 7L * 24 * 3600 * 1000)
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

  test("RESTORE: rollback as a forward commit; DV states restore; vacuumed targets refuse") {
    val root = tmpDir("fdw-restore")
    foreignTable(root, (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s")) // v0
    val t = new ForeignDeltaTable(spark, root)
    t.append((10L until 15L).map(i => (i, s"r$i")).toDF("id", "s")) // v1
    t.deleteWhere(col("id") % 3 === 0, allowProtocolUpgrade = true) // v2: DVs
    def ids() = DeltaTable.read(spark, root).select("id").as[Long].collect().sorted.toSeq
    assert(ids() == (0L until 15L).filter(_ % 3 != 0))
    // back to v1: the DV dissolves (files re-added with their v1 no-DV state)
    assert(t.restore(1) == 3L)
    assert(ids() == (0L until 15L))
    // back to v0: the appended file drops
    assert(t.restore(0) == 4L)
    assert(ids() == (0L until 10L))
    // restoring to the just-restored state: nothing differs, no commit
    assert(t.restore(4) == 4L)
    // time travel across the restores still replays every epoch
    assert(DeltaTable.read(spark, root, versionAsOf = Some(2L))
      .select("id").as[Long].collect().sorted.toSeq
      == (0L until 15L).filter(_ % 3 != 0))
    // a vacuumed target version refuses loudly: overwrite tombstones the
    // original file, vacuum reclaims it, v0 is then unrecoverable
    t.overwrite(Seq((99L, "z")).toDF("id", "s")) // v5
    t.vacuum(retentionMs = Some(0L))
    val e = intercept[UnsupportedOperationException](t.restore(0))
    assert(e.getMessage.contains("vacuum"))
  }
}
