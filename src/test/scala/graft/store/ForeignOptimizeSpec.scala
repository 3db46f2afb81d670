package graft.store

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** OPTIMIZE on a foreign Delta table: small-file compaction, DV purge
  * (merge-on-read debt paid down), dataChange=false commit shape,
  * partition-wise grouping, column-mapping composition, and vacuum of the
  * compacted-away files. */
class ForeignOptimizeSpec extends SparkSuite {
  import spark.implicits._

  private def rm(path: String): Unit = {
    def loop(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(loop)
      f.delete(): Unit
    }
    loop(new File(path))
  }

  private def foreignTable(root: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val staging = tmpDir("fop-stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dataName = "part-00000-foreign.snappy.parquet"
    Files.copy(part.toPath, java.nio.file.Paths.get(root, dataName)): Unit
    rm(staging)
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val meta = s"""{"metaData":{"id":"foreign-op","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${mapper.writeValueAsString(df.schema.json)},""" +
      s""""partitionColumns":[],"configuration":{},"createdTime":1}}"""
    val add = s"""{"add":{"path":"$dataName","partitionValues":{},""" +
      s""""size":${new File(root, dataName).length()},"modificationTime":1,"dataChange":true}}"""
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log",
      "00000000000000000000.json"),
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta, add)
        .mkString("\n").getBytes("UTF-8")): Unit
  }

  test("compacts small files into one; dataChange=false; content identical") {
    val root = tmpDir("fop-compact")
    foreignTable(root, Seq((0L, "r0")).toDF("id", "s"))
    val t = new ForeignDeltaTable(spark, root)
    // five tiny single-row appends → 6 small files
    (1 to 5).foreach(i => t.append(Seq((i.toLong, s"r$i")).toDF("id", "s")))
    val before = DeltaTable.read(spark, root).orderBy("id").collect().toSeq
    assert(DeltaTable.snapshot(spark, root).numFiles == 6)
    val v = t.optimize()
    assert(v == 6L)
    val s = DeltaTable.snapshot(spark, root)
    assert(s.numFiles == 1)
    assert(DeltaTable.read(spark, root).orderBy("id").collect().toSeq == before)
    // commit shape: all removes and adds carry dataChange=false
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val actions = new String(Files.readAllBytes(java.nio.file.Paths.get(
      root, "_delta_log", "00000000000000000006.json")), "UTF-8")
      .split('\n').filter(_.nonEmpty).map(mapper.readTree)
    actions.filter(_.has("remove")).foreach(a =>
      assert(!a.get("remove").get("dataChange").asBoolean))
    actions.filter(_.has("add")).foreach(a =>
      assert(!a.get("add").get("dataChange").asBoolean))
    assert(actions.count(_.has("remove")) == 6)
    assert(actions.count(_.has("add")) == 1)
    // re-optimize is a no-op (one compact file left, no DVs)
    assert(t.optimize() == 6L)
    // the compacted-away files vacuum out once expired; reads stay intact
    val doomed = t.vacuum(retentionMs = Some(0L))
    assert(doomed.size == 6)
    assert(DeltaTable.read(spark, root).orderBy("id").collect().toSeq == before)
  }

  test("purges deletion vectors: DV'd file rewritten live-only, tight stats") {
    val root = tmpDir("fop-dv")
    foreignTable(root, (0L until 100L).map(i => (i, i % 10)).toDF("id", "k"))
    val t = new ForeignDeltaTable(spark, root)
    t.deleteWhere(col("k") === 0, allowProtocolUpgrade = true) // v1: DV
    assert(DeltaTable.snapshot(spark, root).adds.exists(_.dv.isDefined))
    val v = t.optimize()
    assert(v == 2L)
    val s = DeltaTable.snapshot(spark, root)
    // DV gone, one compact file, identical live rows
    assert(s.adds.forall(_.dv.isEmpty))
    assert(s.numFiles == 1)
    val got = DeltaTable.read(spark, root)
    assert(got.count() == 90)
    assert(got.filter(col("k") === 0).count() == 0)
    // fresh stats are TIGHT: numRecords is the live count again
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val stats = mapper.readTree(s.adds.head.statsJson.get)
    assert(stats.get("numRecords").asLong == 90L)
    // the superseded DV container vacuums away with the old file
    assert(t.vacuum(retentionMs = Some(0L)).exists(_.startsWith("deletion_vector_")))
  }

  test("partition-wise grouping: lone small file per partition stays put") {
    val root = tmpDir("fop-part")
    // partitioned fixture via the writer itself: hand-craft partitioned
    // metaData, then append per partition
    val stage = tmpDir("fop-pstage")
    Seq(1L).toDF("id").coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    new File(root, "seg=a").mkdirs()
    Files.copy(part.toPath,
      java.nio.file.Paths.get(root, "seg=a", "part-0-foreign.parquet")): Unit
    rm(stage)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("seg", StringType)))
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val meta = s"""{"metaData":{"id":"fop-p","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${mapper.writeValueAsString(schema.json)},""" +
      s""""partitionColumns":["seg"],"configuration":{},"createdTime":1}}"""
    val add = s"""{"add":{"path":"seg=a/part-0-foreign.parquet","partitionValues":{"seg":"a"},""" +
      s""""size":${new File(root, "seg=a/part-0-foreign.parquet").length()},"modificationTime":1,"dataChange":true}}"""
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json"),
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta, add)
        .mkString("\n").getBytes("UTF-8")): Unit

    val t = new ForeignDeltaTable(spark, root)
    // partition b gets 3 small files; partition a keeps its lone file
    (0 until 3).foreach(i => t.append(Seq((10L + i, "b")).toDF("id", "seg")))
    val before = DeltaTable.read(spark, root).orderBy("id").collect().toSeq
    val v = t.optimize()
    assert(v == 4L)
    val s = DeltaTable.snapshot(spark, root)
    // a's lone file untouched (same rawPath), b compacted to one
    assert(s.adds.exists(_.rawPath == "seg=a/part-0-foreign.parquet"))
    assert(s.adds.count(_.partitionValues.get("seg").flatten.contains("b")) == 1)
    assert(DeltaTable.read(spark, root).orderBy("id").collect().toSeq == before)
    // compacted add still carries its partitionValues (pruning works)
    assert(DeltaTable.read(spark, root).filter(col("seg") === "b").count() == 3)
  }

  test("oversized hive partition splits across tasks (bytes-proportional salt)") {
    val root = tmpDir("fop-salt")
    val stage = tmpDir("fop-salt-stage")
    Seq((0L, "a")).toDF("id", "seg").coalesce(1)
      .write.mode("overwrite").partitionBy("seg").parquet(stage)
    val part = new File(stage, "seg=a").listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    new File(root, "seg=a").mkdirs()
    Files.copy(part.toPath,
      java.nio.file.Paths.get(root, "seg=a", "part-0-foreign.parquet")): Unit
    rm(stage)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("seg", StringType)))
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val meta = s"""{"metaData":{"id":"fop-salt","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${mapper.writeValueAsString(schema.json)},""" +
      s""""partitionColumns":["seg"],"configuration":{},"createdTime":1}}"""
    val add = s"""{"add":{"path":"seg=a/part-0-foreign.parquet","partitionValues":{"seg":"a"},""" +
      s""""size":${new File(root, "seg=a/part-0-foreign.parquet").length()},"modificationTime":1,"dataChange":true}}"""
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json"),
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta, add)
        .mkString("\n").getBytes("UTF-8")): Unit

    val t = new ForeignDeltaTable(spark, root)
    // two sizeable appends into the SAME hive partition; a tiny
    // targetFileBytes makes the partition's candidate bytes demand
    // several output files — without the salt everything would funnel
    // through one task into one file
    t.append((1L until 4000L).map(i => (i, "a")).toDF("id", "seg"))
    t.append((4000L until 8000L).map(i => (i, "a")).toDF("id", "seg"))
    val before = DeltaTable.read(spark, root).orderBy("id").collect().toSeq
    t.optimize(smallFileBytes = 10L << 20, targetFileBytes = 8 << 10,
      minFiles = 2)
    val s = DeltaTable.snapshot(spark, root)
    val aAdds = s.adds.filter(_.partitionValues.get("seg").flatten.contains("a"))
    assert(aAdds.size > 1,
      s"an over-target partition must split into several files, got ${aAdds.size}")
    // still hive-partitioned correctly and content-identical
    assert(aAdds.forall(_.rawPath.contains("seg=a")))
    assert(DeltaTable.read(spark, root).orderBy("id").collect().toSeq == before)
  }

  test("composes with column mapping: compacted files keep physical names") {
    val root = tmpDir("fop-cm")
    // name-mode CM fixture (shape from ForeignCmWriteSpec)
    def fm(id: Long, phys: String) = new MetadataBuilder()
      .putLong("delta.columnMapping.id", id)
      .putString("delta.columnMapping.physicalName", phys).build()
    val cmSchema = StructType(Seq(
      StructField("id", LongType, nullable = true, fm(1, "col-11")),
      StructField("v", StringType, nullable = true, fm(2, "col-22"))))
    val stage = tmpDir("fop-cmstage")
    Seq((1L, "a")).toDF("col-11", "col-22").coalesce(1)
      .write.mode("overwrite").parquet(stage)
    val part = new File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dataName = "part-00000-foreign.snappy.parquet"
    Files.copy(part.toPath, java.nio.file.Paths.get(root, dataName)): Unit
    rm(stage)
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val meta = s"""{"metaData":{"id":"fop-cm","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${mapper.writeValueAsString(cmSchema.json)},""" +
      s""""partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name",""" +
      s""""delta.columnMapping.maxColumnId":"2"},"createdTime":1}}"""
    val add = s"""{"add":{"path":"$dataName","partitionValues":{},""" +
      s""""size":${new File(root, dataName).length()},"modificationTime":1,"dataChange":true}}"""
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json"),
      (Seq("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["columnMapping"],"writerFeatures":["columnMapping"]}}""",
        meta, add)).mkString("\n").getBytes("UTF-8")): Unit

    val t = new ForeignDeltaTable(spark, root)
    t.append(Seq((2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))
    val v = t.optimize()
    assert(v == 3L)
    val s = DeltaTable.snapshot(spark, root)
    assert(s.numFiles == 1)
    val got = DeltaTable.read(spark, root).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the compacted parquet carries PHYSICAL column names
    val newFile = new File(root, "graft_data").listFiles
      .flatMap(d => Option(d.listFiles).toSeq.flatten)
      .filter(_.getName.endsWith(".parquet"))
      .maxBy(_.lastModified)
    assert(spark.read.parquet(newFile.getAbsolutePath)
      .schema.fieldNames.toSeq == Seq("col-11", "col-22"))
  }

  test("row-tracked compaction materializes ids; identity stable across rewrite") {
    val root = tmpDir("fop-rt")
    // rt-ACTIVE empty v0, the delta-spark enablement shape
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log",
      "00000000000000000000.json"),
      Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
          """"writerFeatures":["rowTracking","domainMetadata"]}}""",
        s"""{"metaData":{"id":"fop-rt","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":${mapper.writeValueAsString(schema.json)},""" +
          s""""partitionColumns":[],"configuration":{"delta.enableRowTracking":"true"},""" +
          s""""createdTime":1}}""").mkString("\n").getBytes("UTF-8")): Unit
    val t = new ForeignDeltaTable(spark, root)
    (0 until 4).foreach(i => t.append(
      Seq((i * 10L, s"a$i"), (i * 10L + 1, s"b$i")).toDF("id", "s"))) // v1..v4
    t.deleteWhere(col("id") === 10L, allowProtocolUpgrade = true) // v5: DV
    def identity(): Map[Long, (Long, Long)] =
      DeltaTable.read(spark, root, rowIds = true).collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val before = identity()
    val hwmBefore = {
      val s = DeltaTable.snapshot(spark, root)
      mapper.readTree(s.domainMetadata("delta.rowTracking"))
        .get("rowIdHighWaterMark").asLong()
    }

    val v = t.optimize(minFiles = 2)
    assert(v == 6L)
    val s = DeltaTable.snapshot(spark, root)
    assert(s.numFiles == 1)
    // every surviving row keeps its EXACT (_row_id, _row_commit_version)
    assert(identity() == before, "row identity shifted across compaction")
    // the materialized column names were assigned and recorded in config
    val matId = s.configuration("delta.rowTracking.materializedRowIdColumnName")
    val matVer = s.configuration("delta.rowTracking.materializedRowCommitVersionColumnName")
    assert(matId.startsWith("_row-id-col-"))
    // the compacted file physically carries both extra columns
    val newFile = new File(root, "graft_data").listFiles
      .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet"))
      .maxBy(_.lastModified)
    val fileSchema = spark.read.parquet(newFile.getAbsolutePath).schema
    assert(fileSchema.fieldNames.contains(matId) &&
      fileSchema.fieldNames.contains(matVer))
    // ...but they stay OUT of the logical surface and the stats
    assert(DeltaTable.read(spark, root).schema.fieldNames.toSeq ==
      Seq("id", "s"))
    val add6 = new String(Files.readAllBytes(java.nio.file.Paths.get(
      root, "_delta_log", "00000000000000000006.json")), "UTF-8")
      .split('\n').filter(_.contains("\"add\"")).map(mapper.readTree).head.get("add")
    assert(!add6.get("stats").asText().contains(matId))
    // the compacted add took a FRESH range above the old mark (the
    // materialized values outrank it), and the domain advanced
    assert(add6.get("baseRowId").asLong() > hwmBefore)
    val hwmAfter = mapper.readTree(s.domainMetadata("delta.rowTracking"))
      .get("rowIdHighWaterMark").asLong()
    assert(hwmAfter > hwmBefore)
    // appends + a SECOND optimize reuse the SAME materialized names and
    // still preserve identity (mixed files with and without the columns)
    t.append(Seq((100L, "z1"), (101L, "z2")).toDF("id", "s")) // v7
    val before2 = identity()
    t.optimize(minFiles = 2) // v8
    assert(identity() == before2, "second compaction shifted identity")
    assert(DeltaTable.snapshot(spark, root)
      .configuration("delta.rowTracking.materializedRowIdColumnName") == matId)
  }

  test("liquid-clustered table: OPTIMIZE FULL re-clusters by the domain's columns") {
    val root = tmpDir("fop-liquid")
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val schema = StructType(Seq(
      StructField("x", LongType), StructField("s", StringType)))
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log",
      "00000000000000000000.json"),
      Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
          """"writerFeatures":["clustering","domainMetadata"]}}""",
        s"""{"metaData":{"id":"fop-liquid","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":${mapper.writeValueAsString(schema.json)},""" +
          s""""partitionColumns":[],"configuration":{},"createdTime":1}}""",
        """{"domainMetadata":{"domain":"delta.clustering",""" +
          """"configuration":"{\"clusteringColumns\":[[\"x\"]]}","removed":false}}"""
      ).mkString("\n").getBytes("UTF-8")): Unit
    val t = new ForeignDeltaTable(spark, root)
    // four appends, EACH spanning the full x range — every file's stats
    // cover every probe, so data skipping prunes nothing before optimize
    (0 until 4).foreach { i =>
      t.append(Seq(i.toLong, 100L + i, 200L + i, 300L + i)
        .map(x => (x, s"r$x")).toDF("x", "s").coalesce(1))
    }
    val before = DeltaTable.read(spark, root).orderBy("x").collect().toSeq
    def spans(): Seq[(Long, Long)] = DeltaTable.snapshot(spark, root).adds.map { a =>
      val st = mapper.readTree(a.statsJson.get)
      (st.get("minValues").get("x").asLong, st.get("maxValues").get("x").asLong)
    }
    assert(spans().forall { case (lo, hi) => lo <= 3 && hi >= 300 })
    val bytes = DeltaTable.snapshot(spark, root).adds.map(_.size).sum
    val v = t.optimize(targetFileBytes = math.max(1L, bytes / 4), full = true)
    assert(v == 5L)
    // clustered: the rewritten files' x-ranges are pairwise DISJOINT —
    // a point probe now matches exactly one file's stats
    val after = spans().sortBy(_._1)
    assert(after.size >= 2, s"expected a multi-file clustered rewrite, got $after")
    after.zip(after.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(hi < lo2, s"overlapping clustered file ranges: $after")
    }
    assert(DeltaTable.read(spark, root).orderBy("x").collect().toSeq == before)
    // commit fidelity: OPTIMIZE with dataChange=false, clustering recorded
    val lines5 = new String(Files.readAllBytes(java.nio.file.Paths.get(
      root, "_delta_log", "00000000000000000005.json")), "UTF-8")
      .split('\n').filter(_.nonEmpty).map(mapper.readTree)
    val ci = lines5.find(_.has("commitInfo")).get.get("commitInfo")
    assert(ci.get("operationParameters").get("zOrderBy").asText.contains("x"))
    lines5.filter(_.has("add")).foreach(a =>
      assert(!a.get("add").get("dataChange").asBoolean))
    // without full=true, already-compact clustered files (not small by the
    // caller's threshold, no DVs) are left alone
    assert(t.optimize(smallFileBytes = 1L,
      targetFileBytes = math.max(1L, bytes / 4)) == 5L)
  }

  test("OPTIMIZE ZORDER BY: explicit 2-column z clustering tightens both dims") {
    val root = tmpDir("fop-z")
    foreignTable(root, Seq((0L, 0L)).toDF("x", "y"))
    val t = new ForeignDeltaTable(spark, root)
    // an 8×8 grid dealt round-robin so every file spans BOTH full ranges
    val grid = for (x <- 0 until 8; y <- 0 until 8) yield (x.toLong, y.toLong)
    (0 until 4).foreach { i =>
      t.append(grid.filter { case (x, y) => (x * 8 + y) % 4 == i }
        .toDF("x", "y").coalesce(1))
    }
    val before = DeltaTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val bytes = DeltaTable.snapshot(spark, root).adds.map(_.size).sum
    t.optimize(targetFileBytes = math.max(1L, bytes / 4),
      clusterBy = Seq("x", "y"), full = true)
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val spans = DeltaTable.snapshot(spark, root).adds.map { a =>
      val st = mapper.readTree(a.statsJson.get)
      def g(k: String, c: String) = st.get(k).get(c).asLong
      (g("maxValues", "x") - g("minValues", "x"),
        g("maxValues", "y") - g("minValues", "y"))
    }
    assert(spans.size >= 2)
    // z-order gives BOTH columns locality: each file's stats BOX covers a
    // bounded patch of the 8×8 grid, not the whole thing (a contiguous
    // z-range crossing a quadrant boundary may legitimately span one full
    // dimension, so bound the AREA, not each span: ~13–16 cells per file
    // cover ≤ ~2× their cell count; unclustered files covered all 64)
    val areas = spans.map { case (sx, sy) => (sx + 1) * (sy + 1) }
    assert(areas.forall(_ <= 40), s"loose clustered spans: $spans")
    assert(areas.sum <= (64 * spans.size * 6) / 10,
      s"clustering barely tightened stats: $spans")
    assert(DeltaTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq == before)
    // a clustering column missing from the schema refuses loudly
    intercept[UnsupportedOperationException] {
      t.optimize(clusterBy = Seq("x", "nope"), full = true)
    }
    // OPTIMIZE FULL without any clustering columns refuses
    val plain = tmpDir("fop-nofull")
    foreignTable(plain, Seq((1L, "a")).toDF("id", "s"))
    intercept[UnsupportedOperationException] {
      new ForeignDeltaTable(spark, plain).optimize(full = true)
    }
  }

  test("clustered optimize under column mapping resolves physical names") {
    val root = tmpDir("fop-cmz")
    def fm(id: Long, phys: String) = new MetadataBuilder()
      .putLong("delta.columnMapping.id", id)
      .putString("delta.columnMapping.physicalName", phys).build()
    val cmSchema = StructType(Seq(
      StructField("id", LongType, nullable = true, fm(1, "col-11")),
      StructField("v", StringType, nullable = true, fm(2, "col-22"))))
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log",
      "00000000000000000000.json"),
      Seq(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["columnMapping"],""" +
          """"writerFeatures":["columnMapping","clustering","domainMetadata"]}}""",
        s"""{"metaData":{"id":"fop-cmz","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":${mapper.writeValueAsString(cmSchema.json)},""" +
          s""""partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name",""" +
          s""""delta.columnMapping.maxColumnId":"2"},"createdTime":1}}""",
        // the clustering domain stores PHYSICAL names
        """{"domainMetadata":{"domain":"delta.clustering",""" +
          """"configuration":"{\"clusteringColumns\":[[\"col-11\"]]}","removed":false}}"""
      ).mkString("\n").getBytes("UTF-8")): Unit
    val t = new ForeignDeltaTable(spark, root)
    (0 until 3).foreach { i =>
      t.append(Seq(i.toLong, 100L + i, 200L + i).map(x => (x, s"v$x")).toDF("id", "v"))
    }
    val before = DeltaTable.read(spark, root).orderBy("id").collect().toSeq
    val bytes = DeltaTable.snapshot(spark, root).adds.map(_.size).sum
    t.optimize(targetFileBytes = math.max(1L, bytes / 3), full = true)
    // stats keys are physical; clustered ranges disjoint
    val spans = DeltaTable.snapshot(spark, root).adds.map { a =>
      val st = mapper.readTree(a.statsJson.get)
      (st.get("minValues").get("col-11").asLong,
        st.get("maxValues").get("col-11").asLong)
    }.sortBy(_._1)
    assert(spans.size >= 2)
    spans.zip(spans.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(hi < lo2, s"overlapping clustered cm ranges: $spans")
    }
    assert(DeltaTable.read(spark, root).orderBy("id").collect().toSeq == before)
    // explicit clusterBy takes LOGICAL names and resolves the mapping
    t.append(Seq((500L, "z")).toDF("id", "v"))
    val v2 = t.optimize(clusterBy = Seq("id"), full = true)
    assert(DeltaTable.snapshot(spark, root).version == v2)
  }
}
