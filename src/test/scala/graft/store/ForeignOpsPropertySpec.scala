package graft.store

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Randomized op-mix property test for the FOREIGN Delta writer: a seeded
  * sequence of append / DV DELETE WHERE / OPTIMIZE / overwrite against a
  * driver-side model, checked through the external reader after every op,
  * with version time travel and a final vacuum. Cross-op coverage for the
  * foreign surface (DVs over compacted files, optimize over DV'd files,
  * overwrite cancelling DV history). */
class ForeignOpsPropertySpec extends SparkSuite {
  import spark.implicits._

  private type Model = Map[Long, Long]

  private def rm(path: String): Unit = {
    def loop(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(loop)
      f.delete(): Unit
    }
    loop(new File(path))
  }

  private def foreignTable(
      root: String, df: org.apache.spark.sql.DataFrame,
      cdf: Boolean = false, rt: Boolean = false,
      v2cp: Boolean = false): Unit = {
    val staging = tmpDir("fprop-stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dataName = "part-00000-foreign.snappy.parquet"
    Files.copy(part.toPath, java.nio.file.Paths.get(root, dataName)): Unit
    rm(staging)
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val config =
      if (cdf) """{"delta.enableChangeDataFeed":"true"}"""
      else if (rt) """{"delta.enableRowTracking":"true"}"""
      else if (v2cp) """{"delta.checkpointPolicy":"v2"}"""
      else "{}"
    val protocol =
      if (cdf) """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}"""
      else if (rt) """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["rowTracking","domainMetadata"]}}"""
      else if (v2cp) """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}"""
      else """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    val meta = s"""{"metaData":{"id":"fprop","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${mapper.writeValueAsString(df.schema.json)},""" +
      s""""partitionColumns":[],"configuration":$config,"createdTime":1}}"""
    val n = df.count()
    val rtFields =
      if (rt) s""","stats":"{\\"numRecords\\":$n}","baseRowId":0,"defaultRowCommitVersion":0"""
      else ""
    val add = s"""{"add":{"path":"$dataName","partitionValues":{},""" +
      s""""size":${new File(root, dataName).length()},"modificationTime":1,"dataChange":true$rtFields}}"""
    val lines = Seq(protocol, meta, add) ++ (if (rt) Seq(
      s"""{"domainMetadata":{"domain":"delta.rowTracking","configuration":"{\\"rowIdHighWaterMark\\":${n - 1}}","removed":false}}""")
      else Nil)
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log",
      "00000000000000000000.json"),
      lines.mkString("\n").getBytes("UTF-8")): Unit
  }

  private def snapshot(path: String): Model =
    DeltaTable.read(spark, path).select("id", "k").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def runMix(seed: Int, ops: Int, cdf: Boolean = false,
      rt: Boolean = false, v2cp: Boolean = false): Unit = {
    val rnd = new scala.util.Random(seed)
    val path = tmpDir(s"fprop$seed")
    var model: Model = (0L until 30L).map(i => i -> rnd.nextLong(20)).toMap
    var nextId = 30L
    val initial = model
    foreignTable(path, model.toSeq.toDF("id", "k"), cdf, rt, v2cp)
    val t = new ForeignDeltaTable(spark, path)
    val history = scala.collection.mutable.ArrayBuffer(0L -> model)

    (1 to ops).foreach { i =>
      rnd.nextInt(6) match {
        case 0 | 1 => // append fresh ids
          val n = 1 + rnd.nextInt(15)
          val rows = (nextId until nextId + n).map(id => id -> rnd.nextLong(20))
          nextId += n
          t.append(rows.toDF("id", "k"))
          model = model ++ rows
        case 2 => // DV delete on a k-slice
          val kk = rnd.nextLong(20)
          t.deleteWhere(col("k") === kk, allowProtocolUpgrade = true)
          model = model.filterNot(_._2 == kk)
        case 3 => // compaction (+ DV purge): content-neutral; on a
          // row-tracked table ids survive via materialized columns
          t.optimize(minFiles = 2): Unit
        case 4 => // overwrite with a mutated snapshot
          val rows = model.toSeq.map { case (id, k) =>
            id -> (if (rnd.nextBoolean()) k else rnd.nextLong(20)) }
          t.overwrite(rows.toDF("id", "k"))
          model = rows.toMap
        case 5 => // MERGE: update a random live slice + insert fresh ids
          val updates = model.toSeq.filter(_ => rnd.nextInt(4) == 0)
            .map { case (id, _) => id -> rnd.nextLong(20) }
          val n = rnd.nextInt(5)
          val inserts = (nextId until nextId + n).map(id => id -> rnd.nextLong(20))
          nextId += n
          val srcRows = updates ++ inserts
          if (srcRows.nonEmpty) {
            t.merge(srcRows.toDF("id", "k"), Seq("id"),
              allowProtocolUpgrade = true)
            model = model ++ srcRows
          }
      }
      val got = snapshot(path)
      assert(got == model, s"seed=$seed op=$i diverged: " +
        s"extra=${(got.toSet -- model.toSet).take(5)} " +
        s"missing=${(model.toSet -- got.toSet).take(5)}")
      history += DeltaTable.snapshot(spark, path).version -> model
    }

    // version time travel replays exactly (distinct versions only —
    // content-neutral ops may leave the version pointing at the same model)
    rnd.shuffle(history.toSeq).take(5).foreach { case (v, m) =>
      val got = DeltaTable.read(spark, path, versionAsOf = Some(v))
        .select("id", "k").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == m, s"seed=$seed version $v time travel diverged")
    }

    // CDF tables: the FULL change feed must fold back to the final state —
    // every commit's cdc actions (DV deletes) or derivation (appends,
    // overwrites) is a complete, ordered change history
    if (cdf) {
      val latest = DeltaTable.snapshot(spark, path).version
      val byVersion = DeltaTable.readChanges(spark, path, 1L, latest)
        .select(col("id"), col("k"), col("_change_type"), col("__commit_version"))
        .collect().map(r => (r.getLong(3), r.getString(2), r.getLong(0), r.getLong(1)))
        .groupBy(_._1).toSeq.sortBy(_._1)
      var folded = initial
      byVersion.foreach { case (_, rows) =>
        // within a version: deletes/preimages first, then inserts and
        // postimages (the overwrite derivation re-inserts surviving ids;
        // a merge's postimage replaces its preimage's key)
        rows.filter(_._2 == "delete").foreach { case (_, _, id, _) => folded -= id }
        rows.filter(r => r._2 == "insert" || r._2 == "update_postimage")
          .foreach { case (_, _, id, k) => folded += id -> k }
        val legal = Set("delete", "insert", "update_preimage", "update_postimage")
        assert(rows.forall(r => legal(r._2)),
          s"unexpected change type in ${rows.map(_._2).distinct}")
      }
      assert(folded == model,
        s"seed=$seed change-feed fold diverged: " +
          s"extra=${(folded.toSet -- model.toSet).take(5)} " +
          s"missing=${(model.toSet -- folded.toSet).take(5)}")
    }

    // row-tracked tables: every live file carries row ids, the id ranges
    // tile without overlap (fresh ranges disjoint from everything live,
    // DV re-adds verbatim), and the domain's high-water mark bounds them
    if (rt) {
      val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      val s = DeltaTable.snapshot(spark, path)
      val hwm = mapper.readTree(s.domainMetadata("delta.rowTracking"))
        .get("rowIdHighWaterMark").asLong()
      val ranges = s.adds.map { a =>
        assert(a.baseRowId.isDefined && a.defaultRowCommitVersion.isDefined,
          s"seed=$seed live file ${a.rawPath} lost its row-tracking fields")
        val n = mapper.readTree(a.statsJson.get).get("numRecords").asLong()
        (a.baseRowId.get, a.baseRowId.get + n - 1)
      }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Seq((_, e1), (b2, _)) =>
          assert(b2 > e1, s"seed=$seed row-id ranges overlap: $ranges")
        case _ => ()
      }
      assert(ranges.isEmpty || ranges.last._2 <= hwm,
        s"seed=$seed high-water mark $hwm below live range ${ranges.last}")
    }

    // vacuum expired tombstones + superseded DV containers; reads intact
    t.vacuum(retentionMs = Some(0L))
    assert(snapshot(path) == model, s"seed=$seed post-vacuum diverged")
  }

  test("randomized foreign append/delete/optimize/overwrite mix equals the model") {
    runMix(seed = 11, ops = 18)
    runMix(seed = 83, ops = 18)
  }

  test("CDF table: same op mix, and the change feed folds back to the state") {
    runMix(seed = 29, ops = 18, cdf = true)
    runMix(seed = 57, ops = 18, cdf = true)
  }

  test("row-tracked table: same op mix, id ranges stay disjoint under the mark") {
    runMix(seed = 41, ops = 18, rt = true)
    runMix(seed = 73, ops = 18, rt = true)
  }

  test("checkpointPolicy v2 table: same op mix through v2 checkpoints") {
    // 18+ versions cross the checkpoint cadence at least once, so the
    // time-travel and final-state assertions resolve THROUGH a v2
    // manifest + sidecar (early versions replay the JSON tail)
    runMix(seed = 19, ops = 18, v2cp = true)
  }
}
