package graft

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructType}

import graft.store.VersionedTable

/** The Delta-protocol mirror: replaying `_delta_log/` JSON — the way a
  * Delta client would — must reconstruct exactly the file set the graft
  * manifest reports, across append / overwrite / merge / restore /
  * empty-overwrite / properties sequences, with contiguous versions and
  * correct protocol/metaData actions. */
class DeltaLogMirrorSpec extends SparkSuite {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  /** Independent test-side replay of the Delta log (path → size), plus the
    * last metaData node seen. */
  private def replayDeltaLog(root: String): (Map[String, Long], com.fasterxml.jackson.databind.JsonNode, Seq[Long]) = {
    val dir = new java.io.File(s"$root/_delta_log")
    val versioned = dir.listFiles().filter(_.getName.matches("""\d{20}\.json"""))
      .sortBy(_.getName)
    val versions = versioned.map(_.getName.takeWhile(_ != '.').toLong).toSeq
    var files = Map.empty[String, Long]
    var meta: com.fasterxml.jackson.databind.JsonNode = null
    versioned.foreach { f =>
      scala.io.Source.fromFile(f).getLines().filter(_.nonEmpty).foreach { line =>
        val n = mapper.readTree(line)
        if (n.has("metaData")) meta = n.get("metaData")
        if (n.has("add")) files += (n.get("add").get("path").asText() -> n.get("add").get("size").asLong())
        if (n.has("remove")) files -= n.get("remove").get("path").asText()
      }
    }
    (files, meta, versions)
  }

  /** The file set the graft manifest reports: the on-disk parquet files of
    * every dir the newest manifest lists. */
  private def manifestFiles(root: String): Map[String, Long] = {
    val logDir = new java.io.File(s"$root/_graft_log")
    val latest = logDir.listFiles().filter(_.getName.matches("""v\d{10}\.json"""))
      .map(_.getName.drop(1).takeWhile(_ != '.').toLong).max
    val node = mapper.readTree(new java.io.File(s"$root/_graft_log/v${"%010d".format(latest)}.json"))
    val dirs = node.get("dirs").elements()
    var out = Map.empty[String, Long]
    while (dirs.hasNext) {
      val d = dirs.next().get("dir").asText()
      new java.io.File(s"$root/data/$d").listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .foreach(f => out += (s"data/$d/${f.getName}" -> f.length()))
    }
    out
  }

  private def assertMirrored(root: String): Unit = {
    val (live, meta, versions) = replayDeltaLog(root)
    assert(versions == (0L until versions.size).toSeq, s"non-contiguous versions: $versions")
    assert(live == manifestFiles(root), "delta replay and manifest disagree on the live file set")
    assert(meta != null && meta.get("format").get("provider").asText() == "parquet")
  }

  test("append/overwrite/merge/restore sequences replay to the manifest file set") {
    val root = tmpDir("dlm-seq")
    val t = new VersionedTable(spark, root)
    t.append(Seq((1, "a"), (2, "b")).toDF("id", "s"));          assertMirrored(root)
    t.append(Seq((3, "c")).toDF("id", "s"));                    assertMirrored(root)
    t.overwrite(Seq((9, "z"), (10, "y")).toDF("id", "s"));      assertMirrored(root)
    t.append(Seq((11, "w")).toDF("id", "s"));                   assertMirrored(root)
    t.merge(Seq((10, "Y"), (12, "v")).toDF("id", "s"), Seq("id")); assertMirrored(root)
    t.restore(2);                                               assertMirrored(root)
    t.overwriteEmpty(t.schema);                                 assertMirrored(root)
    // v0 carries protocol + metaData; same table id throughout
    val v0 = scala.io.Source.fromFile(s"$root/_delta_log/${"%020d".format(0)}.json")
      .getLines().toSeq
    assert(v0.exists(l => l.contains("\"protocol\"") && l.contains("\"minReaderVersion\":1")))
    val ids = new java.io.File(s"$root/_delta_log").listFiles()
      .filter(_.getName.endsWith(".json")).flatMap { f =>
        scala.io.Source.fromFile(f).getLines().map(mapper.readTree)
          .collect { case n if n.has("metaData") => n.get("metaData").get("id").asText() }
      }.toSet
    assert(ids.size == 1, s"table id must be stable, got $ids")
    // after restore(2): empty overwrite dropped everything
    assert(replayDeltaLog(root)._1.isEmpty)
  }

  test("a delta client reading the live files with the metaData schema sees the table") {
    val root = tmpDir("dlm-read")
    val t = new VersionedTable(spark, root)
    t.append(Seq((1, "a"), (2, "b")).toDF("id", "s"))
    // schema drift: new column → metaData re-emitted with the merged schema
    t.append(Seq((3, "c", 7.5)).toDF("id", "s", "score"), SchemaDrift.NewOnly)
    val (live, meta, _) = replayDeltaLog(root)
    val schema = DataType.fromJson(meta.get("schemaString").asText()).asInstanceOf[StructType]
    assert(schema.fieldNames.toSeq == Seq("id", "s", "score"))
    val viaDelta = spark.read.schema(schema)
      .parquet(live.keys.map(p => s"$root/$p").toSeq: _*)
      .collect().map(r => (r.getInt(0), r.getString(1), Option(r.get(2)))).toSet
    val viaGraft = t.read()
      .collect().map(r => (r.getInt(0), r.getString(1), Option(r.get(2)))).toSet
    assert(viaDelta == viaGraft)
  }

  test("setProperties lands in metaData.configuration without touching files") {
    val root = tmpDir("dlm-props")
    val t = new VersionedTable(spark, root)
    t.append(Seq((1, "a")).toDF("id", "s"))
    val before = replayDeltaLog(root)._1
    t.setProperties(Map("graft.pipeline" -> "docs"))
    val (after, meta, versions) = replayDeltaLog(root)
    assert(after == before)
    assert(versions.size == 2)
    assert(meta.get("configuration").get("graft.pipeline").asText() == "docs")
    assertMirrored(root)
  }

  test("parquet checkpoint at the interval: state from checkpoint + JSON tail") {
    val root = tmpDir("dlm-checkpoint")
    val t = new VersionedTable(spark, root)
    // 13 commits -> versions 0..12; checkpoint expected at v10
    (1 to 13).foreach(i => t.append(Seq((i, s"r$i")).toDF("id", "s")))
    val cp = new java.io.File(s"$root/_delta_log/${"%020d".format(10)}.checkpoint.parquet")
    assert(cp.isFile, "checkpoint file missing")
    val lc = mapper.readTree(new java.io.File(s"$root/_delta_log/_last_checkpoint"))
    assert(lc.get("version").asLong() == 10L)
    // a Delta client's read path: checkpoint rows + JSON versions 11..12
    val cpDf = spark.read.parquet(cp.getPath)
    assert(cpDf.filter(col("protocol").isNotNull).count() == 1)
    val metaRows = cpDf.filter(col("metaData").isNotNull)
      .select("metaData.id", "metaData.schemaString").collect()
    assert(metaRows.length == 1 && metaRows(0).getString(1).contains("\"id\""))
    assert(lc.get("size").asLong() == cpDf.count())
    var files = cpDf.filter(col("add").isNotNull)
      .select("add.path", "add.size").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // checkpoint adds carry dataChange = false per the protocol
    assert(cpDf.filter(col("add").isNotNull).filter(col("add.dataChange")).count() == 0)
    (11L to 12L).foreach { v =>
      scala.io.Source.fromFile(s"$root/_delta_log/${"%020d".format(v)}.json")
        .getLines().filter(_.nonEmpty).foreach { line =>
          val n = mapper.readTree(line)
          if (n.has("add"))
            files += (n.get("add").get("path").asText() -> n.get("add").get("size").asLong())
          if (n.has("remove")) files -= n.get("remove").get("path").asText()
        }
    }
    assert(files == manifestFiles(root),
      "checkpoint + JSON tail must reconstruct the manifest file set")
    assertMirrored(root) // full-JSON replay unchanged by checkpointing
  }

  test("checkpoint metaData carries the translated CDF config key") {
    val root = tmpDir("dlm-cdf-cp")
    val t = new VersionedTable(spark, root)
    t.append(Seq((1, "a")).toDF("id", "s")) // v0
    t.setProperties(Map(VersionedTable.CdfProp -> "true")) // v1
    // push past the checkpoint interval: external CDF readers resolve
    // configuration from the checkpoint when no later metaData action is
    // in the JSON tail — the delta key must survive the translation there
    (1 to 10).foreach(i => t.append(Seq((10 + i, s"r$i")).toDF("id", "s")))
    val cp = new java.io.File(s"$root/_delta_log/${"%020d".format(10)}.checkpoint.parquet")
    assert(cp.isFile, "checkpoint file missing")
    val cfg = spark.read.parquet(cp.getPath)
      .filter(col("metaData").isNotNull)
      .select("metaData.configuration").collect()
    assert(cfg.length == 1)
    val m = cfg(0).getMap[String, String](0)
    assert(m.get("delta.enableChangeDataFeed").contains("true"),
      s"checkpoint config must carry the delta CDF key, got $m")
    assert(m.get(VersionedTable.CdfProp).contains("true")) // graft key kept too
  }

  test("delta.checkpoint.partSize: the mirror writes protocol multi-part checkpoints") {
    val root = tmpDir("dlm-multicp")
    val t = new VersionedTable(spark, root)
    t.append(Seq((0, "seed")).toDF("id", "s")) // v0
    t.setProperties(Map("delta.checkpoint.partSize" -> "4")) // v1
    (1 to 9).foreach(i => t.append(Seq((i, s"r$i")).toDF("id", "s"))) // ..v10
    val dlog = new java.io.File(s"$root/_delta_log")
    val names = dlog.listFiles().map(_.getName)
    assert(!names.contains("00000000000000000010.checkpoint.parquet"),
      "partSize table must not write the single-file form")
    val parts = names.filter(_.matches(
      """00000000000000000010\.checkpoint\.\d{10}\.\d{10}\.parquet""")).sorted
    assert(parts.length >= 2, s"expected multi-part checkpoint, got ${names.toSeq}")
    val lc = mapper.readTree(new java.io.File(s"$root/_delta_log/_last_checkpoint"))
    assert(lc.get("version").asLong() == 10L)
    assert(lc.get("parts").asInt() == parts.length)
    // an external reader's path: union of all parts = exactly one protocol
    // row, one metaData row, and the live file set
    val cpDf = spark.read.parquet(parts.map(p => s"$root/_delta_log/$p"): _*)
    assert(lc.get("size").asLong() == cpDf.count())
    assert(cpDf.filter(col("protocol").isNotNull).count() == 1)
    assert(cpDf.filter(col("metaData").isNotNull).count() == 1)
    val cpFiles = cpDf.filter(col("add").isNotNull)
      .select("add.path", "add.size").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cpFiles == manifestFiles(root),
      "multi-part checkpoint union must reconstruct the manifest file set")
    assertMirrored(root) // full-JSON replay unchanged by checkpointing
  }

  test("a mirror-only IO failure does not fail the committed write, and heals") {
    val root = tmpDir("dlm-iofail")
    val t = new VersionedTable(spark, root)
    t.append(Seq((1, "a")).toDF("id", "s"))
    // block the mirror: replace _delta_log with a plain FILE so every
    // emission under it fails, while the manifest log keeps working
    val dlog = new java.io.File(s"$root/_delta_log")
    dlog.listFiles().foreach(_.delete()); assert(dlog.delete())
    assert(dlog.createNewFile())
    // the table write must still succeed (manifest is the commit)
    t.append(Seq((2, "b")).toDF("id", "s"))
    assert(t.read().count() == 2)
    // unblock → the next commit re-emits the full missing chain
    assert(dlog.delete())
    t.append(Seq((3, "c")).toDF("id", "s"))
    assertMirrored(root)
    assert(replayDeltaLog(root)._3 == Seq(0L, 1L, 2L))
  }

  test("a healed v0 whose manifest was vacuumed still carries metaData") {
    val root = tmpDir("dlm-heal-v0")
    val t = new VersionedTable(spark, root)
    t.append(Seq((1, "a")).toDF("id", "s"))
    t.append(Seq((2, "b")).toDF("id", "s"))
    // simulate: mirror never ran (crashes before every publish) AND vacuum
    // already dropped the v0 manifest — the worst-case heal
    new java.io.File(s"$root/_delta_log").listFiles().foreach(_.delete())
    assert(new java.io.File(s"$root/_graft_log/v${"%010d".format(0)}.json").delete())
    val t2 = new VersionedTable(spark, root)
    t2.append(Seq((3, "c")).toDF("id", "s"))
    assertMirrored(root)
    // snapshot AT v0 (replay of only 00000000000000000000.json) must be
    // protocol-complete: protocol + metaData present
    val v0 = scala.io.Source.fromFile(s"$root/_delta_log/${"%020d".format(0)}.json")
      .getLines().filter(_.nonEmpty).map(mapper.readTree).toSeq
    assert(v0.exists(_.has("protocol")), "healed v0 must carry protocol")
    val md = v0.find(_.has("metaData")).map(_.get("metaData"))
    assert(md.nonEmpty, "healed v0 must carry metaData (time travel to v0)")
    assert(md.get.get("schemaString").asText().nonEmpty)
  }

  test("mirror heals a missing delta version on the next commit") {
    val root = tmpDir("dlm-heal")
    val t = new VersionedTable(spark, root)
    t.append(Seq((1, "a")).toDF("id", "s"))
    t.append(Seq((2, "b")).toDF("id", "s"))
    // simulate a crash between manifest publish and mirror publish
    val lost = new java.io.File(s"$root/_delta_log/${"%020d".format(1)}.json")
    assert(lost.delete())
    // a FRESH instance (cold cache) must re-emit v1 then v2
    val t2 = new VersionedTable(spark, root)
    t2.append(Seq((3, "c")).toDF("id", "s"))
    assertMirrored(root)
    val (live, _, versions) = replayDeltaLog(root)
    assert(versions == Seq(0L, 1L, 2L))
    assert(live.keys.size == manifestFiles(root).size)
  }
  test("CDF-enabled merges/deletes mirror real cdc actions + protocol (1,4)") {
    val path = tmpDir("dlm-cdf")
    val t = new VersionedTable(spark, path)
    t.append(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "k")) // v0
    t.setProperties(Map(VersionedTable.CdfProp -> "true")) // v1: CDF on
    t.merge(Seq((2L, 99L), (4L, 40L)).toDF("id", "k"), Seq("id")) // v2
    t.delete(col("id") === 1L) // v3

    def lines(v: Long): Seq[com.fasterxml.jackson.databind.JsonNode] =
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        path, "_delta_log", f"$v%020d.json")), "UTF-8")
        .split('\n').filter(_.nonEmpty).toSeq.map(mapper.readTree)

    // v1 carries the protocol upgrade (legacy CDF writer) and the
    // translated config key Delta clients look for
    val v1 = lines(1L)
    val proto = v1.find(_.has("protocol")).get.get("protocol")
    assert(proto.get("minReaderVersion").asInt == 1)
    assert(proto.get("minWriterVersion").asInt == 4)
    val cfg = v1.find(_.has("metaData")).get.get("metaData").get("configuration")
    assert(cfg.get("delta.enableChangeDataFeed").asText == "true")

    // the merge commit carries cdc actions pointing at the materialized
    // change files; a CDF reader uses those ALONE for this commit
    val v2cdc = lines(2L).filter(_.has("cdc")).map(_.get("cdc"))
    assert(v2cdc.nonEmpty)
    assert(v2cdc.forall(c => c.get("path").asText.startsWith("_change_data/")))
    assert(v2cdc.forall(c => !c.get("dataChange").asBoolean))
    // the referenced change parquet exists and holds the exact row changes
    val cdcPaths = v2cdc.map(c => s"$path/" + c.get("path").asText)
    val changes = spark.read.parquet(cdcPaths: _*)
    assert(changes.columns.contains(VersionedTable.ChangeTypeCol))
    val byType = changes.groupBy(VersionedTable.ChangeTypeCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map(
      "update_preimage" -> 1L, "update_postimage" -> 1L, "insert" -> 1L))

    // the DV delete commit ALSO carries its delete-row cdc actions, and
    // the mirror still reads correctly through the external reader
    val v3cdc = lines(3L).filter(_.has("cdc")).map(_.get("cdc"))
    assert(v3cdc.nonEmpty)
    val delChanges = spark.read.parquet(
      v3cdc.map(c => s"$path/" + c.get("path").asText): _*)
    assert(delChanges.select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    val ext = graft.store.DeltaTable.read(spark, path)
      .select("id", "k").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ext == Set((2L, 99L), (3L, 30L), (4L, 40L)))
    // protocol stays (1,4) — no DV reader feature is needed by the MIRROR
    // read path... unless DVs appeared, which this table's delete DID add:
    // the delete commit must therefore upgrade to (3,7) with BOTH features
    val v3proto = lines(3L).find(_.has("protocol")).map(_.get("protocol"))
    assert(v3proto.isDefined)
    assert(v3proto.get.get("minWriterVersion").asInt == 7)
    val wf = v3proto.get.get("writerFeatures").elements()
    val feats = scala.jdk.CollectionConverters.IteratorHasAsScala(wf)
      .asScala.map(_.asText).toSet
    assert(feats.contains("deletionVectors") && feats.contains("changeDataFeed"))
  }
}
