package graft.store

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Version-checksum sidecars ([[VersionChecksum]]): every foreign-writer
  * and mirror commit gets a `%020d.crc` whose accounting matches an
  * independent log replay; a crc that DISAGREES with the log makes the
  * read refuse loudly; junk crcs are ignored (advisory sidecar). */
class VersionChecksumSpec extends SparkSuite {
  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def foreignTable(root: String): Unit = {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val staging = tmpDir("crc-stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dataName = "part-00000-foreign.snappy.parquet"
    Files.copy(part.toPath, java.nio.file.Paths.get(root, dataName)): Unit
    val meta = """{"metaData":{"id":"crc-1","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${mapper.writeValueAsString(df.schema.json)},""" +
      """"partitionColumns":[],"configuration":{},"createdTime":1}}"""
    val add = s"""{"add":{"path":"$dataName","partitionValues":{},""" +
      s""""size":${new File(root, dataName).length()},"modificationTime":1,"dataChange":true}}"""
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json"),
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta, add)
        .mkString("\n").getBytes("UTF-8")): Unit
  }

  private def crcNode(root: String, v: Long) = {
    val p = new File(root, f"_delta_log/$v%020d.crc")
    assert(p.exists(), s"expected crc sidecar at $p")
    mapper.readTree(new String(Files.readAllBytes(p.toPath), "UTF-8"))
  }

  test("foreign commits write a crc that matches an independent replay") {
    val root = tmpDir("crc-fw")
    foreignTable(root)
    val t = new ForeignDeltaTable(spark, root)
    val v1 = t.append(Seq((3L, "c"), (4L, "d")).toDF("id", "v"))
    val v2 = t.append(Seq((5L, "e")).toDF("id", "v"))
    Seq(v1, v2).foreach { v =>
      val n = crcNode(root, v)
      val s = DeltaTable.snapshot(spark, root, versionAsOf = Some(v))
      assert(n.get("numFiles").asLong() == s.numFiles.toLong, s"numFiles v$v")
      assert(n.get("tableSizeBytes").asLong() == s.numBytes, s"tableSizeBytes v$v")
      assert(n.get("numMetadata").asLong() == 1L && n.get("numProtocol").asLong() == 1L)
      assert(n.get("metadata").get("schemaString").asText() == s.schema.json)
      assert(n.get("protocol").get("minReaderVersion").asInt() == s.minReaderVersion)
    }
    // the latest read verifies against its crc and passes
    assert(DeltaTable.read(spark, root).count() == 5L)
  }

  test("a crc disagreeing with the log makes the read refuse; junk is ignored") {
    val root = tmpDir("crc-bad")
    foreignTable(root)
    val t = new ForeignDeltaTable(spark, root)
    val v = t.append(Seq((3L, "c")).toDF("id", "v"))
    val crc = new File(root, f"_delta_log/$v%020d.crc")
    // Hadoop's LOCAL filesystem keeps a shadow checksum (.<name>.crc) for
    // every file it wrote; editing the crc behind its back would make the
    // read throw a ChecksumException instead of exercising verification.
    // Drop the shadow — the tamper scenario on a real store (S3/ABFS/HDFS)
    // has no such local artifact.
    def tamper(content: String): Unit = {
      Files.write(crc.toPath, content.getBytes("UTF-8")): Unit
      new File(root, f"_delta_log/.$v%020d.crc.crc").delete(): Unit
    }
    val good = new String(Files.readAllBytes(crc.toPath), "UTF-8")
    // doctor the accounting: claim one extra live file
    val doctored = good.replaceFirst(""""numFiles":(\d+)""", """"numFiles":99""")
    assert(doctored != good)
    tamper(doctored)
    val e = intercept[IllegalStateException](DeltaTable.snapshot(spark, root))
    assert(e.getMessage.contains("checksum mismatch"))
    // junk content is advisory-ignored, not fatal
    tamper("not json")
    assert(DeltaTable.read(spark, root).count() == 3L)
    // restore the true crc: verification passes again
    tamper(good)
    assert(DeltaTable.read(spark, root).count() == 3L)
  }

  test("DV delete's crc carries deletion-vector accounting") {
    val root = tmpDir("crc-dv")
    foreignTable(root)
    val t = new ForeignDeltaTable(spark, root)
    t.append(Seq((3L, "c"), (4L, "d")).toDF("id", "v"))
    val v = t.deleteWhere(col("id") === 2L, allowProtocolUpgrade = true)
    val n = crcNode(root, v)
    assert(n.get("numDeletionVectorsOpt").asLong() == 1L)
    assert(n.get("numDeletedRecordsOpt").asLong() == 1L)
    // tableSizeBytes stays the PHYSICAL live-file accounting (DV'd files
    // remain live adds) and must still match the replay
    val s = DeltaTable.snapshot(spark, root, versionAsOf = Some(v))
    assert(n.get("tableSizeBytes").asLong() == s.numBytes)
    assert(n.get("numFiles").asLong() == s.numFiles.toLong)
  }

  test("the mirror writes a crc per version that the external reader verifies") {
    val dir = tmpDir("crc-mir")
    val vt = new VersionedTable(spark, dir)
    vt.overwrite(Seq((1L, "x"), (2L, "y")).toDF("k", "v"))
    vt.append(Seq((3L, "z")).toDF("k", "v"))
    (0L to 1L).foreach { v =>
      val n = crcNode(dir, v)
      val s = DeltaTable.snapshot(spark, dir, versionAsOf = Some(v))
      assert(n.get("numFiles").asLong() == s.numFiles.toLong, s"numFiles v$v")
      assert(n.get("tableSizeBytes").asLong() == s.numBytes, s"bytes v$v")
      assert(n.get("metadata").get("schemaString").asText() == s.schema.json)
    }
    // the external read path itself verifies (snapshot() checks crc)
    assert(DeltaTable.read(spark, dir).count() == 3L)
  }

  test("expired crcs are cleaned up with their commits") {
    val root = tmpDir("crc-clean")
    foreignTable(root)
    val t = new ForeignDeltaTable(spark, root)
    // enough commits to cross the default checkpoint cadence so a floor exists
    (1 to 10).foreach(i => t.append(Seq((10L + i, s"r$i")).toDF("id", "v")))
    val removed = t.cleanupMetadata(retentionMs = Some(-1L))
    assert(removed.exists(_.endsWith(".crc")),
      s"expected expired crc sidecars in cleanup, got $removed")
    // the surviving tail still reads (and still verifies its crc)
    assert(DeltaTable.read(spark, root).count() == 12L)
  }
}
