package graft.store

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming FROM a foreign Delta table through the auto-detecting
  * `graft-table` source: snapshot + incremental appends, OPTIMIZE
  * transparency (dataChange=false), DV-delete refusal, the log-cleaned
  * guard, and CDF mode (`readChangeFeed=true` — exact row-level changes
  * via [[DeltaTable.readChanges]], cdc deletes included). */
class DeltaStreamSpec extends SparkSuite {
  import spark.implicits._

  private def rm(path: String): Unit = {
    def loop(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(loop)
      f.delete(): Unit
    }
    loop(new File(path))
  }

  private def foreignTable(root: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val staging = tmpDir("dss-stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dataName = "part-00000-foreign.snappy.parquet"
    Files.copy(part.toPath, java.nio.file.Paths.get(root, dataName)): Unit
    rm(staging)
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val meta = s"""{"metaData":{"id":"dss-1","format":{"provider":"parquet","options":{}},""" +
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

  private def drain(src: String, sink: String, ckpt: String): Seq[Long] = {
    val q = spark.readStream.format("graft-table").option("path", src).load()
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(sink).select("id").as[Long].collect().sorted.toSeq
  }

  test("foreign table: snapshot, then each writer append streams once") {
    val root = tmpDir("dss-app"); val sink = tmpDir("dss-appsink") + "/out"
    val ckpt = tmpDir("dss-appckpt")
    foreignTable(root, (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s"))
    val t = new ForeignDeltaTable(spark, root)
    t.append((10L until 15L).map(i => (i, s"r$i")).toDF("id", "s")) // v1
    assert(drain(root, sink, ckpt) == (0L until 15L))
    t.append((15L until 20L).map(i => (i, s"r$i")).toDF("id", "s")) // v2
    assert(drain(root, sink, ckpt) == (0L until 20L))
    assert(drain(root, sink, ckpt) == (0L until 20L)) // no dupes
  }

  test("foreign OPTIMIZE streams nothing; DV delete refuses cleanly") {
    val root = tmpDir("dss-opt"); val sink = tmpDir("dss-optsink") + "/out"
    val ckpt = tmpDir("dss-optckpt")
    foreignTable(root, (0L until 6L).map(i => (i, i % 3)).toDF("id", "k"))
    val t = new ForeignDeltaTable(spark, root)
    (0 until 3).foreach(i => t.append(Seq((10L + i, 0L)).toDF("id", "k")))
    assert(drain(root, sink, ckpt).size == 9)
    t.optimize() // dataChange=false rewrite of all 4 small files
    t.append(Seq((100L, 0L)).toDF("id", "k"))
    assert(drain(root, sink, ckpt).size == 10) // nothing resurfaced
    // a DV delete is a rewrite (remove+re-add) → refuse without the flag
    t.deleteWhere(col("k") === 1, allowProtocolUpgrade = true)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(root, sink, ckpt)
    }
    assert(e.getCause.getMessage.contains("ignoreChanges"))
  }

  test("log-cleaned commit below the stream position fails loudly") {
    val root = tmpDir("dss-gap"); val sink = tmpDir("dss-gapsink") + "/out"
    val ckpt = tmpDir("dss-gapckpt")
    foreignTable(root, (0L until 5L).map(i => (i, s"r$i")).toDF("id", "s"))
    val t = new ForeignDeltaTable(spark, root)
    assert(drain(root, sink, ckpt).size == 5)
    t.append(Seq((10L, "x")).toDF("id", "s")) // v1
    t.append(Seq((11L, "y")).toDF("id", "s")) // v2
    new File(root, "_delta_log/00000000000000000001.json").delete()
    // fails loudly — either at stream setup (snapshot resolution rejects
    // the non-contiguous log) or in getBatch (the source's own guard)
    val e = intercept[Exception] { drain(root, sink, ckpt) }
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("log-cleaned") || msg.toLowerCase.contains("missing") ||
      msg.toLowerCase.contains("contiguous") || msg.contains("commit"))
  }

  test("foreign CDF mode streams exact row-level changes incl. cdc deletes") {
    val root = tmpDir("dss-cdf"); val sink = tmpDir("dss-cdfsink") + "/out"
    val ckpt = tmpDir("dss-cdfckpt")
    // CDF-enabled foreign fixture: the legacy CDF protocol + config key
    foreignTable(root, (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s"))
    val v0 = java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json")
    Files.write(v0, new String(Files.readAllBytes(v0), "UTF-8")
      .replace(""""minWriterVersion":2""", """"minWriterVersion":4""")
      .replace(""""configuration":{}""",
        """"configuration":{"delta.enableChangeDataFeed":"true"}""")
      .getBytes("UTF-8")): Unit
    def drainCdf(): Set[(Long, String, Long)] = {
      val q = spark.readStream.format("graft-table")
        .option("path", root).option("readChangeFeed", "true").load()
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(sink)
        .select(col("id"), col("_change_type"), col("__commit_version"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    }
    // batch 1: v0's add derives as inserts
    assert(drainCdf() == (0L until 10L).map(i => (i, "insert", 0L)).toSet)
    val t = new ForeignDeltaTable(spark, root)
    t.append((10L until 15L).map(i => (i, s"r$i")).toDF("id", "s")) // v1
    t.deleteWhere(col("id") < 3, allowProtocolUpgrade = true) // v2: cdc
    // batch 2: exactly v1's inserts + v2's cdc delete rows, no resurfacing
    assert(drainCdf() ==
      (0L until 10L).map(i => (i, "insert", 0L)).toSet ++
        (10L until 15L).map(i => (i, "insert", 1L)).toSet ++
        (0L until 3L).map(i => (i, "delete", 2L)).toSet)
  }

  test("deltaSinkStream: txn-backed sink no-ops a replayed micro-batch") {
    val srcDir = tmpDir("dss-sink-src")
    val tbl = tmpDir("dss-sink-tbl")
    val ckpt = tmpDir("dss-sink-ckpt") + "/c"
    foreignTable(tbl, Seq((0L, "seed")).toDF("id", "s")) // v0
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .coalesce(1).write.mode("append").parquet(srcDir)
    def run(): Unit = {
      val in = spark.readStream
        .schema(Seq((1L, "a")).toDF("id", "s").schema).parquet(srcDir)
      graft.streaming.StreamingIngest.deltaSinkStream(
        spark, in, tbl, "sinkA", ckpt): Unit
    }
    run() // batch 0 lands
    assert(DeltaTable.read(spark, tbl).count() == 3L)
    assert(DeltaTable.latestTxnVersion(spark, tbl, "sinkA").contains(0L))
    // crash-between-sink-and-stream-commit: the stream recorded its offsets
    // but not the commit, so restart RE-RUNS batch 0 with the same batchId;
    // the table's txn watermark must swallow the replay
    val commit0 = new File(s"$ckpt/commits/0")
    assert(commit0.exists, "commit marker expected")
    commit0.delete(): Unit
    new File(s"$ckpt/commits/.0.crc").delete(): Unit
    run()
    assert(DeltaTable.read(spark, tbl).count() == 3L, "replay double-applied")
    // new data continues as batch 1
    Seq((3L, "c")).toDF("id", "s").coalesce(1).write.mode("append").parquet(srcDir)
    run()
    assert(DeltaTable.read(spark, tbl).select("id").as[Long].collect().sorted.toSeq
      == Seq(0L, 1L, 2L, 3L))
    assert(DeltaTable.latestTxnVersion(spark, tbl, "sinkA").contains(1L))
  }

  test("foreign source honors maxCommitsPerTrigger; AvailableNow drains fully") {
    val root = tmpDir("dss-rate"); val sink = tmpDir("dss-ratesink") + "/out"
    val ckpt = tmpDir("dss-rateckpt")
    foreignTable(root, (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s"))
    val t = new ForeignDeltaTable(spark, root)
    (1 to 4).foreach(v =>
      t.append((v * 10L until v * 10L + 10).map(i => (i, s"r$i")).toDF("id", "s")))
    val q = spark.readStream.format("graft-table").option("path", root)
      .option("startingVersion", "0").option("maxCommitsPerTrigger", "2")
      .load()
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // 5 commits (v0..v4) at cap 2 → 20+20+10 rows over 3 micro-batches
    assert(q.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0) ==
      Seq(20L, 20L, 10L))
    assert(spark.read.parquet(sink).select("id").as[Long].collect().sorted.toSeq
      == (0L until 50L))
  }
}
