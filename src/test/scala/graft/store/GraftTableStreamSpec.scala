package graft.store

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** The graft-table STREAMING SOURCE: initial snapshot, incremental
  * commits-as-batches, optimize transparency, and the append-only contract
  * (merge/delete refusals + the documented ignore options). */
class GraftTableStreamSpec extends SparkSuite {

  private def table(path: String): VersionedTable = new VersionedTable(spark, path)

  /** Drain everything currently available into a parquet sink; returns the
    * sink rows. */
  private def drain(src: String, sink: String, ckpt: String,
      opts: Map[String, String] = Map.empty): Seq[(Long, Long)] = {
    val reader = spark.readStream.format("graft-table").option("path", src)
    val q = opts.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(sink).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
  }

  test("initial snapshot, then each append streams exactly once") {
    val src = tmpDir("gts-src"); val sink = tmpDir("gts-sink") + "/out"
    val ckpt = tmpDir("gts-ckpt")
    val t = table(src)
    t.append(spark.range(0, 10).select(col("id"), (col("id") % 3).as("k")))
    t.append(spark.range(10, 20).select(col("id"), (col("id") % 3).as("k")))
    // initial snapshot: both commits' rows in one batch
    assert(drain(src, sink, ckpt).map(_._1) == (0L until 20L))
    // two more commits stream incrementally (same checkpoint)
    t.append(spark.range(20, 25).select(col("id"), (col("id") % 3).as("k")))
    t.append(spark.range(25, 30).select(col("id"), (col("id") % 3).as("k")))
    assert(drain(src, sink, ckpt).map(_._1) == (0L until 30L))
    // no new commits → no new rows
    assert(drain(src, sink, ckpt).map(_._1) == (0L until 30L))
  }

  test("optimize commits stream nothing (no duplicated rewrites)") {
    val src = tmpDir("gts-opt"); val sink = tmpDir("gts-optsink") + "/out"
    val ckpt = tmpDir("gts-optckpt")
    val t = table(src)
    t.append(spark.range(0, 10).select(col("id"), lit(0L).as("k")))
    assert(drain(src, sink, ckpt).size == 10)
    t.optimize() // rewrites all rows into one dir — dataChange=false
    t.append(spark.range(10, 12).select(col("id"), lit(0L).as("k")))
    val got = drain(src, sink, ckpt)
    assert(got.size == 12) // the 10 optimize-rewritten rows did NOT resurface
  }

  test("merge refuses without ignoreChanges; with it, the rewrite streams") {
    val src = tmpDir("gts-mrg"); val sink = tmpDir("gts-mrgsink") + "/out"
    val ckpt = tmpDir("gts-mrgckpt")
    val t = table(src)
    t.append(spark.range(0, 10).select(col("id"), col("id").as("k")))
    assert(drain(src, sink, ckpt).size == 10)
    t.merge(spark.range(5, 8).select(col("id"), (col("id") + 100).as("k")),
      Seq("id"))
    // the merge commit is INCREMENTAL for the existing checkpoint → refuse
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(src, sink, ckpt)
    }
    assert(e.getCause.getMessage.contains("ignoreChanges"))
    // with the flag, the rewritten dir streams whole (updated AND
    // carried-over rows resurface — the documented ignoreChanges caveat):
    // the merge touched ONE dir of 10 rows and added 3 updates
    val got = drain(src, sink, ckpt, Map("ignoreChanges" -> "true"))
    assert(got.count(_._2 >= 100) == 3)
    assert(got.size == 10 + 10) // snapshot + the whole rewritten dir
  }

  test("CDF mode streams exact row-level changes across merge and delete") {
    val src = tmpDir("gts-cdf"); val sink = tmpDir("gts-cdfsink") + "/out"
    val ckpt = tmpDir("gts-cdfckpt")
    val t = table(src)
    t.append(spark.range(0, 10).select(col("id"), col("id").as("k"))) // v0
    t.setProperties(Map(VersionedTable.CdfProp -> "true")) // v1
    def drainCdf(): Seq[(Long, String)] = {
      val q = spark.readStream.format("graft-table")
        .option("path", src).option("readChangeFeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(sink)
        .select(col("id"), col(VersionedTable.ChangeTypeCol))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    }
    // initial CDF batch: the v0 append as inserts
    assert(drainCdf() == (0L until 10L).map(_ -> "insert"))
    // a CDF merge streams exact pre/post pairs + inserts — NO flags needed
    t.merge(spark.range(8, 12).select(col("id"), (col("id") + 100).as("k")),
      Seq("id")) // v2: updates 8,9; inserts 10,11
    val afterMerge = drainCdf()
    assert(afterMerge.count(_._2 == "update_preimage") == 2)
    assert(afterMerge.count(_._2 == "update_postimage") == 2)
    assert(afterMerge.count(_._2 == "insert") == 12) // 10 initial + 2 new
    // a CDF delete streams its delete rows
    t.delete(col("id") < 2) // v3
    val afterDelete = drainCdf()
    assert(afterDelete.filter(_._2 == "delete").map(_._1) == Seq(0L, 1L))
  }

  test("startingVersion skips the initial snapshot in plain mode") {
    val src = tmpDir("gts-sv"); val sink = tmpDir("gts-svsink") + "/out"
    val ckpt = tmpDir("gts-svckpt")
    val t = table(src)
    t.append(spark.range(0, 10).select(col("id"), lit(0L).as("k"))) // v0
    t.append(spark.range(10, 15).select(col("id"), lit(0L).as("k"))) // v1
    val got = drain(src, sink, ckpt, Map("startingVersion" -> "1"))
    assert(got.map(_._1) == (10L until 15L)) // v0's rows skipped
  }

  test("DV delete refuses without ignoreDeletes; with it, streams nothing") {
    val src = tmpDir("gts-del"); val sink = tmpDir("gts-delsink") + "/out"
    val ckpt = tmpDir("gts-delckpt")
    val t = table(src)
    t.append(spark.range(0, 10).select(col("id"), (col("id") % 2).as("k")))
    assert(drain(src, sink, ckpt).size == 10)
    t.delete(col("k") === 1)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(src, sink, ckpt)
    }
    // ignoreDeletes skips the delete commit; a later append still streams.
    // (The failed run left a PENDING offsets-log entry at the delete
    // commit; the next AvailableNow run recovers exactly that batch — now
    // empty under ignoreDeletes — and ends its window there, so the append
    // lands on the run after: standard V1 recovery semantics.)
    t.append(spark.range(10, 13).select(col("id"), lit(0L).as("k")))
    drain(src, sink, ckpt, Map("ignoreDeletes" -> "true"))
    val got = drain(src, sink, ckpt, Map("ignoreDeletes" -> "true"))
    assert(got.map(_._1) == (0L until 13L)) // sink is append-only: old rows stay
  }

  /** Like [[drain]] but returns the non-empty micro-batch row counts, so
    * admission control is observable. */
  private def drainCounts(src: String, sink: String, ckpt: String,
      opts: Map[String, String]): Seq[Long] = {
    val reader = spark.readStream.format("graft-table").option("path", src)
    val q = opts.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
  }

  test("maxCommitsPerTrigger bounds each micro-batch; AvailableNow still drains fully") {
    val src = tmpDir("gts-rate"); val sink = tmpDir("gts-ratesink") + "/out"
    val ckpt = tmpDir("gts-rateckpt")
    val t = table(src)
    (0 until 5).foreach(i =>
      t.append(spark.range(i * 10L, i * 10L + 10).select(col("id"), lit(i.toLong).as("k"))))
    // startingVersion=0 → commits stream individually; cap 2 → 2+2+1
    val batches = drainCounts(src, sink, ckpt,
      Map("startingVersion" -> "0", "maxCommitsPerTrigger" -> "2"))
    assert(batches == Seq(20L, 20L, 10L))
    assert(spark.read.parquet(sink).count() == 50L)
    // the rate limit persists across runs: 3 more commits, cap 1 → 1+1+1,
    // resuming from the checkpointed position (no row re-delivered)
    (5 until 8).foreach(i =>
      t.append(spark.range(i * 10L, i * 10L + 10).select(col("id"), lit(i.toLong).as("k"))))
    val batches2 = drainCounts(src, sink, ckpt,
      Map("startingVersion" -> "0", "maxCommitsPerTrigger" -> "1"))
    assert(batches2 == Seq(10L, 10L, 10L))
    assert(spark.read.parquet(sink).collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 80L))
  }

  test("maxCommitsPerTrigger: plain initial snapshot is one uncapped unit") {
    val src = tmpDir("gts-rate2"); val sink = tmpDir("gts-rate2sink") + "/out"
    val ckpt = tmpDir("gts-rate2ckpt")
    val t = table(src)
    (0 until 4).foreach(i =>
      t.append(spark.range(i * 10L, i * 10L + 10).select(col("id"), lit(i.toLong).as("k"))))
    // no startingVersion: the first batch is the whole snapshot (40 rows)
    // regardless of the cap; later commits then cap at 1 each
    assert(drainCounts(src, sink, ckpt, Map("maxCommitsPerTrigger" -> "1")) ==
      Seq(40L))
    (4 until 6).foreach(i =>
      t.append(spark.range(i * 10L, i * 10L + 10).select(col("id"), lit(i.toLong).as("k"))))
    assert(drainCounts(src, sink, ckpt, Map("maxCommitsPerTrigger" -> "1")) ==
      Seq(10L, 10L))
  }
}
