package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Temporal.gapFill]] — dense-grid resample: LOCF and integer-linear
  * fills are exact on hand-built series, the latest observation wins a
  * bucket deterministically, the span never extends past the last
  * observation, and contract violations refuse loudly. */
class GapFillSpec extends SparkSuite {
  import spark.implicits._

  // (key, ts, event_id, value); bucketWidth 10 → buckets = ts/10
  private def series(rows: (String, Long, Long, Long)*) =
    rows.toDF("k", "ts", "eid", "v")

  private def run(df: org.apache.spark.sql.DataFrame, mode: String) =
    Temporal.gapFill(df, "k", "ts", "v", "eid", bucketWidth = 10L, mode = mode)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(t => (t._1, t._2))

  test("LOCF fills every missing bucket with the last observed value") {
    val df = series(("a", 5L, 1L, 100L), ("a", 35L, 2L, 700L),
      ("b", 10L, 3L, 42L))
    assert(run(df, "locf").toSeq == Seq(
      ("a", 0L, 100L, true), ("a", 1L, 100L, false), ("a", 2L, 100L, false),
      ("a", 3L, 700L, true),
      ("b", 1L, 42L, true)))
  }

  test("linear interpolates toward the next value, integer-exactly") {
    // a: 100 at bucket 0, 700 at bucket 3 → step (600*r) DIV 3: 100, 300, 500, 700
    // c: descending 90 → 50 over 4: 90 - (40*r) DIV 4 = 90, 80, 70, 60, 50
    val df = series(("a", 5L, 1L, 100L), ("a", 35L, 2L, 700L),
      ("c", 0L, 4L, 90L), ("c", 40L, 5L, 50L))
    assert(run(df, "linear").toSeq == Seq(
      ("a", 0L, 100L, true), ("a", 1L, 300L, false), ("a", 2L, 500L, false),
      ("a", 3L, 700L, true),
      ("c", 0L, 90L, true), ("c", 1L, 80L, false), ("c", 2L, 70L, false),
      ("c", 3L, 60L, false), ("c", 4L, 50L, true)))
  }

  test("linear truncation: non-divisible steps round toward the base") {
    // 0 → 10 over 3 buckets: (10*1) DIV 3 = 3, (10*2) DIV 3 = 6
    val up = series(("a", 0L, 1L, 0L), ("a", 30L, 2L, 10L))
    assert(run(up, "linear").map(_._3).toSeq == Seq(0L, 3L, 6L, 10L))
    // descending: 10 → 0: 10 - 3, 10 - 6 (sign factored, magnitude same)
    val down = series(("a", 0L, 1L, 10L), ("a", 30L, 2L, 0L))
    assert(run(down, "linear").map(_._3).toSeq == Seq(10L, 7L, 4L, 0L))
  }

  test("latest observation wins a bucket (ts, then tieBreak)") {
    val df = series(("a", 3L, 1L, 111L), ("a", 7L, 2L, 222L), // later ts wins
      ("b", 5L, 9L, 333L), ("b", 5L, 10L, 444L)) // same ts: larger eid wins
    val got = run(df, "locf")
    assert(got.toSeq == Seq(("a", 0L, 222L, true), ("b", 0L, 444L, true)))
  }

  test("span is per key: no fill before first or past last observation") {
    val df = series(("a", 100L, 1L, 5L), ("b", 0L, 2L, 6L), ("b", 20L, 3L, 7L))
    val got = run(df, "locf")
    assert(got.count(_._1 == "a") == 1)
    assert(got.filter(_._1 == "b").map(_._2).toSeq == Seq(0L, 1L, 2L))
  }

  test("negative timestamps bucket by floor division (pre-epoch exact)") {
    val df = series(("a", -25L, 1L, 1L), ("a", 5L, 2L, 2L))
    // -25/10 floors to -3; 5/10 → 0 → buckets -3..-1 carry 1, bucket 0 has 2
    assert(run(df, "locf").toSeq == Seq(("a", -3L, 1L, true),
      ("a", -2L, 1L, false), ("a", -1L, 1L, false), ("a", 0L, 2L, true)))
  }

  test("a gap wider than the budget refuses loudly at execution time") {
    val df = series(("a", 0L, 1L, 1L),
      ("a", (Temporal.GapFillMaxGap + 2) * 10L, 2L, 2L))
    val e = intercept[Exception] { run(df, "locf") }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("replication budget")))
  }

  test("frontier continuation ≡ one-shot (LOCF and linear, across the boundary)") {
    // early: a@b0=100, a@b2=300; late: a@b5=900, b@b6=10 (new key)
    val early = series(("a", 5L, 1L, 100L), ("a", 25L, 2L, 300L))
    val late = series(("a", 55L, 3L, 900L), ("b", 65L, 4L, 10L))
    val all = early.unionByName(late)
    for (mode <- Seq("locf", "linear")) {
      val frontier = Temporal.gapFillFrontier(early, "k", "ts", "v", "eid", 10L)
      val got = Temporal.gapFill(early, "k", "ts", "v", "eid", 10L, mode)
        .unionByName(Temporal.gapFillContinue(frontier, late,
          "k", "ts", "v", "eid", 10L, mode))
        .collect().map(_.toSeq).toSet
      val oneShot = Temporal.gapFill(all, "k", "ts", "v", "eid", 10L, mode)
        .collect().map(_.toSeq).toSet
      assert(got == oneShot, s"mode=$mode")
    }
  }

  test("frontier fold is idempotent and picks the later observation") {
    val early = series(("a", 5L, 1L, 100L))
    val late = series(("a", 55L, 3L, 900L))
    val f0 = Temporal.gapFillFrontier(early, "k", "ts", "v", "eid", 10L)
    val once = Temporal.gapFillFrontierFold(f0, late, "k", "ts", "v", "eid", 10L)
    val twice = Temporal.gapFillFrontierFold(once, late, "k", "ts", "v", "eid", 10L)
    assert(once.collect().map(_.toSeq).toSet == twice.collect().map(_.toSeq).toSet)
    val r = once.collect().head
    assert(r.getLong(1) == 5L && r.getLong(4) == 900L) // bucket 5, v 900
  }

  test("a batch observation in or before the served frontier bucket refuses") {
    val early = series(("a", 25L, 2L, 300L))
    val frontier = Temporal.gapFillFrontier(early, "k", "ts", "v", "eid", 10L)
    val sameBucket = series(("a", 29L, 9L, 500L)) // bucket 2 == frontier bucket
    val e = intercept[Exception] {
      Temporal.gapFillContinue(frontier, sameBucket,
        "k", "ts", "v", "eid", 10L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("already served")))
    // a mismatched grid stamp refuses at plan time
    intercept[IllegalArgumentException] {
      Temporal.gapFillContinue(frontier, sameBucket, "k", "ts", "v", "eid", 20L)
    }
  }

  test("maintainer: batch replay is skipped via the frontier watermark") {
    val root = java.nio.file.Files.createTempDirectory("gf-replay")
    val frDir = root.toString + "/frontier"
    val flDir = root.toString + "/fills"
    val b0 = series(("a", 5L, 1L, 100L), ("a", 25L, 2L, 300L))
    val b1 = series(("a", 55L, 3L, 900L))
    def fills = new graft.store.VersionedTable(spark, flDir).read()
      .collect().map(_.toSeq).toSet
    graft.streaming.StreamingIngest.gapFillIngestBatch(b0, 0L,
      "k", "ts", "v", "eid", 10L, "locf", frDir, flDir, "app")
    graft.streaming.StreamingIngest.gapFillIngestBatch(b1, 1L,
      "k", "ts", "v", "eid", 10L, "locf", frDir, flDir, "app")
    val after = fills
    // a full replay of batch 1 must be SKIPPED before the continuation
    // runs — against the advanced frontier it would trip the
    // strictly-after refusal (the r15 fold-replay class), and its append
    // would duplicate fill rows
    graft.streaming.StreamingIngest.gapFillIngestBatch(b1, 1L,
      "k", "ts", "v", "eid", 10L, "locf", frDir, flDir, "app")
    assert(fills == after)
    // and the accumulated fills equal the one-shot grid over everything
    val oneShot = Temporal.gapFill(b0.unionByName(b1),
      "k", "ts", "v", "eid", 10L, "locf").collect().map(_.toSeq).toSet
    assert(after == oneShot)
  }

  test("contract violations refuse at plan time") {
    val df = series(("a", 0L, 1L, 1L))
    intercept[IllegalArgumentException] {
      Temporal.gapFill(df, "k", "ts", "v", "eid", bucketWidth = 0L)
    }
    intercept[IllegalArgumentException] {
      Temporal.gapFill(df, "k", "ts", "v", "eid", 10L, mode = "spline")
    }
    intercept[IllegalArgumentException] {
      Temporal.gapFill(df.withColumn("vd", col("v").cast("double")),
        "k", "ts", "vd", "eid", 10L)
    }
    intercept[IllegalArgumentException] {
      Temporal.gapFill(df.withColumn("__x", lit(1)), "k", "ts", "v", "eid", 10L)
    }
  }
}
