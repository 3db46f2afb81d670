package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Sketches.countMinState]] family — count-min frequency sketch: the
  * point estimate never undercounts, is exact when the sketch is sparse,
  * merging is partition-invariant, the fold is additive, and contract
  * violations refuse loudly. */
class CountMinSpec extends SparkSuite {
  import spark.implicits._

  private val D = 4
  private val W = 1024

  private def md5Hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  // items with known multiplicities: item i appears i times
  private def corpus(n: Int) =
    (1 to n).flatMap(i => Seq.fill(i)((s"item$i", md5Hash60(s"item$i"))))
      .toDF("item", "h")

  private def probes(n: Int) =
    (1 to n).map(i => (s"item$i", md5Hash60(s"item$i"), i.toLong))
      .toDF("item", "h", "true_cnt")

  test("estimates never undercount; sparse sketch is exact") {
    val st = Sketches.countMinState(corpus(50), "h", D, W)
    val got = Sketches.countMinLookup(st, probes(50), "h", D, W)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    got.foreach { case (item, truth, est) =>
      assert(est >= truth, s"$item undercounted: $est < $truth")
    }
    // 50 distinct items in 4x1024 cells: collisions are possible but the
    // MIN over 4 independent rows must be exact here (expected collisions
    // per row ~2%, across all 4 rows ~0 — and the family is fixed, so
    // this is a deterministic regression check, not a flaky one)
    got.foreach { case (item, truth, est) =>
      assert(est == truth, s"$item inexact in sparse sketch: $est != $truth")
    }
  }

  test("an absent probe reads 0") {
    val st = Sketches.countMinState(corpus(10), "h", D, W)
    val ghost = Seq(("nope", md5Hash60("definitely-absent"), 0L))
      .toDF("item", "h", "true_cnt")
    val est = Sketches.countMinLookup(st, ghost, "h", D, W)
      .collect().head.getLong(3)
    assert(est == 0L)
  }

  test("partition-invariant: 1 vs 32 partitions produce identical cells") {
    val one = Sketches.countMinState(corpus(80).coalesce(1), "h", D, W)
      .collect().map(_.toSeq).toSet
    val many = Sketches.countMinState(corpus(80).repartition(32), "h", D, W)
      .collect().map(_.toSeq).toSet
    assert(one == many)
  }

  test("fold adds: split state ≡ one-shot; double-fold doubles") {
    val c = corpus(60)
    val a = Sketches.countMinState(c.filter(col("h") % 2 === 0), "h", D, W)
    val b = Sketches.countMinState(c.filter(col("h") % 2 === 1), "h", D, W)
    val folded = Sketches.countMinFold(a, b).collect().map(_.toSeq).toSet
    val oneShot = Sketches.countMinState(c, "h", D, W)
      .collect().map(_.toSeq).toSet
    assert(folded == oneShot)
    // additive NOT idempotent: re-folding b doubles b's cells — the
    // documented reason replay protection is the ingest's job
    val twice = Sketches.countMinFold(Sketches.countMinFold(a, b), b)
    val est = Sketches.countMinLookup(twice, probes(60), "h", D, W)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert((1 to 60).exists(i => est(s"item$i") > i.toLong))
  }

  test("nulls are skipped; out-of-range hashes refuse at execution time") {
    val withNull = Seq(("a", Option(md5Hash60("a"))), ("b", Option.empty[Long]))
      .toDF("item", "h")
    val st = Sketches.countMinState(withNull, "h", D, W)
    assert(st.agg(sum("cnt")).head().getLong(0) == D.toLong)
    val bad = Seq(("x", -3L)).toDF("item", "h")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      Sketches.countMinState(bad, "h", D, W).collect()
    }
    assert(msgs(e).exists(_.contains("graft countMin")))
    // a probe outside the hash domain can only read a wrong 0 — it refuses
    val st2 = Sketches.countMinState(corpus(5), "h", D, W)
    val e2 = intercept[Exception] {
      Sketches.countMinLookup(st2,
        bad.withColumn("true_cnt", lit(0L)), "h", D, W).collect()
    }
    assert(msgs(e2).exists(_.contains("probe hash outside")))
  }

  test("maintainer replay is guarded: a re-delivered batch does not double-count") {
    val root = java.nio.file.Files.createTempDirectory("cm-replay")
    val dir = root.toString + "/tbl"
    val b0 = corpus(30).select("h")
    val b1 = corpus(50).filter(col("h") % 2 === 0).select("h")
    def served = Sketches.countMinLookup(
      new graft.store.VersionedTable(spark, dir).read(),
      probes(50), "h", D, W)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    graft.streaming.StreamingIngest.countMinIngestBatch(
      b0, 0L, "h", D, W, dir, "app")
    graft.streaming.StreamingIngest.countMinIngestBatch(
      b1, 1L, "h", D, W, dir, "app")
    val after = served
    // at-least-once redelivery of batch 1: the additive fold MUST be
    // skipped via txnApplied — re-folding would double b1's cells
    graft.streaming.StreamingIngest.countMinIngestBatch(
      b1, 1L, "h", D, W, dir, "app")
    assert(served == after)
  }

  test("geometry violations refuse at plan time") {
    val df = Seq(("a", 1L)).toDF("item", "h")
    intercept[IllegalArgumentException] {
      Sketches.countMinState(df, "h", depth = 0, width = W)
    }
    intercept[IllegalArgumentException] {
      Sketches.countMinState(df, "h", depth = 9, width = W)
    }
    intercept[IllegalArgumentException] {
      Sketches.countMinState(df, "h", D, width = 8)
    }
    val sA = Sketches.countMinState(df, "h", D, W)
    val sB = Sketches.countMinState(df, "h", D, 2048)
    intercept[IllegalArgumentException] { Sketches.countMinFold(sA, sB) }
    intercept[IllegalArgumentException] {
      Sketches.countMinLookup(sA, df, "h", D, 2048)
    }
  }
}
