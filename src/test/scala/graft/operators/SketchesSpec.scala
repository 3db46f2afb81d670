package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Sketches.quantileSketch]] — binary-mantissa relative-error quantiles:
  * the estimate covers the true quantile from above within 2^-mantissaBits,
  * small values are exact, merging is partition-invariant, and negatives
  * refuse loudly. */
class SketchesSpec extends SparkSuite {
  import spark.implicits._

  private def exactQuantile(vs: Seq[Long], qPermille: Int): Long = {
    // the sketch's own rank rule on singleton buckets: first value whose
    // cumulative count * 1000 >= q * total
    val sorted = vs.sorted
    val total = vs.size.toLong
    sorted.zipWithIndex.collectFirst {
      case (v, i) if (i + 1) * 1000L >= qPermille * total => v
    }.get
  }

  test("weighted histogram: weight w ≡ the row repeated w times") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(400)((math.abs(rnd.nextLong()) % 100000L + 1L,
      rnd.nextInt(5).toLong + 1L))
    val weighted = rows.map { case (v, w) => ("g", v, w) }.toDF("g", "v", "w")
    val expanded = rows.flatMap { case (v, w) =>
      Seq.fill(w.toInt)(("g", v)) }.toDF("g", "v")
    val a = Sketches.quantileSketchOf(
      Sketches.quantileSketchHistogramWeighted(weighted, "g", "v", "w"),
      Seq(250, 500, 950)).collect().map(_.toSeq).toSet
    val b = Sketches.quantileSketch(expanded, "g", "v", Seq(250, 500, 950))
      .collect().map(_.toSeq).toSet
    assert(a == b)
    // non-positive weights refuse at execution time
    val bad = Seq(("g", 5L, 0L)).toDF("g", "v", "w")
    val e = intercept[Exception] {
      Sketches.quantileSketchHistogramWeighted(bad, "g", "v", "w").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("non-positive weight")))
  }

  test("estimate covers the true quantile within the relative bound") {
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(5000)(math.abs(rnd.nextLong()) % 100000000L + 1L)
    val df = vs.map(("g", _)).toDF("g", "v")
    for (k <- Seq(4, 6, 8)) {
      val got = Sketches.quantileSketch(df, "g", "v", Seq(500, 950, 990), k)
        .collect().map(r => r.getLong(1).toInt -> r.getLong(2)).toMap
      for (q <- Seq(500, 950, 990)) {
        val truth = exactQuantile(vs, q)
        val est = got(q)
        assert(est >= truth, s"k=$k q=$q: est $est below truth $truth")
        assert(est.toDouble <= truth * (1.0 + math.pow(2, -k)) + 1,
          s"k=$k q=$q: est $est over bound vs truth $truth")
      }
    }
  }

  test("values below 2^mantissaBits (and zero) are exact") {
    val vs: Seq[Long] = Seq(0L, 1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L, 55L)
    val df = vs.map(("g", _)).toDF("g", "v")
    val got = Sketches.quantileSketch(df, "g", "v", Seq(100, 500, 1000),
        mantissaBits = 6)
      .collect().map(r => r.getLong(1).toInt -> r.getLong(2)).toMap
    assert(got(100) == exactQuantile(vs, 100))
    assert(got(500) == exactQuantile(vs, 500))
    assert(got(1000) == 55L)
  }

  test("partition-invariant (mergeable): 1 vs 32 partitions identical") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(3000)((s"g${rnd.nextInt(3)}",
      math.abs(rnd.nextLong()) % 1000000L))
    val one = Sketches.quantileSketch(
      rows.toDF("g", "v").coalesce(1), "g", "v", Seq(500, 990))
      .collect().map(_.toSeq).toSet
    val many = Sketches.quantileSketch(
      rows.toDF("g", "v").repartition(32), "g", "v", Seq(500, 990))
      .collect().map(_.toSeq).toSet
    assert(one == many)
  }

  test("fold: split histograms through parquet serve the one-shot quantiles") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(4000)((s"g${rnd.nextInt(3)}",
      math.abs(rnd.nextLong()) % 5000000L))
    val (b1, b2) = rows.splitAt(1500)
    val oneShot = Sketches.quantileSketch(rows.toDF("g", "v"), "g", "v",
      Seq(500, 950, 990)).collect().map(_.toSeq).toSet
    val dir = tmpDir("qs-state")
    Sketches.quantileSketchHistogram(b1.toDF("g", "v"), "g", "v")
      .write.mode("overwrite").parquet(dir)
    val folded = Sketches.quantileSketchFold(spark.read.parquet(dir),
      Sketches.quantileSketchHistogram(b2.toDF("g", "v"), "g", "v"))
    val served = Sketches.quantileSketchOf(folded, Seq(500, 950, 990))
      .collect().map(_.toSeq).toSet
    assert(served == oneShot)
    // mismatched mantissaBits refuses (both stamps present in-memory)
    val e = intercept[IllegalArgumentException] {
      Sketches.quantileSketchFold(
        Sketches.quantileSketchHistogram(b1.toDF("g", "v"), "g", "v", 6),
        Sketches.quantileSketchHistogram(b2.toDF("g", "v"), "g", "v", 4))
    }
    assert(e.getMessage.contains("mantissaBits"))
    // shape refusal
    intercept[IllegalArgumentException] {
      Sketches.quantileSketchOf(b1.toDF("g", "v"), Seq(500))
    }
  }

  test("quantiles ingest batch: replay is a no-op (additive fold never double-counts)") {
    val dir = tmpDir("qspec-h")
    new java.io.File(dir).delete()
    def batch(rows: Seq[(String, Long)], id: Long): Unit =
      graft.streaming.StreamingIngest.quantilesIngestBatch(
        rows.toDF("g", "v"), id, "g", "v", 6, dir, "spec-app")
    batch(Seq(("a", 10L), ("a", 20L)), 0L)
    batch(Seq(("a", 30L)), 1L)
    def total() = new graft.store.VersionedTable(spark, dir).read()
      .agg(sum(col("cnt"))).head().getLong(0)
    assert(total() == 3L)
    batch(Seq(("a", 30L)), 1L) // foreachBatch retry: must not double-count
    assert(total() == 3L)
    val served = Sketches.quantileSketchOf(
      new graft.store.VersionedTable(spark, dir).read(), Seq(1000))
      .collect().head.getLong(2)
    assert(served == 30L) // max is exact below 2^6
  }

  test("negative values refuse loudly; contract refusals") {
    val e = intercept[Exception] {
      Sketches.quantileSketch(Seq(("g", -1L)).toDF("g", "v"),
        "g", "v", Seq(500)).collect()
    }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("quantileSketch")) ||
        mentions(t.getCause))
    assert(mentions(e))
    intercept[IllegalArgumentException] {
      Sketches.quantileSketch(Seq(("g", 1L)).toDF("g", "v"), "g", "v", Seq(0))
    }
    intercept[IllegalArgumentException] {
      Sketches.quantileSketch(Seq(("g", 1.5)).toDF("g", "v"), "g", "v", Seq(500))
    }
  }
}
