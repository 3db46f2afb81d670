package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Sketches.robustOutlierFences]] and [[Temporal.changeRatio]] — the
  * drift/anomaly census pair: fences and counts are integer-exact on known
  * quartiles; the two-window ratio detects a level shift, handles series
  * gaps by value frames, and nulls out on empty trails. */
class DriftSpec extends SparkSuite {
  import spark.implicits._

  test("outlier fences: known quartiles, exact counts either side") {
    // values 1..100 plus outliers 500/600 (102 rows; mantissaBits 6 keeps
    // 1..100 in singleton buckets → the rank rule is exact): q250 = 26th
    // value = 26 (cum·1000 ≥ 250·102), q750 = 77, IQR = 51,
    // step = (1500·51) DIV 1000 = 76 → fences -50 / 153
    val vs = (1L to 100L) ++ Seq(500L, 600L)
    val df = vs.map(("g", _)).toDF("g", "v")
    val r = Sketches.robustOutlierFences(df, "g", "v",
      lowPermille = 250, highPermille = 750, fencePermille = 1500L,
      mantissaBits = 6).collect().head
    assert(r.getLong(1) == 26L && r.getLong(2) == 77L)
    assert(r.getLong(3) == -50L && r.getLong(4) == 153L)
    assert(r.getLong(5) == 0L) // n_below
    assert(r.getLong(6) == 2L) // n_above: 500, 600
    assert(r.getLong(7) == 102L)
  }

  test("outlier fences: fencePermille 0 degenerates to the quartiles") {
    val df = (1L to 100L).map(("g", _)).toDF("g", "v")
    val r = Sketches.robustOutlierFences(df, "g", "v",
      fencePermille = 0L).collect().head
    assert(r.getLong(3) == r.getLong(1) && r.getLong(4) == r.getLong(2))
    assert(r.getLong(5) == 24L && r.getLong(6) == 25L) // < 25 and > 75
  }

  test("outlier fences: contract refusals") {
    val df = Seq(("g", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Sketches.robustOutlierFences(df, "g", "v", lowPermille = 750,
        highPermille = 250)
    }
    intercept[IllegalArgumentException] {
      Sketches.robustOutlierFences(df, "g", "v", fencePermille = -1L)
    }
  }

  test("change ratio: a doubling step reads 2000 permille") {
    // key a: buckets 0..5 sum 10 each, buckets 6..11 sum 20 each (w = 3)
    val rows = (0 to 5).map(b => ("a", b * 10L, 10L)) ++
      (6 to 11).map(b => ("a", b * 10L, 20L))
    val got = Temporal.changeRatio(rows.toDF("k", "ts", "v"),
        "k", "ts", "v", bucketWidth = 10L, window = 3L)
      .collect().map(r => r.getLong(1) -> (if (r.isNullAt(5)) -1L else r.getLong(5)))
      .toMap
    assert(got(0L) == -1L) // no trail → null
    assert(got(3L) == 1000L) // steady state
    assert(got(6L) == 2000L) // the step: lead 60 vs trail 30
    assert(got(9L) == 1000L) // fully inside the new level
  }

  test("change ratio: value frames bridge series gaps") {
    // buckets 0, 1, then a gap, then 5: at bucket 5 with w=3 the trailing
    // RANGE (2,3,4) is empty → null ratio, NOT the values at rows 0/1
    val rows = Seq(("a", 0L, 5L), ("a", 10L, 5L), ("a", 50L, 7L))
    val got = Temporal.changeRatio(rows.toDF("k", "ts", "v"),
        "k", "ts", "v", 10L, 3L)
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got(5L) == -1L) // trail_sum null over the gap
    // bucket 1 trails only bucket 0
    val at1 = Temporal.changeRatio(rows.toDF("k", "ts", "v"),
        "k", "ts", "v", 10L, 3L)
      .filter(col("bucket") === 1L).collect().head
    assert(at1.getLong(3) == 5L && at1.getLong(4) == 5L &&
      at1.getLong(5) == 1000L)
  }

  test("change ratio: contract refusals") {
    val df = Seq(("a", 0L, 1L)).toDF("k", "ts", "v")
    intercept[IllegalArgumentException] {
      Temporal.changeRatio(df, "k", "ts", "v", 0L, 3L)
    }
    intercept[IllegalArgumentException] {
      Temporal.changeRatio(df, "k", "ts", "v", 10L, 0L)
    }
    intercept[IllegalArgumentException] {
      Temporal.changeRatio(df.withColumn("vd", col("v").cast("double")),
        "k", "ts", "vd", 10L, 3L)
    }
    val neg = Seq(("a", 0L, -2L)).toDF("k", "ts", "v")
    val e = intercept[Exception] {
      Temporal.changeRatio(neg, "k", "ts", "v", 10L, 3L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("changeRatio")))
  }
}
