package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Temporal.attributionLinear]] — linear multi-touch: weights sum to
  * exactly 1000 per conversion with the remainder on the last touch, the
  * lookback binds, bucket boundaries don't leak pairs, and contracts
  * refuse. */
class AttributionSpec extends SparkSuite {
  import spark.implicits._

  // (key, type, ts, id)
  private def ev(rows: (String, String, Long, Long)*) =
    rows.toDF("k", "t", "ts", "id")

  private def run(df: org.apache.spark.sql.DataFrame,
      lookback: Long = 100L, width: Long = 10L) =
    Temporal.attributionLinear(df, "k", "t", "ts", "id",
      convType = "buy", touchType = "view", lookback, width)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
      .sortBy(t => (t._1, t._2))

  test("three touches split 333/333/334, remainder on the LAST touch") {
    val df = ev(("u", "view", 10L, 1L), ("u", "view", 20L, 2L),
      ("u", "view", 30L, 3L), ("u", "buy", 50L, 9L))
    assert(run(df).toSeq == Seq((9L, 1L, 333L), (9L, 2L, 333L), (9L, 3L, 334L)))
  }

  test("weights sum to exactly 1000 for any touch count") {
    for (n <- 1 to 9) {
      val touches = (1 to n).map(i => ("u", "view", i * 7L, i.toLong))
      val df = ev(touches :+ (("u", "buy", 99L, 100L)): _*)
      val w = run(df)
      assert(w.length == n)
      assert(w.map(_._3).sum == 1000L, s"n=$n: ${w.mkString(",")}")
    }
  }

  test("the lookback binds; a touch after the conversion never attributes") {
    val df = ev(("u", "view", 5L, 1L), // 95 < 5 → outside lookback 100? cts=200, s=100 → out
      ("u", "view", 150L, 2L), // in window
      ("u", "view", 250L, 3L), // after the conversion
      ("u", "buy", 200L, 9L))
    assert(run(df).toSeq == Seq((9L, 2L, 1000L)))
  }

  test("pairs never cross keys; conversions without touches are absent") {
    val df = ev(("a", "view", 10L, 1L), ("b", "buy", 15L, 9L))
    assert(run(df).isEmpty)
  }

  test("a touch ON the conversion instant attributes (inclusive end)") {
    val df = ev(("u", "view", 50L, 1L), ("u", "buy", 50L, 9L))
    assert(run(df).toSeq == Seq((9L, 1L, 1000L)))
  }

  test("contract refusals") {
    val df = ev(("u", "view", 1L, 1L))
    intercept[IllegalArgumentException] {
      Temporal.attributionLinear(df, "k", "t", "ts", "id", "buy", "buy", 10L, 10L)
    }
    intercept[IllegalArgumentException] {
      Temporal.attributionLinear(df, "k", "t", "ts", "id", "buy", "view", -1L, 10L)
    }
    // a lookback spanning more buckets than the budget refuses at run time
    val wide = ev(("u", "view", 1L, 1L), ("u", "buy", 10L, 9L))
    val e = intercept[Exception] {
      Temporal.attributionLinear(wide, "k", "t", "ts", "id", "buy", "view",
        lookback = 100L, bucketWidth = 1L, maxBucketsPerInterval = 4L).collect()
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Seq.empty
      else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("maxBucketsPerInterval")))
  }
}
