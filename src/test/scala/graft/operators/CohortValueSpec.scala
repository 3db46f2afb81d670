package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Temporal.cohortValue]] — LTV triangle: cells, running totals, and the
  * constant-denominator per-member cumulative are exact on a hand-built
  * stream; negatives refuse loudly. */
class CohortValueSpec extends SparkSuite {
  import spark.implicits._

  test("cells, running totals, and per-member LTV are exact") {
    // cohort 0: users a (day 0: 100; day 2: 50) and b (day 0: 30) → size 2
    // cohort 1: user c (day 1: 10; day 3: 10) → size 1
    val ev = Seq(
      ("a", 0L, 100L), ("a", 25L, 50L), ("b", 3L, 30L),
      ("c", 11L, 10L), ("c", 33L, 10L))
      .toDF("k", "ts", "v")
    val got = Temporal.cohortValue(ev, "k", "ts", "v", bucketWidth = 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      // cohort 0: offset 0 = 130 from 2 events; offset 2 adds 50 → cum 180,
      // per-key 180 DIV 2 = 90 (denominator stays the acquired count)
      (0L, 0L, 2L, 130L, 130L, 65L),
      (0L, 2L, 1L, 50L, 180L, 90L),
      // cohort 1: size 1 → per-key == cum
      (1L, 0L, 1L, 10L, 10L, 10L),
      (1L, 2L, 1L, 10L, 20L, 20L)))
  }

  test("a negative value refuses loudly at execution time") {
    val ev = Seq(("a", 0L, 5L), ("a", 1L, -2L)).toDF("k", "ts", "v")
    val e = intercept[Exception] {
      Temporal.cohortValue(ev, "k", "ts", "v", 10L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("cohortValue")))
  }

  test("contract violations refuse at plan time") {
    val ev = Seq(("a", 0L, 5L)).toDF("k", "ts", "v")
    intercept[IllegalArgumentException] {
      Temporal.cohortValue(ev, "k", "ts", "v", bucketWidth = 0L)
    }
    intercept[IllegalArgumentException] {
      Temporal.cohortValue(ev.withColumn("vd", col("v").cast("double")),
        "k", "ts", "vd", 10L)
    }
  }
}
