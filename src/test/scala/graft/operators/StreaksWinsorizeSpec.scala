package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Temporal.streaks]] and [[Sketches.winsorize]] — gaps-and-islands
  * streak census and the sketch-fence outlier clamp. */
class StreaksWinsorizeSpec extends SparkSuite {
  import spark.implicits._

  test("streaks: islands, longest, and current are exact") {
    // key 1: days 1,2,3 | 5 | 8,9  -> streaks 3/1/2, longest 3, current 2
    // key 2: day 4 only             -> one streak of 1
    val ev = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 5L), (1L, 8L), (1L, 9L),
      (1L, 9L), // duplicate bucket collapses
      (2L, 4L)
    ).map { case (k, day) => (k, day * 10L + 3) }.toDF("k", "ts")
    val got = Temporal.streaks(ev, "k", "ts", bucketWidth = 10L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got(1L) == (6L, 3L, 3L, 2L, 9L))
    assert(got(2L) == (1L, 1L, 1L, 1L, 4L))
  }

  test("streaks: pre-epoch timestamps floor into the right buckets") {
    // ts -25..-21 and -5..-1 with width 10: buckets -3 and -1 (gap at -2)
    val ev = Seq((1L, -25L), (1L, -3L)).toDF("k", "ts")
    val got = Temporal.streaks(ev, "k", "ts", 10L).collect().head
    assert(got.getLong(2) == 2L) // two streaks, not one
    assert(got.getLong(5) == -1L)
    intercept[IllegalArgumentException] {
      Temporal.streaks(ev, "k", "ts", 0L)
    }
    intercept[IllegalArgumentException] {
      Temporal.streaks(ev.withColumn("ts", col("ts").cast("string")), "k", "ts", 10L)
    }
  }

  test("winsorize: values clip into the sketch fences; nulls stay null") {
    // group a: values 1..100 (mantissaBits 6 -> all < 128 exact)
    val df = ((1L to 100L).map(v => ("a", Option(v))) :+ (("a", Option.empty[Long])))
      .toDF("g", "v")
    val out = Sketches.winsorize(df, "g", "v", loPermille = 100,
      hiPermille = 900, mantissaBits = 6)
    val rows = out.collect()
    val clipped = rows.filter(!_.isNullAt(1))
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    // exact singleton buckets: p100 fence = 10, p900 fence = 90
    assert(clipped(1L) == 10L && clipped(5L) == 10L && clipped(10L) == 10L)
    assert(clipped(50L) == 50L)
    assert(clipped(90L) == 90L && clipped(95L) == 90L && clipped(100L) == 90L)
    // the null row survives as null, NOT the lo fence
    assert(rows.exists(r => r.isNullAt(1) && r.isNullAt(2)))
    // and null VALUES carry no rank mass: many nulls must not drag the
    // fences down (the nulls-first window-order hazard)
    val noisy = df.unionByName(
      Seq.fill(100)(("a", Option.empty[Long])).toDF("g", "v"))
    val f2 = Sketches.winsorize(noisy, "g", "v", 100, 900, 6)
      .filter(col("v") === 50L).collect().head.getLong(2)
    assert(f2 == 50L, s"null mass shifted the fences: 50 clipped to $f2")
    // null GROUPS are groups, not dropped rows
    val ng = Seq((Option.empty[String], Option(5L)),
      (Option.empty[String], Option(15L))).toDF("g", "v")
    val gotNg = Sketches.winsorize(ng, "g", "v", 100, 900, 6).collect()
    assert(gotNg.length == 2 && gotNg.forall(!_.isNullAt(2)))
    intercept[IllegalArgumentException] {
      Sketches.winsorize(df, "g", "v", 900, 100)
    }
    intercept[IllegalArgumentException] {
      Sketches.winsorize(df.withColumn("__x", lit(1)), "g", "v", 100, 900)
    }
  }
}
