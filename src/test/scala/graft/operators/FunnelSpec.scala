package graft.operators

import graft.SparkSuite

/** [[Temporal.funnel]] — earliest-qualifying-chain semantics: greedy
  * earliest is optimal, strict-after chaining, monotone nulls, and only
  * funnel entrants appear. */
class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private def run(ev: Seq[(Long, String, Long)], steps: Seq[String]) =
    Temporal.funnel(ev.toDF("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", steps)
      .collect().map(r => r.getLong(0) ->
        (Seq.tabulate(steps.size)(i => Option(r.get(i + 1)).map(_.asInstanceOf[Long])),
          r.getLong(steps.size + 1))).toMap

  test("earliest chain, partial completion, and non-entrants") {
    val ev = Seq(
      // user 1 completes A→B→C: earliest chain (10, 20, 30)
      (1L, "A", 10L), (1L, "B", 20L), (1L, "A", 15L), (1L, "C", 30L), (1L, "B", 5L),
      // user 2: B before A only — enters, never advances (B at 1 < A at 10)
      (2L, "B", 1L), (2L, "A", 10L),
      // user 3: no A at all — not in the output
      (3L, "B", 10L), (3L, "C", 20L))
    val got = run(ev, Seq("A", "B", "C"))
    assert(got(1L) == ((Seq(Some(10L), Some(20L), Some(30L)), 3L)))
    assert(got(2L) == ((Seq(Some(10L), None, None), 1L)))
    assert(!got.contains(3L))
  }

  test("equal timestamps across steps do not chain (strict after)") {
    val got = run(Seq((1L, "A", 10L), (1L, "B", 10L), (1L, "B", 11L)), Seq("A", "B"))
    assert(got(1L) == ((Seq(Some(10L), Some(11L)), 2L)))
    val strict = run(Seq((2L, "A", 10L), (2L, "B", 10L)), Seq("A", "B"))
    assert(strict(2L) == ((Seq(Some(10L), None), 1L)))
  }

  test("greedy earliest finds a chain whenever one exists") {
    // A at 5 and 50; B at 10; C at 60: greedy picks (5, 10, 60) — a later
    // A start (50) would have missed B entirely
    val got = run(Seq((1L, "A", 5L), (1L, "A", 50L), (1L, "B", 10L), (1L, "C", 60L)),
      Seq("A", "B", "C"))
    assert(got(1L)._2 == 3L)
  }

  test("retention cohorts: first-activity bucket, offsets, distinct-per-cell") {
    val ev = Seq(
      (1L, 0L), (1L, 5L), (1L, 5L), (1L, 25L), // cohort 0, active days 0,0,2
      (2L, 11L), (2L, 22L), // cohort 1, active days 1,2
      (3L, 12L)) // cohort 1, active day 1
    val got = Temporal.retentionCohorts(
      ev.toDF("user_id", "ts"), "user_id", "ts", bucketWidth = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 1L, (0L, 2L) -> 1L,
      (1L, 0L) -> 2L, (1L, 1L) -> 1L))
  }

  test("duplicate step names refuse loudly") {
    val e = intercept[IllegalArgumentException] {
      Temporal.funnel(Seq((1L, "A", 1L)).toDF("u", "t", "ts"), "u", "t", "ts",
        Seq("A", "A"))
    }
    assert(e.getMessage.contains("distinct"))
  }
}
