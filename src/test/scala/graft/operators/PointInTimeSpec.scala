package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** [[Temporal.pointInTimeJoin]] — the leak-free SCD2 feature join: each
  * fact sees exactly the dimension version current at its timestamp,
  * pre-creation facts and post-tombstone facts see nulls (a tombstone
  * must not leak its pre-delete attributes), same-instant versions are
  * visible, and contract violations refuse. */
class PointInTimeSpec extends SparkSuite {
  import spark.implicits._

  // one key's life: created at 100 (v1, bal 10), updated at 200 (v2,
  // bal 20), deleted at 300 (tombstone CARRYING bal 20 — the leak bait),
  // re-created at 400 (v4, bal 40)
  private def dim = Seq(
    (1L, 100L, 10L, false, 1L),
    (1L, 200L, 20L, false, 2L),
    (1L, 300L, 20L, true, 3L),
    (1L, 400L, 40L, false, 4L),
    (2L, 150L, 99L, false, 1L)
  ).toDF("k", "vts", "bal", "del", "ver")

  private def facts = Seq(
    (10L, 1L, 50L),   // before creation -> null
    (11L, 1L, 100L),  // AT creation instant -> v1 visible
    (12L, 1L, 150L),  // v1 era
    (13L, 1L, 250L),  // v2 era
    (14L, 1L, 350L),  // post-tombstone -> null (NOT bal 20)
    (15L, 1L, 450L),  // re-created -> v4
    (16L, 3L, 500L)   // key never in dimension -> null
  ).toDF("fid", "fk", "fts")

  test("each fact sees the version current at its ts; tombstones and pre-creation read null") {
    val got = Temporal.pointInTimeJoin(facts, dim, "fk", "k", "fts", "vts",
        Seq("bal", "ver"), tieBreak = "ver", deletedCol = Some("del"))
      .orderBy("fid").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got.toSeq == Seq(
      (10L, None, None),
      (11L, Some(10L), Some(1L)),
      (12L, Some(10L), Some(1L)),
      (13L, Some(20L), Some(2L)),
      (14L, None, None),
      (15L, Some(40L), Some(4L)),
      (16L, None, None)))
  }

  test("without deletedCol the tombstone row joins like any version (caller opted out)") {
    val got = Temporal.pointInTimeJoin(facts, dim, "fk", "k", "fts", "vts",
        Seq("bal"), tieBreak = "ver")
      .filter(col("fid") === 14L).collect().head
    assert(got.getLong(3) == 20L)
  }

  test("same-timestamp versions: the highest tieBreak wins") {
    val d2 = Seq((1L, 100L, 10L, false, 1L), (1L, 100L, 11L, false, 2L))
      .toDF("k", "vts", "bal", "del", "ver")
    val f2 = Seq((1L, 1L, 100L)).toDF("fid", "fk", "fts")
    val got = Temporal.pointInTimeJoin(f2, d2, "fk", "k", "fts", "vts",
      Seq("bal"), tieBreak = "ver", deletedCol = Some("del"))
      .collect().head
    assert(got.getLong(3) == 11L)
  }

  test("matches the brute-force LATERAL semantics on randomized data") {
    val rnd = new scala.util.Random(42)
    val dimR = (1 to 300).map { i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong,
        rnd.nextInt(100).toLong, rnd.nextInt(10) == 0, i.toLong)
    }.toDF("k", "vts", "bal", "del", "ver")
    val factsR = (1 to 400).map { i =>
      (i.toLong, rnd.nextInt(25).toLong, rnd.nextInt(1200).toLong)
    }.toDF("fid", "fk", "fts")
    val got = Temporal.pointInTimeJoin(factsR, dimR, "fk", "k", "fts", "vts",
        Seq("bal"), tieBreak = "ver", deletedCol = Some("del"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val dimRows = dimR.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))
    val want = factsR.collect().map { r =>
      val (fid, fk, fts) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val cov = dimRows.filter(d => d._1 == fk && d._2 <= fts)
        .sortBy(d => (-d._2, -d._5)).headOption
      fid -> cov.flatMap(d => if (d._4) None else Some(d._3))
    }.toMap
    assert(got == want)
  }

  test("contracts refuse: deletedCol must exist and not be in the payload") {
    intercept[IllegalArgumentException] {
      Temporal.pointInTimeJoin(facts, dim, "fk", "k", "fts", "vts",
        Seq("bal"), tieBreak = "ver", deletedCol = Some("nope"))
    }
    intercept[IllegalArgumentException] {
      Temporal.pointInTimeJoin(facts, dim, "fk", "k", "fts", "vts",
        Seq("bal", "del"), tieBreak = "ver", deletedCol = Some("del"))
    }
    // the asofJoin reserved-column rule rides along
    intercept[IllegalArgumentException] {
      Temporal.pointInTimeJoin(facts.withColumn("__x", lit(1)), dim,
        "fk", "k", "fts", "vts", Seq("bal"), tieBreak = "ver")
    }
  }
}
