package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Temporal.concentration]], [[Sketches.robustMad]], and
  * [[Similarity.diversifiedTopK]] — hand-checked arithmetic for the
  * three census/ranking additions. */
class RobustCensusSpec extends SparkSuite {
  import spark.implicits._

  test("concentration: one-trick = 1e6, uniform = n * (1000/n)^2, nulls skipped") {
    val ev = (Seq.fill(5)((1L, "a")) ++
      Seq(("x", "b"), ("x", "c"), ("x", "d"), ("x", "e")).map(t => (2L, t._2)) ++
      Seq((3L, null.asInstanceOf[String])))
      .toDF("u", "t")
    val got = Temporal.concentration(ev, "u", "t")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) == (1L, 5L, 1000000L))
    assert(got(2L) == (4L, 4L, 250000L)) // 4 * 250^2
    assert(!got.contains(3L), "a user with only null keys has no census row")
  }

  test("inequality: uniform = 0, one-dominant tracks (k-1)/k, formula exact") {
    // uniform over 4 types (2 each): gini = 0
    val uni = Seq("a","a","b","b","c","c","d","d").map((1L, _)).toDF("u", "t")
    val g1 = Temporal.inequality(uni, "u", "t").collect().head
    assert(g1.getLong(3) == 0L)
    // counts 1,1,8 sorted -> i*c = 1+2+24=27; S=10, k=3
    // gini = ((54 - 40) * 1e6) DIV 30 = 466666
    val sk = (Seq("x","y") ++ Seq.fill(8)("z")).map((2L, _)).toDF("u", "t")
    val g2 = Temporal.inequality(sk, "u", "t").collect().head
    assert(g2.getLong(3) == 466666L)
  }

  test("robustMad: exact below 2^mantissaBits — median 30, MAD 15 on 1..60") {
    val vals = (1L to 60L).map(v => ("g", v)).toDF("g", "v")
    val r = Sketches.robustMad(vals, "g", "v", mantissaBits = 6).collect().head
    assert(r.getString(0) == "g" && r.getLong(1) == 30L && r.getLong(2) == 15L)
  }

  test("diversifiedTopK: per-group cap binds, global order exact, ties to smaller id") {
    // group A has the 6 best scores; cap 2 forces B/C rows into the top-5
    val rows = Seq(
      ("A", 1L, 100L), ("A", 2L, 99L), ("A", 3L, 98L), ("A", 4L, 97L),
      ("A", 5L, 96L), ("A", 6L, 95L),
      ("B", 10L, 90L), ("B", 11L, 90L),
      ("C", 20L, 80L)
    ).toDF("g", "id", "s")
    val got = Similarity.diversifiedTopK(rows, "g", "id", "s", k = 5,
        maxPerGroup = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "A", 1L, 100L), (2L, "A", 2L, 99L),
      (3L, "B", 10L, 90L), (4L, "B", 11L, 90L),
      (5L, "C", 20L, 80L)))
    intercept[IllegalArgumentException] {
      Similarity.diversifiedTopK(rows, "g", "id", "s", k = 5, maxPerGroup = 6)
    }
  }
}
