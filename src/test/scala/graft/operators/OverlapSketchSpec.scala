package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Sketches.distinctOverlap]] — KMV set algebra: exact below capacity,
  * estimator tracks truth at capacity, disjoint/identical extremes behave,
  * and empty groups pair with zero overlap. */
class OverlapSketchSpec extends SparkSuite {
  import spark.implicits._

  private val Bound = 1152921504606846976L

  private def md5Hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def rows(g: String, ids: Range) =
    ids.map(i => (g, md5Hash60(s"u$i")))

  test("below capacity everything is exact (kept sets are complete)") {
    // A = 1..40, B = 21..60 → union 60, intersection 20
    val df = (rows("a", 1 to 40) ++ rows("b", 21 to 60)).toDF("g", "h")
    val r = Sketches.distinctOverlap(df, "g", "h", k = 128, Bound)
      .collect().head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 60L) // n_union_kept
    assert(r.getLong(3) == 20L) // shared
    assert(r.getLong(4) == 60L) // est_union exact
    assert(r.getLong(5) == 20L) // est_intersection exact
    assert(r.getLong(6) == (20L * 1000) / 60) // jaccard over union minima
  }

  test("at capacity the estimates track the truth (fixed-hash regression)") {
    // A = 1..4000, B = 2001..6000 → union 6000, intersection 2000, J = 1/3
    val df = (rows("a", 1 to 4000) ++ rows("b", 2001 to 6000)).toDF("g", "h")
    val r = Sketches.distinctOverlap(df, "g", "h", k = 256, Bound)
      .collect().head
    val (eu, ei, jp) = (r.getLong(4), r.getLong(5), r.getLong(6))
    assert(math.abs(eu - 6000.0) / 6000 < 0.25, s"est_union $eu")
    assert(math.abs(ei - 2000.0) / 2000 < 0.45, s"est_intersection $ei")
    assert(jp > 180 && jp < 500, s"jaccard_permille $jp vs 333")
  }

  test("disjoint and identical extremes") {
    val df = (rows("a", 1 to 500) ++ rows("b", 1001 to 1500) ++
      rows("c", 1 to 500)).toDF("g", "h")
    val got = Sketches.distinctOverlap(df, "g", "h", k = 64, Bound)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(6))).toMap
    assert(got.size == 3) // all pairs, a<b ordering
    val (shAB, _) = got(("a", "b"))
    assert(shAB == 0L) // disjoint: no shared union minima
    val (shAC, jAC) = got(("a", "c"))
    assert(shAC == 64L && jAC == 1000L) // identical: full overlap
  }

  test("an all-null group keeps an empty set and zero overlap") {
    val df = (rows("a", 1 to 10).map { case (g, h) => (g, Option(h)) } :+
      (("b", Option.empty[Long]))).toDF("g", "h")
    val r = Sketches.distinctOverlap(df, "g", "h", k = 16, Bound)
      .collect().head
    assert(r.getLong(2) == 10L && r.getLong(3) == 0L && r.getLong(6) == 0L)
  }

  test("contract violations refuse") {
    val df = Seq(("a", 1L)).toDF("g", "h")
    intercept[IllegalArgumentException] {
      Sketches.distinctOverlap(df, "g", "h", k = 1, Bound)
    }
    intercept[IllegalArgumentException] {
      Sketches.distinctOverlap(df, "g", "h", k = 16, 0L)
    }
  }
}
