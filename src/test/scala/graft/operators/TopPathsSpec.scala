package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Temporal.topPaths]] — top-k consecutive event paths: exact windows
  * per key, tie order, cross-key isolation, contracts. */
class TopPathsSpec extends SparkSuite {
  import spark.implicits._

  test("paths are per-key consecutive windows; counts and order are exact") {
    // user 1: a b c b c -> abc, bcb, cbc ... wait: windows a>b>c, b>c>b, c>b>c
    // user 2: a b c -> a>b>c (cross-user windows must NOT form)
    val ev = Seq(
      (1L, "a", 1L, 1L), (1L, "b", 2L, 2L), (1L, "c", 3L, 3L),
      (1L, "b", 4L, 4L), (1L, "c", 5L, 5L),
      (2L, "a", 1L, 6L), (2L, "b", 2L, 7L), (2L, "c", 3L, 8L)
    ).toDF("k", "t", "ts", "id")
    val got = Temporal.topPaths(ev, "k", "t", "ts", "id", 3, 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, "a>b>c", 2L),
      (2L, "b>c>b", 1L),
      (3L, "c>b>c", 1L)))
    // same-ts events order by the tie-break
    val tied = Seq((1L, "x", 1L, 2L), (1L, "y", 1L, 1L), (1L, "z", 2L, 3L))
      .toDF("k", "t", "ts", "id")
    val p2 = Temporal.topPaths(tied, "k", "t", "ts", "id", 3, 5)
      .collect().map(_.getString(1))
    assert(p2.toSeq == Seq("y>x>z"))
    intercept[IllegalArgumentException] {
      Temporal.topPaths(ev, "k", "t", "ts", "id", 1, 5)
    }
    intercept[IllegalArgumentException] {
      Temporal.topPaths(ev, "k", "t", "ts", "id", 3, 0)
    }
  }
}
