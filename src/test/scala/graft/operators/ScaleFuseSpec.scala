package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Sketches.minMaxScale]] and [[Similarity.rrfFuse]] — exact scaling
  * endpoints and the RRF combiner's arithmetic. */
class ScaleFuseSpec extends SparkSuite {
  import spark.implicits._

  test("minMaxScale: endpoints exact, constant group -> 0, nulls stay null") {
    val df = Seq(("a", Option(10L)), ("a", Option(20L)), ("a", Option(15L)),
      ("a", Option.empty[Long]), ("b", Option(7L)), ("b", Option(7L)))
      .toDF("g", "v")
    val got = Sketches.minMaxScale(df, "g", "v").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got.contains(("a", Some(10L), Some(0L))))
    assert(got.contains(("a", Some(20L), Some(1000L))))
    assert(got.contains(("a", Some(15L), Some(500L))))
    assert(got.contains(("a", None, None)))
    assert(got.filter(_._1 == "b").forall(_._3 == Some(0L)))
    intercept[IllegalArgumentException] {
      Sketches.minMaxScale(df.withColumn("__x", lit(1)), "g", "v")
    }
  }

  test("rrfFuse: scores add across rankings, singletons score once, order is exact") {
    def ranking(ids: Seq[Long]) =
      ids.zipWithIndex.map { case (id, i) => (i.toLong + 1, id) }
        .toDF("rank", "id")
    // a: 1,2,3  b: 2,3,4 with kConst 0: score(2) = 1e6/2 + 1e6/1 = 1500000
    val got = Similarity.rrfFuse(
        ranking(Seq(1L, 2L, 3L)), ranking(Seq(2L, 3L, 4L)), "id", 4, kConst = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 2L, 1500000L),    // 1e6/2 + 1e6/1
      (2L, 1L, 1000000L),    // 1e6/1
      (3L, 3L, 833333L),     // 1e6/3 + 1e6/2
      (4L, 4L, 333333L)))    // 1e6/3
    intercept[IllegalArgumentException] {
      Similarity.rrfFuse(ranking(Seq(1L)), ranking(Seq(1L)), "id", 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.rrfFuse(ranking(Seq(1L)).drop("rank"), ranking(Seq(1L)), "id", 3)
    }
  }
}
