package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[TextCorpus.sampleBottomK]] — deterministic bottom-k-by-hash sampling:
  * the kept set equals the sorted-order truth, is partition-invariant
  * (mergeable), under-full groups keep everything, and negative hashes
  * refuse. */
class SampleBottomKSpec extends SparkSuite {
  import spark.implicits._

  test("kept ids equal the (hash, id) sort truth; under-full groups keep all") {
    val rnd = new scala.util.Random(99)
    val rows = (0L until 500L).map(i =>
      (s"g${i % 3}", i, math.abs(rnd.nextLong()) % 1000L)) ++ // hash ties likely
      Seq(("tiny", 9000L, 5L), ("tiny", 9001L, 3L))
    val got = TextCorpus.sampleBottomK(rows.toDF("g", "id", "h"),
        "g", "id", "h", k = 7)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy(r => (r._3, r._2)).take(7).zipWithIndex
        .map { case (r, i) => (g, i + 1L) -> r._2 }
    }
    assert(got == want)
    assert(got.count(_._1._1 == "tiny") == 2) // under-full: both kept
    assert(got(("tiny", 1L)) == 9001L)        // rank by hash, 3 < 5
  }

  test("partition-invariant (mergeable): 1 vs 32 partitions identical") {
    val rnd = new scala.util.Random(5)
    val rows = (0L until 2000L).map(i => ("g", i, math.abs(rnd.nextLong())))
    val one = TextCorpus.sampleBottomK(rows.toDF("g", "id", "h").coalesce(1),
      "g", "id", "h", 25).collect().map(_.toSeq).toSet
    val many = TextCorpus.sampleBottomK(rows.toDF("g", "id", "h").repartition(32),
      "g", "id", "h", 25).collect().map(_.toSeq).toSet
    assert(one == many)
  }

  test("negative hash refuses loudly") {
    val e = intercept[Exception] {
      TextCorpus.sampleBottomK(Seq(("g", 1L, -2L)).toDF("g", "id", "h"),
        "g", "id", "h", 3).collect()
    }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("sampleBottomK")) ||
        mentions(t.getCause))
    assert(mentions(e))
  }
}
