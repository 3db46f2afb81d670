package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Similarity.recallAtK]] — the ANN eval harness: exact overlap
  * arithmetic, rank cutoffs, small-corpus and empty-truth handling. */
class AnnRecallSpec extends SparkSuite {
  import spark.implicits._

  private def ranking(ids: Seq[Long]) =
    ids.zipWithIndex.map { case (id, i) => (i.toLong + 1, id) }
      .toDF("rank", "id")

  test("overlap permille is exact; rows past k are ignored") {
    val exact = ranking(Seq(1L, 2L, 3L, 4L, 5L))
    val approx = ranking(Seq(1L, 9L, 3L, 8L, 7L, 2L)) // the 2 sits at rank 6
    val r = Similarity.recallAtK(approx, exact, "id", 5).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (5L, 2L, 400L))
    // at k=3 only ranks 1..3 of both count: exact {1,2,3}, approx {1,9,3}
    val r3 = Similarity.recallAtK(approx, exact, "id", 3).collect().head
    assert((r3.getLong(0), r3.getLong(1), r3.getLong(2)) == (3L, 2L, 666L))
  }

  test("a truth list shorter than k is not a recall failure; empty truth is null") {
    val exact = ranking(Seq(1L, 2L))
    val approx = ranking(Seq(2L, 1L, 7L, 8L, 9L))
    val r = Similarity.recallAtK(approx, exact, "id", 10).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (2L, 2L, 1000L))
    val empty = Similarity.recallAtK(approx, ranking(Seq.empty), "id", 5)
      .collect().head
    assert(empty.getLong(0) == 0L && empty.isNullAt(2))
  }

  test("topKBatch ≡ per-query single-query top-k") {
    val rnd = new scala.util.Random(11)
    val corpus = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id").isin(3L, 17L))
      .select(col("vec_id").as("qid"), col("embedding"))
    val batch = Similarity.topKBatch(corpus, "vec_id", "embedding",
        queries, "qid", "embedding", 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val single = Seq(3L, 17L).flatMap { q =>
      val qv = corpus.filter(col("vec_id") === q)
        .head().getSeq[Float](1)
      Similarity.topKBruteForce(corpus, "vec_id", "embedding", qv, 6)
        .collect().map(r => (q, r.getLong(0), r.getLong(1)))
    }.toSet
    assert(batch == single)
    intercept[IllegalArgumentException] {
      Similarity.topKBatch(corpus, "vec_id", "embedding",
        queries, "qid", "embedding", 0)
    }
  }

  test("shape contracts refuse") {
    val ok = ranking(Seq(1L))
    intercept[IllegalArgumentException] {
      Similarity.recallAtK(ok.withColumnRenamed("rank", "r"), ok, "id", 5)
    }
    intercept[IllegalArgumentException] {
      Similarity.recallAtK(ok, ok, "doc", 5)
    }
    intercept[IllegalArgumentException] {
      Similarity.recallAtK(ok, ok, "id", 0)
    }
  }
}
