package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** SemDeDup (cluster-then-prune semantic dedup): keep/drop policy,
  * structural recall of identical vectors through the hot-cell
  * refinement, and null/empty handling. */
class SemanticDedupSpec extends SparkSuite {
  import spark.implicits._

  // two well-separated directions plus near-copies: ids 1,2 point along
  // +x (cosine 1.0 to each other via identical vectors), 3 along +y,
  // 4 is a scaled copy of 3 (cosine exactly 1.0), 5 is -x (cosine -1 to
  // the x family — never dropped at any positive threshold)
  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 3.0f, 0.0f)),
    (5L, Array(-1.0f, 0.0f, 0.0f))).toDF("id", "v")

  test("drops every doc with a smaller-id similar doc, keeps the rest") {
    val kept = Dedup.semanticDedup(vecs, "id", "v",
      threshold = 0.95, k = 2, iters = 2).as[Long].collect().toSet
    // 2 dies to 1 (identical), 4 dies to 3 (scaled copy), 5 survives
    // (cosine -1 to everything x-ish)
    assert(kept === Set(1L, 3L, 5L))
    Dedup.releaseIntermediates()
  }

  test("identical vectors are dropped through the hot-cell refinement") {
    // maxCellSize=1 forces EVERY cell hot: identical vectors must still
    // pair (identical refinement signature — structural recall)
    val kept = Dedup.semanticDedup(vecs, "id", "v",
      threshold = 0.95, k = 2, iters = 2, maxCellSize = 1)
      .as[Long].collect().toSet
    assert(!kept.contains(2L) && !kept.contains(4L))
    assert(kept.contains(1L) && kept.contains(3L) && kept.contains(5L))
    Dedup.releaseIntermediates()
  }

  test("null vectors and empty corpora keep every id") {
    val withNull = Seq((1L, Array(1.0f, 0.0f)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "v")
    assert(Dedup.semanticDedup(withNull, "id", "v", k = 1)
      .as[Long].collect().toSet === Set(1L, 2L))
    Dedup.releaseIntermediates()
    val allNull = Seq((7L, null.asInstanceOf[Array[Float]])).toDF("id", "v")
    assert(Dedup.semanticDedup(allNull, "id", "v")
      .as[Long].collect().toSet === Set(7L))
    val empty = vecs.filter(col("id") > 100)
    assert(Dedup.semanticDedup(empty, "id", "v").collect().isEmpty)
    Dedup.releaseIntermediates()
  }

  test("incremental: batch deduped against a persisted cell index") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("id", "v")
    val centroids = Similarity.ivfTrain(corpus, "id", "v", k = 2, iters = 2)
    val index = Similarity.ivfAssign(corpus, "id", "v", centroids)
    val batch = Seq(
      (11L, Array(2.0f, 0.0f, 0.0f)), // scaled copy of corpus 1 → dropped
      (12L, Array(-1.0f, 0.0f, 0.0f)), // negation → kept
      (13L, Array(0.0f, 3.0f, 0.0f)), // scaled copy of corpus 2 → dropped
      (14L, Array(-1.0f, 0.0f, 0.0f))) // identical to 12 → batch-internal drop
      .toDF("id", "v")
    val kept = Dedup.semanticDedupIncremental(batch, "id", "v",
      index, centroids, threshold = 0.95).as[Long].collect().toSet
    assert(kept === Set(12L))
    Dedup.releaseIntermediates()
  }

  test("incremental: overlapping batch/index ids raise (self-pair guard)") {
    val corpus = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("id", "v")
    val centroids = Similarity.ivfTrain(corpus, "id", "v", k = 2, iters = 1)
    val index = Similarity.ivfAssign(corpus, "id", "v", centroids)
    val reIngest = Seq((1L, Array(1.0f, 0.0f))).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Dedup.semanticDedupIncremental(reIngest, "id", "v", index, centroids)
    }
    assert(e.getMessage.contains("overlap"))
    Dedup.releaseIntermediates()
  }

  test("incremental: strictIdCheck catches ids that drifted to untouched cells") {
    // corpus ids 1 (x-axis cell) and 2 (y-axis cell); the re-ingested id 2
    // arrives with a vector near the x-axis, so its batch only TOUCHES
    // cell(x) — the touched-cell probe can't see index id 2 in cell(y)
    val corpus = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("id", "v")
    val centroids = Similarity.ivfTrain(corpus, "id", "v", k = 2, iters = 2)
    val index = Similarity.ivfAssign(corpus, "id", "v", centroids)
    val drifted = Seq((2L, Array(0.99f, 0.14f))).toDF("id", "v")
    // documented default behavior: the touched-cell probe passes it
    val kept = Dedup.semanticDedupIncremental(drifted, "id", "v",
      index, centroids, threshold = 0.999).as[Long].collect().toSet
    assert(kept === Set(2L))
    Dedup.releaseIntermediates()
    // strict mode scans the full index id column and raises
    val e = intercept[IllegalArgumentException] {
      Dedup.semanticDedupIncremental(drifted, "id", "v",
        index, centroids, threshold = 0.999, strictIdCheck = true)
    }
    assert(e.getMessage.contains("strictIdCheck"))
    Dedup.releaseIntermediates()
  }

  test("incremental: hot-cell refinement keeps identical-vector recall") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.8f, 0.2f))).toDF("id", "v")
    val centroids = Similarity.ivfTrain(corpus, "id", "v", k = 1, iters = 1)
    val index = Similarity.ivfAssign(corpus, "id", "v", centroids)
    // every cell hot (maxCellSize=1): the identical copy must still die
    val batch = Seq((11L, Array(1.0f, 0.0f))).toDF("id", "v")
    val kept = Dedup.semanticDedupIncremental(batch, "id", "v",
      index, centroids, threshold = 0.95, maxCellSize = 1)
      .as[Long].collect().toSet
    assert(kept.isEmpty)
    Dedup.releaseIntermediates()
  }

  test("pairs crossing a cluster boundary are NOT dropped (SemDeDup contract)") {
    // two tight groups far apart; k=2 separates them. A cross-group pair
    // can never be dropped even at threshold 0 — pruning is within-cell
    // by design (that recall loss is the documented SemDeDup tradeoff).
    val two = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f))).toDF("id", "v")
    val kept = Dedup.semanticDedup(two, "id", "v",
      threshold = -1.0, k = 2, iters = 2).as[Long].collect().toSet
    assert(kept === Set(1L, 2L))
    Dedup.releaseIntermediates()
  }
}
