package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Product quantization: code determinism, identical-vector identity,
  * full-shortlist exactness, and training shape. */
class PqSpec extends SparkSuite {
  import spark.implicits._

  // 8 vectors in dim 4, two tight groups along different axes
  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 0.9f, 0.1f)),
    (4L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (5L, Array(0.5f, 0.5f, 0.0f, 0.0f)),
    (6L, Array(0.0f, 0.0f, 0.5f, 0.5f)),
    (7L, Array(0.2f, 0.0f, 0.8f, 0.0f))).toDF("id", "v")

  test("identical vectors get identical codes; training is deterministic") {
    val b1 = Similarity.pqTrain(vecs, "id", "v", m = 2, k = 2, iters = 2)
    val b2 = Similarity.pqTrain(vecs, "id", "v", m = 2, k = 2, iters = 2)
    assert(b1.map(_.toSeq) === b2.map(_.toSeq))
    val codes = Similarity.pqAssign(vecs, "id", "v", b1, m = 2, k = 2)
      .select("id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes(0L) === codes(4L)) // exact copies
    assert(codes.values.forall(_.length === 2))
  }

  test("shortlist = corpus size reproduces brute force exactly") {
    val books = Similarity.pqTrain(vecs, "id", "v", m = 2, k = 4, iters = 2)
    val q = Seq(1.0f, 0.05f, 0.0f, 0.0f)
    val pq = Similarity.topKPq(vecs, "id", "v", q, 3, books,
        m = 2, k = 4, shortlist = 8)
      .select("rank", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val bf = Similarity.topKBruteForce(vecs, "id", "v", q, 3)
      .select("rank", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pq.toSeq === bf.toSeq)
  }

  test("ADC ranks an exact duplicate of the query first") {
    val books = Similarity.pqTrain(vecs, "id", "v", m = 2, k = 4, iters = 2)
    // id 0 and 4 are exact copies of the query — their codes equal the
    // query's own quantization, so their ADC distance is the GLOBAL
    // minimum (Σ_s min_c lut) and both always make a shortlist ≥ 4 even
    // if a neighbor shares their codes and ties; the exact rerank then
    // puts the two cosine-1.0 copies on top
    val top = Similarity.topKPq(vecs, "id", "v",
        Seq(1.0f, 0.0f, 0.0f, 0.0f), 2, books, m = 2, k = 4, shortlist = 4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(top === Set(0L, 4L))
  }

  test("IVF-PQ with full probes and shortlist reproduces brute force") {
    val centroids = Similarity.ivfTrain(vecs, "id", "v", k = 2, iters = 2)
    val books = Similarity.pqTrain(vecs, "id", "v", m = 2, k = 4, iters = 2)
    val q = Seq(1.0f, 0.05f, 0.0f, 0.0f)
    val full = Similarity.topKIvfPq(vecs, "id", "v", q, 3, centroids, books,
        m = 2, k = 4, nprobe = 2, shortlist = 8)
      .select("rank", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val bf = Similarity.topKBruteForce(vecs, "id", "v", q, 3)
      .select("rank", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(full.toSeq === bf.toSeq)
    // nprobe=1 really prunes: the scanned candidate set shrinks to the
    // query's own cell (every returned id must share it)
    val idx = Similarity.ivfPqAssign(vecs, "id", "v", centroids, books, m = 2, k = 4)
    val qCell = idx.filter(col("id") === 0L).head().getInt(1)
    val pruned = Similarity.topKIvfPqIndexed(idx, Seq(1.0f, 0.0f, 0.0f, 0.0f),
        8, centroids, books, m = 2, k = 4, nprobe = 1, shortlist = 8)
      .select("id").collect().map(_.getLong(0)).toSet
    val cellIds = idx.filter(col("cell") === qCell)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(pruned.subsetOf(cellIds) && pruned.nonEmpty)
  }

  test("array<double> corpora train and code like array<float>") {
    val dv = vecs.select(col("id"),
      transform(col("v"), x => x.cast("double")).as("v"))
    val bf = Similarity.pqTrain(vecs, "id", "v", m = 2, k = 2, iters = 2)
    val bd = Similarity.pqTrain(dv, "id", "v", m = 2, k = 2, iters = 2)
    assert(bf.map(_.toSeq) === bd.map(_.toSeq))
    val q = Seq(1.0f, 0.05f, 0.0f, 0.0f)
    val rf = Similarity.topKPq(vecs, "id", "v", q, 3, bf, m = 2, k = 2, shortlist = 8)
      .select("rank", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val rd = Similarity.topKPq(dv, "id", "v", q, 3, bd, m = 2, k = 2, shortlist = 8)
      .select("rank", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rf.toSeq === rd.toSeq)
  }

  test("ivfTrain on array<double> matches array<float>; corpus<k is clear") {
    val dv = vecs.select(col("id"),
      transform(col("v"), x => x.cast("double")).as("v"))
    val cf = Similarity.ivfTrain(vecs, "id", "v", k = 2, iters = 2)
    val cd = Similarity.ivfTrain(dv, "id", "v", k = 2, iters = 2)
    assert(cf.map(_.toSeq) === cd.map(_.toSeq))
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTrain(vecs.limit(1), "id", "v", k = 2)
    }
    assert(e.getMessage.contains("at least k=2"))
    val iv = vecs.select(col("id"), transform(col("v"), x => x.cast("int")).as("v"))
    intercept[IllegalArgumentException] {
      Similarity.ivfTrain(iv, "id", "v", k = 2)
    }
  }

  test("fewer corpus rows than k codewords fails with a clear error") {
    val tiny = vecs.limit(2)
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTrain(tiny, "id", "v", m = 2, k = 4)
    }
    assert(e.getMessage.contains("at least k=4"))
  }

  test("dim must divide into m subspaces; query dim validated") {
    intercept[IllegalArgumentException] {
      Similarity.pqTrain(vecs, "id", "v", m = 3, k = 2)
    }
    val books = Similarity.pqTrain(vecs, "id", "v", m = 2, k = 2)
    intercept[IllegalArgumentException] {
      Similarity.topKPq(vecs, "id", "v", Seq(1.0f, 0.0f), 2, books, m = 2, k = 2)
    }
  }
}
