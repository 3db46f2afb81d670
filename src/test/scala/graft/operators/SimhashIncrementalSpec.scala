package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Persisted-index incremental SimHash: exact pigeonhole recall against a
  * brute-force cross reference (plain and hot-bucket sub-banded paths),
  * parquet round trip of the build metadata, param-mismatch refusals, and
  * the re-ingest guard. */
class SimhashIncrementalSpec extends SparkSuite {
  import spark.implicits._

  private def corpus(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    (0 until n).map { i =>
      // near-dup clusters: base doc per group of 4, light per-copy edits
      val base = Seq.fill(12)(words(rnd.nextInt(words.length)))
      val doc = base.updated(rnd.nextInt(12), words(rnd.nextInt(words.length)))
      (i.toLong, doc.mkString(" "))
    }
  }

  /** Brute-force truth: all (index, batch) sig pairs at hamming ≤ maxH. */
  private def truth(index: Seq[(Long, String)], batch: Seq[(Long, String)],
      maxHamming: Int, numChunks: Int): Set[(Long, Long, Long)] = {
    def sigs(rows: Seq[(Long, String)]) =
      Dedup.simhashed(rows.toDF("id", "text"), "id", "text")
        .as[(Long, Long)].collect().toMap
    val si = sigs(index)
    val sb = sigs(batch)
    (for {
      (ia, sa) <- si.toSeq; (ib, sbv) <- sb.toSeq
      if ia != ib
      h = java.lang.Long.bitCount(sa ^ sbv).toLong
      if h <= maxHamming
    } yield (ia, ib, h)).toSet
  }

  test("incremental pairs equal the brute-force cross reference (plain + hot paths)") {
    val index = corpus(60, 11)
    val batch = corpus(25, 12).map { case (i, t) => (i + 1000L, t) }
    Seq(1000, 2).foreach { maxBucket => // 2 forces the sub-banded hot path
      val idx = Dedup.simhashIndex(index.toDF("id", "text"), "id", "text",
        numChunks = 8)
      val got = Dedup.simhashIncremental(batch.toDF("id", "text"), idx,
        "id", "text", maxHamming = 7, maxBucketSize = maxBucket)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == truth(index, batch, 7, 8), s"maxBucketSize=$maxBucket")
      assert(got.nonEmpty, "fixture must produce cross pairs")
    }
  }

  test("index round-trips through parquet with its build metadata") {
    val dir = tmpDir("simhash-idx")
    Dedup.simhashIndex(corpus(30, 3).toDF("id", "text"), "id", "text",
      numChunks = 8, polyHash = true).write.mode("overwrite").parquet(dir)
    val idx = spark.read.parquet(dir)
    val m = idx.schema("sig").metadata
    assert(m.getLong(Dedup.SimhashMetaNumChunks) == 8L)
    assert(m.getBoolean(Dedup.SimhashMetaPoly))
    // and the restored index answers queries (poly sigs on both sides)
    val batch = corpus(30, 3).map { case (i, t) => (i + 500L, t) }
    val got = Dedup.simhashIncremental(batch.toDF("id", "text"), idx,
      "id", "text", maxHamming = 7)
    // every doc re-appears under a shifted id: its exact copy pairs at 0
    assert(got.filter(col("hamming") === 0L).count() >= 30L)
  }

  test("param mismatches and unbuilt indexes are refused") {
    val idx = Dedup.simhashIndex(corpus(5, 7).toDF("id", "text"), "id", "text",
      numChunks = 4)
    val batch = corpus(3, 8).toDF("id", "text")
    val e = intercept[IllegalArgumentException](
      Dedup.simhashIncremental(batch, idx, "id", "text", maxHamming = 4))
    assert(e.getMessage.contains("numChunks"), e.getMessage)
    val bare = corpus(5, 7).toDF("id", "text")
      .select(col("id"), lit(0L).as("sig"))
    intercept[IllegalArgumentException](
      Dedup.simhashIncremental(batch, bare, "id", "text"))
  }

  test("re-ingest guard: a batch doc under its existing id never self-pairs") {
    val rows = corpus(10, 21)
    val idx = Dedup.simhashIndex(rows.toDF("id", "text"), "id", "text",
      numChunks = 8)
    val got = Dedup.simhashIncremental(rows.toDF("id", "text"), idx,
      "id", "text", maxHamming = 7)
      .as[(Long, Long, Long)].collect()
    assert(got.forall { case (a, b, _) => a != b })
  }
}
