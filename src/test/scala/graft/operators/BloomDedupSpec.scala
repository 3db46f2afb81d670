package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Incremental exact dedup, history-probe strategies: all three execution
  * strategies must return the identical row set (the strategy dial changes
  * the PLAN shape, never the contract), the probe/bloom plans must never
  * shuffle the seen side, and the bloom expression must agree with how
  * `DataFrameStatFunctions.bloomFilter` inserts string values (no false
  * negatives — the exactness of the bloom strategy rests on it). */
class BloomDedupSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox"),
    (2L, "jumps over the lazy dog"),
    (3L, "pack my box with five dozen jugs"),
    (4L, "sphinx of black quartz judge my vow")).toDF("id", "text")

  private def batch = Seq(
    (11L, "THE  QUICK   brown fox"), // normalizes to doc 1 → dupe
    (12L, "jumps over the lazy dog"), // exact copy of doc 2 → dupe
    (13L, "a genuinely novel document"), // new
    (14L, "another new document entirely"), // new
    (15L, "another new document entirely")).toDF("id", "text") // batch-internal dupe: BOTH kept

  test("join, probe and bloom strategies return identical results") {
    val seen = Dedup.exact(corpus, "id", "text").select("fp")
    val expected = Set(13L, 14L, 15L)
    for (strategy <- Seq("join", "probe", "bloom")) {
      val out = Dedup.exactIncremental(batch, "id", "text", seen,
        strategy = strategy)
      assert(out.select("id").as[Long].collect().toSet === expected,
        s"strategy=$strategy")
      Dedup.releaseIntermediates()
    }
  }

  test("probe and bloom never shuffle the seen side (no sort-merge join)") {
    val seen = Dedup.exact(corpus, "id", "text").select("fp")
    for (strategy <- Seq("probe", "bloom")) {
      val out = Dedup.exactIncremental(batch, "id", "text", seen,
        strategy = strategy)
      out.collect() // AQE finalizes the plan on execution
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        s"strategy=$strategy shuffled a join side:\n$plan")
      assert(plan.contains("BroadcastHashJoin"), s"strategy=$strategy:\n$plan")
      Dedup.releaseIntermediates()
    }
  }

  test("bloom expression has no false negatives against stat.bloomFilter") {
    // 1000 fingerprints inserted driver-side through the public sketch
    // API; the codegen'd probe must see every one of them (false
    // POSITIVES are fine and expected at the configured fpp)
    val fps = spark.range(1000).select(md5(concat(lit("doc-"), col("id"))).as("fp"))
    val bloom = fps.stat.bloomFilter("fp", 1000, 0.01)
    val misses = fps.filter(
      !graft.functions.NativeHash.bloomMightContain(col("fp"), bloom)).count()
    assert(misses === 0L)
    // and the probe really does filter: disjoint values mostly rejected
    val others = spark.range(1000)
      .select(md5(concat(lit("other-"), col("id"))).as("fp"))
    val accepted = others.filter(
      graft.functions.NativeHash.bloomMightContain(col("fp"), bloom)).count()
    assert(accepted < 100L, s"fpp blew past 10x nominal: $accepted/1000")
  }

  test("bloom strategy is exact even at absurd false-positive rates") {
    // fpp=0.5 floods the hit set with false positives; the exact
    // anti-join must still discard every one of them
    val seen = Dedup.exact(corpus, "id", "text").select("fp")
    val out = Dedup.exactIncremental(batch, "id", "text", seen,
      strategy = "bloom", bloomFpp = 0.5)
    assert(out.select("id").as[Long].collect().toSet === Set(13L, 14L, 15L))
    Dedup.releaseIntermediates()
  }

  test("unknown strategy is rejected") {
    val seen = Dedup.exact(corpus, "id", "text").select("fp")
    intercept[IllegalArgumentException] {
      Dedup.exactIncremental(batch, "id", "text", seen, strategy = "nope")
    }
  }
}
