package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[TextCorpus.dsirScores]]/[[TextCorpus.dsirSelect]] — hashed-bigram
  * importance weighting for data selection: target-like source docs score
  * above target-unlike ones, target rows never appear in the output, the
  * arithmetic is integer-exact, and the top-k order is total. */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  test("target-like sources outrank target-unlike; targets excluded") {
    // target distribution: docs over the "alpha beta gamma" vocabulary;
    // src A reuses the target's exact bigrams, src B is disjoint
    val target = (0L until 8L).map(i => (i, "alpha beta gamma alpha beta", true))
    val srcA = Seq((100L, "alpha beta gamma alpha", false))
    val srcB = Seq((200L, "zeta eta theta iota", false))
    val df = (target ++ srcA ++ srcB).toDF("doc_id", "text", "tgt")
    val got = TextCorpus.dsirScores(df, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    Caching.release()
    assert(got.keySet == Set(100L, 200L), "only SOURCE docs are scored")
    val (nA, scoreA) = got(100L)
    val (nB, scoreB) = got(200L)
    assert(nA == 3L && nB == 3L)
    assert(scoreA > scoreB,
      s"target-bigram doc must outrank disjoint doc ($scoreA vs $scoreB)")
    // integer exactness of one weight: "alpha beta" occurs 2x in each of
    // 8 target docs (tf=16) and once in srcA (sf=1) → w = 17_000_000 div 2
    // = 8_500_000; srcB's three bigrams are source-only singletons:
    // w = (0+1)*1e6 div (1+1) = 500_000 each → score exactly 1_500_000
    assert(scoreB == 1500000L, s"srcB score $scoreB")
  }

  test("dsirSelect: deterministic top-k, ties broken by id, TakeOrdered plan") {
    // many identical source docs → identical scores; k cuts INSIDE the tie
    val target = Seq((0L, "a b c", true))
    val sources = (10L until 30L).map(i => (i, "a b c", false))
    val df = (target ++ sources).toDF("doc_id", "text", "tgt")
    val sel = TextCorpus.dsirSelect(df, "doc_id", "text", col("tgt"), k = 5)
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrdered, got:\n$plan")
    // the weight table (≤4096 rows) joins BROADCAST into the scoring pass
    // — corpus postings must never shuffle for the join
    assert(plan.contains("BroadcastHashJoin"),
      s"weights must broadcast into the scoring join, got:\n$plan")
    val ids = sel.collect().map(_.getLong(0)).toSeq
    Caching.release()
    assert(ids == (10L until 15L).toSeq, s"tie broken by id asc: $ids")
  }

  test("docs under two tokens produce no score row") {
    val df = Seq((0L, "a b c d", true), (1L, "solo", false),
      (2L, "a b", false)).toDF("doc_id", "text", "tgt")
    val got = TextCorpus.dsirScores(df, "doc_id", "text", col("tgt"))
      .collect().map(_.getLong(0)).toSet
    Caching.release()
    assert(got == Set(2L))
  }

  /** The dsirSample race replayed in plain Scala — the same LCG, bucket
    * split, exponential table, and double-division key the operator (and
    * its SQL oracle) use. */
  private def raceModel(
      scores: Map[Long, Long], seed: Long, k: Int): Seq[Long] = {
    val m = 2147483648L
    val width = m / TextCorpus.DsirSampleBuckets
    scores.toSeq.filter(_._2 > 0L).map { case (id, w) =>
      val key = ((((id % m + m) % m + seed % m) % m) * 1103515245L + 12345L) % m
      val e = TextCorpus.dsirExpTableX1e6((key / width).toInt)
      (e.toDouble / w.toDouble, id)
    }.sorted.take(k).map(_._2)
  }

  test("dsirSample: model-exact, deterministic, partition-invariant") {
    // heavy doc 100 reuses target bigrams; 20 light docs are disjoint
    val target = (0L until 6L).map(i => (i, "alpha beta gamma alpha beta", true))
    val heavy = Seq((100L, Array.fill(8)("alpha beta gamma").mkString(" "), false))
    // mid-score doc: ~2× a light doc — enough to be favored, not enough
    // to always win (the witness that this is SAMPLING, not ranking)
    val mid = Seq((150L, "alpha beta gamma alpha beta", false))
    val light = (200L until 220L).map(i =>
      (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e", false))
    val df = (target ++ heavy ++ mid ++ light).toDF("doc_id", "text", "tgt")
    val scores = TextCorpus.dsirScores(df, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    Caching.release()
    Seq(7L, 8L).foreach { seed =>
      val expected = raceModel(scores, seed, k = 5)
      val got = TextCorpus.dsirSample(df, "doc_id", "text", col("tgt"),
        k = 5, seed = seed).collect().map(_.getLong(0)).toSeq
      Caching.release()
      assert(got == expected, s"seed $seed: engine $got vs model $expected")
      // partition-invariance: the selection is a pure function of
      // (id, seed, corpus content) — any physical layout must agree
      val got17 = TextCorpus.dsirSample(df.repartition(17), "doc_id", "text",
        col("tgt"), k = 5, seed = seed).collect().map(_.getLong(0)).toSeq
      Caching.release()
      assert(got17 == expected, s"seed $seed at 17 partitions: $got17")
    }
    // different seeds draw different exponential clocks: across 64 seeds
    // the model must not produce one constant selection (and the heavy
    // doc must sometimes lose — it is SAMPLING, not ranking)
    val draws = (0L until 64L).map(s => raceModel(scores, s, k = 5))
    assert(draws.distinct.size > 10, "seeds must vary the selection")
    val midIn = draws.count(_.contains(150L))
    assert(midIn > 0 && midIn < 64,
      s"mid-score doc must win some draws and lose others ($midIn/64)")
    // ...while selection stays ∝ score: the heavy doc (score ≫ each
    // light doc's) survives in the large majority of draws
    val heavyWins = draws.count(_.contains(100L))
    assert(scores(100L) > 10L * scores(200L),
      s"corpus must be skewed for the test to bite (${scores(100L)} vs ${scores(200L)})")
    assert(heavyWins >= 48, s"heavy doc selected only $heavyWins/64")
  }

  test("dsirSample: plan shape (TakeOrdered + broadcast weights)") {
    // zero-score docs (every feature driven to wf = 0 by > 1e6 source-only
    // occurrences) are excluded by the score > 0 filter — unreachable at
    // spec scale, so the pin here is the plan shape the 100 TB story
    // depends on: top-k as TakeOrdered, weight table broadcast
    val target = Seq((0L, "a b c", true))
    val sources = (10L until 40L).map(i => (i, s"x${i} y${i} z${i}", false))
    val df = (target ++ sources).toDF("doc_id", "text", "tgt")
    val sel = TextCorpus.dsirSample(df, "doc_id", "text", col("tgt"),
      k = 7, seed = 3L)
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"sampling top-k must plan as TakeOrdered, got:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"weights must broadcast into the scoring join, got:\n$plan")
    val got = sel.collect().map(_.getLong(0)).toSeq
    Caching.release()
    assert(got.size == 7 && got.toSet.subsetOf((10L until 40L).toSet))
  }
}
