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
}
