package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.TextFunctions

/** Real BPE: the greedy rank-ordered merge loop (apply) and the
  * word-histogram trainer, against hand-computed expectations. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  private def enc(text: String, merges: Seq[(String, String)]): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(TextFunctions.bpeTokens(col("t"), merges).as("tk"))
      .head().getSeq[String](0)

  test("applies merges by rank, all occurrences, left to right") {
    // rank 0 (l,o) fires before rank 1 (lo,w) even though (o,w) adjacency
    // appears first in the word scan
    assert(enc("low", Seq(("l", "o"), ("lo", "w"))) === Seq("low"))
    // chaining: merged tokens feed later merges, and every ranked pair
    // applies: l,o → lo | lo,w → low | e,r → er
    assert(enc("lower", Seq(("l", "o"), ("lo", "w"), ("e", "r"))) ===
      Seq("low", "er"))
    // all occurrences of the best pair merge in one round, left to right:
    // aaaa with (a,a) → aa aa (non-overlapping), then (aa,aa) if ranked
    assert(enc("aaaa", Seq(("a", "a"))) === Seq("aa", "aa"))
    assert(enc("aaaa", Seq(("a", "a"), ("aa", "aa"))) === Seq("aaaa"))
    assert(enc("aaa", Seq(("a", "a"))) === Seq("aa", "a"))
  }

  test("words are independent; whitespace never merges; unicode survives") {
    assert(enc("ab ab", Seq(("a", "b"))) === Seq("ab", "ab"))
    // pair split across words must NOT merge
    assert(enc("a b", Seq(("a", "b"))) === Seq("a", "b"))
    // code points, not UTF-16 units: emoji are single initial tokens
    assert(enc("a😀b", Seq(("a", "😀"))) ===
      Seq("a😀", "b"))
    // unknown chars pass through untouched
    assert(enc("xyz", Seq(("a", "b"))) === Seq("x", "y", "z"))
  }

  test("token count composes with the tokens") {
    val merges = Seq(("t", "h"), ("e", "r"))
    val df = Seq((1L, "thether"), (2L, "er er")).toDF("id", "t")
    val counts = df.select(col("id"),
        TextFunctions.bpeTokenCount(col("t"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "the ther": one word "thether"? no — "the ther" are two words; here
    // "thether" single word: th,e,th,er → 4... the fixture is "the ther"?
    // Actual input "theth er" avoided: "the ther" → th,e | th,er
    assert(counts(1L) === 4L) // "thether": th e th er
    assert(counts(2L) === 2L) // "er er": er | er
  }

  test("trainer recovers the classic merges from a tiny corpus") {
    // Sennrich's running example shape: "low" x5, "lower" x2 — most
    // frequent pair is (l,o) with 7, then (lo,w) with 7, then (w,e) 2...
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val merges = TextCorpus.bpeTrainMerges(corpus, "text", numMerges = 3)
    Dedup.releaseIntermediates()
    assert(merges.take(2) === Seq(("l", "o"), ("lo", "w")))
    // third merge: pairs in "lower" segmented [low, e, r]: (low,e) 2,
    // (e,r) 2 — tie broken by pair string asc: "e r" < "low e"
    assert(merges(2) === ("e", "r"))
  }

  test("trainer stops when no pair remains") {
    val corpus = Seq((1L, "ab")).toDF("id", "text")
    val merges = TextCorpus.bpeTrainMerges(corpus, "text", numMerges = 10)
    Dedup.releaseIntermediates()
    // one merge exhausts the corpus (single word collapses to one token)
    assert(merges === Seq(("a", "b")))
  }

  /** Reference trainer: full greedy re-segmentation of EVERY word each
    * round (the shape the pre-round-9 per-merge Spark loop computed),
    * using the same kernel — the oracle for the incremental driver loop. */
  private def naiveTrain(
      hist: Array[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    import org.apache.spark.unsafe.types.UTF8String
    val ranks = new java.util.HashMap[String, Integer]()
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val cnt = scala.collection.mutable.HashMap[String, Long]()
      hist.foreach { case (w, n) =>
        val seg = graft.functions.HashKernels.bpeEncode(UTF8String.fromString(w), ranks)
        val tk = (0 until seg.numElements()).map(j => seg.getUTF8String(j).toString)
        var x = 0
        while (x < tk.length - 1) {
          val p = tk(x) + " " + tk(x + 1)
          cnt(p) = cnt.getOrElse(p, 0L) + n
          x += 1
        }
      }
      if (cnt.isEmpty) exhausted = true
      else {
        val (bestP, _) = cnt.minBy { case (p, c) => (-c, p) }
        val Array(a, b) = bestP.split(" ", 2)
        merges += ((a, b))
        ranks.put(bestP, Integer.valueOf(round))
      }
      round += 1
    }
    merges.toSeq
  }

  test("incremental driver trainer matches full re-segmentation, merge for merge") {
    // small alphabet + skewed freqs force heavy merge chaining, ties, and
    // words re-touched by many rounds — the cases the incremental
    // bookkeeping must get right
    val rnd = new scala.util.Random(42)
    val hist = (0 until 300).map { i =>
      val len = 3 + rnd.nextInt(8)
      val w = (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      (w, (1 + rnd.nextInt(50)).toLong)
    }.distinct.toMap.toArray.sortBy { case (w, n) => (-n, w) }
    val expect = naiveTrain(hist, 80)
    val got = TextCorpus.trainMergesDriver(hist, 80)
    assert(got === expect)
    // and exhaustion agrees on a corpus that runs dry
    val tiny = Array(("abc", 3L), ("abd", 1L))
    assert(TextCorpus.trainMergesDriver(tiny, 50) === naiveTrain(tiny, 50))
  }

  test("500-merge train completes in seconds (driver-side loop)") {
    val rnd = new scala.util.Random(7)
    val docs = (0 until 2000).map { i =>
      val words = (0 until 20).map { _ =>
        val len = 4 + rnd.nextInt(9)
        (0 until len).map(_ => ('a' + rnd.nextInt(10)).toChar).mkString
      }
      (i.toLong, words.mkString(" "))
    }.toDF("id", "text")
    val t0 = System.nanoTime()
    val merges = TextCorpus.bpeTrainMerges(docs, "text", numMerges = 500)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"500 merges in $secs%.1f s")
    assert(merges.size === 500)
    assert(secs < 60.0, f"driver-side train took $secs%.1f s — should be seconds")
    // the learned table is usable by the codegen'd apply
    val n = docs.select(TextFunctions.bpeTokenCount(col("text"), merges).as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(n > 0L)
  }
}
