package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** editDistancePairs ≡ brute force on randomized corpora — the pruning
  * layers (length band, q-gram count filter, banded DP) must be
  * recall-complete, including short-string and empty-string edges. */
class EditDistSpec extends SparkSuite {
  import spark.implicits._

  private def brute(docs: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      dist = lev(ta, tb) if dist <= d
    } yield (ia, ib, dist.toLong)).toSet

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("randomized corpus with planted near-duplicates matches brute force") {
    val rnd = new scala.util.Random(1234)
    val alphabet = "abcdef"
    def word(n: Int) = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    val originals = (0L until 60L).map(i => (i, word(20 + rnd.nextInt(60))))
    // plant mutated copies: deletes, substitutions, inserts
    val mutated = originals.take(20).map { case (i, s) =>
      val b = new StringBuilder(s)
      (0 until rnd.nextInt(4)).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 if b.nonEmpty => b.deleteCharAt(rnd.nextInt(b.length))
          case 1 if b.nonEmpty => b.setCharAt(rnd.nextInt(b.length), alphabet(rnd.nextInt(6)))
          case _ => b.insert(rnd.nextInt(b.length + 1), alphabet(rnd.nextInt(6)))
        }
      }
      (i + 1000L, b.toString)
    }
    // edge cases: empty and sub-q-length strings
    val edges = Seq((5000L, ""), (5001L, ""), (5002L, "ab"), (5003L, "ac"), (5004L, "abc"))
    val docs = originals ++ mutated ++ edges
    for (d <- Seq(0, 2, 5)) {
      val got = Dedup.editDistancePairs(
          docs.toDF("id", "txt"), "id", "txt", maxDist = d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == brute(docs, d), s"mismatch at maxDist=$d")
    }
  }

  test("length-skewed corpus: prefix candidates stay far below the length-band count") {
    // every doc has the SAME length — a length-band-only candidate scheme
    // enumerates all n·(n−1)/2 pairs; rare-q-gram prefixes must not
    val rnd = new scala.util.Random(77)
    val alphabet = "abcdefghijklmnopqrstuvwxyz"
    def word(n: Int) = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    val n = 400
    val originals = (0L until n.toLong).map(i => (i, word(64)))
    // a handful of planted near-dups so the answer is non-trivial
    val mutated = originals.take(10).map { case (i, s) =>
      val b = new StringBuilder(s); b.setCharAt(rnd.nextInt(b.length), 'Z')
      (i + 10000L, b.toString)
    }
    val docs = originals ++ mutated
    val d = 2
    val obs = new org.apache.spark.sql.Observation("ed-cands")
    val got = Dedup.editDistancePairs(
        docs.toDF("id", "txt"), "id", "txt", maxDist = d, candidateObs = Some(obs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute(docs, d), "exactness on the skewed corpus")
    // the count a length-band join key would have produced
    val bandPairs = (for {
      (ia, ta) <- docs; (ib, tb) <- docs
      if ia < ib && math.abs(ta.length - tb.length) <= d
    } yield 1).size.toLong
    val cands = obs.get("candidates").asInstanceOf[Long]
    assert(bandPairs == (docs.size.toLong * (docs.size - 1)) / 2,
      "corpus must be fully length-degenerate for the test to bite")
    assert(cands < bandPairs / 10,
      s"prefix join produced $cands candidates vs $bandPairs length-band pairs")
  }

  test("maxDocFreq cap drops boilerplate q-grams from the index") {
    // 50 docs sharing a huge common prefix, distinct rare tails: the cap
    // documented-ly trades exactness for skew control — pairs whose ONLY
    // shared q-grams are hot may be lost, everything emitted is still exact
    val common = "the quick brown fox jumps over the lazy dog " * 3
    val docs = (0L until 50L).map(i => (i, common + s"tail-$i-${i * 31}"))
    val full = Dedup.editDistancePairs(
        docs.toDF("id", "txt"), "id", "txt", maxDist = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.editDistancePairs(
        docs.toDF("id", "txt"), "id", "txt", maxDist = 15, maxDocFreq = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(full), "cap must never invent pairs")
    // every capped survivor is a true <= maxDist pair
    val byId = docs.toMap
    capped.foreach { case (a, b) => assert(lev(byId(a), byId(b)) <= 15) }
  }

  test("incremental: index + batch matches brute cross truth through parquet") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdef"
    def word(n: Int) = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    val corpus = (0L until 50L).map(i => (i, word(15 + rnd.nextInt(40)))) ++
      // short/sub-q corpus docs: the short×short path must cover them
      Seq((900L, ""), (901L, "ab"), (902L, "xy"))
    val batch = corpus.take(12).map { case (i, s) =>
      val b = new StringBuilder(s)
      (0 until rnd.nextInt(3)).foreach { _ =>
        if (b.nonEmpty) b.setCharAt(rnd.nextInt(b.length), alphabet(rnd.nextInt(6)))
      }
      (i + 5000L, b.toString)
    } ++ Seq((5900L, "a"), (5901L, "zz")) // short batch docs, incl. q-gram-free
    val dir = tmpDir("ed-idx")
    Dedup.editDistanceIndex(corpus.toDF("id", "txt"), "id", "txt",
      maxDist = 4).write.mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)
    val got = Dedup.editDistanceIncremental(batch.toDF("id", "txt"),
        index, "id", "txt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (ia, ta) <- corpus; (ib, tb) <- batch
      dist = lev(ta, tb) if dist <= 4
    } yield (ia, ib, dist.toLong)).toSet
    assert(got == want)
  }

  test("incremental: re-ingest under the same id never self-pairs; bad index refuses") {
    val corpus = Seq((1L, "hello world"), (2L, "goodbye moon"))
    val dir = tmpDir("ed-idx2")
    Dedup.editDistanceIndex(corpus.toDF("id", "txt"), "id", "txt",
      maxDist = 3).write.mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)
    // doc 1 re-ingested verbatim under its own id: pairs with nothing
    // (dist 0 to itself is guarded, dist to doc 2 is over budget)
    val got = Dedup.editDistanceIncremental(
      Seq((1L, "hello world")).toDF("id", "txt"), index, "id", "txt").collect()
    assert(got.isEmpty)
    // an index missing the build metadata refuses loudly
    val stripped = index.select(col("id"), col("txt"), col("len"),
      col("nq"), col("qg"),
      col("prefix").as("prefix", org.apache.spark.sql.types.Metadata.empty))
    val e = intercept[IllegalArgumentException] {
      Dedup.editDistanceIncremental(
        Seq((9L, "x")).toDF("id", "txt"), stripped, "id", "txt")
    }
    assert(e.getMessage.contains("editDistanceIndex"))
  }
}
