package graft.operators

import graft.SparkSuite

/** r16 verdict item 8: pins the maxDocFreq CAP BOUNDARY of the size-floor
  * pushdown in [[Dedup.containmentPairs]]. Pushing `sz >= minShingles`
  * below [[Dedup]]'s capped posting index changes document frequencies:
  * a shingle whose df crossed the cap ONLY because of sub-floor docs now
  * stays indexed, so a capped run can recover in-contract pairs the
  * pre-pushdown index missed. Verification is exact, so recall can only
  * IMPROVE (new-output ⊇ old-output), never regress — this spec builds a
  * corpus where every shared shingle of the planted pair straddles the
  * cap exactly that way and asserts the pair is found, the capped output
  * equals the uncapped one, and capObs certifies the run as exact. */
class ContainmentCapBoundarySpec extends SparkSuite {
  import spark.implicits._

  test("shingle df straddling maxDocFreq across the size-floor: pair recovered, run exact") {
    // Doc A: 12 distinct words = 10 trigram shingles (sz exactly at the
    // minShingles=10 floor). Doc B quotes ALL of A plus a distinct tail —
    // containment(A in B) = 1.0, both sides in contract.
    val aWords = (1 to 12).map(i => s"a$i")
    val aText = aWords.mkString(" ")
    val bText = aText + " " + (1 to 5).map(i => s"b$i").mkString(" ")
    // Sub-floor fragments (each < 10 shingles — OUT of contract) that
    // together cover every trigram of A: with them counted, each shared
    // shingle has df = 3 (A, B, one fragment) > cap = 2 and the OLD
    // (pre-pushdown) index capped ALL of them — the pair was undiscoverable.
    // With the floor pushed below the index, fragments never enter the df
    // census: df = 2 <= cap, nothing is capped, the pair is found.
    val frags = Seq(
      aWords.slice(0, 6).mkString(" "),   // trigrams a1..a4 (4 shingles)
      aWords.slice(4, 10).mkString(" "),  // trigrams a5..a8 (4 shingles)
      aWords.slice(8, 12).mkString(" "))  // trigrams a9..a10 (2 shingles)
    val corpus = (Seq(1L -> aText, 2L -> bText) ++
      frags.zipWithIndex.map { case (t, i) => (10L + i) -> t })
      .toDF("doc_id", "text")

    val obsCap = new org.apache.spark.sql.Observation("cap-boundary")
    val capped = Dedup.containmentPairs(corpus, "doc_id", "text",
        threshold = 0.8, minShingles = 10, maxDocFreq = Some(2),
        capObs = Some(obsCap))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    Dedup.releaseIntermediates()
    val uncapped = Dedup.containmentPairs(corpus, "doc_id", "text",
        threshold = 0.8, minShingles = 10, maxDocFreq = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    Dedup.releaseIntermediates()

    // the straddling pair IS found under the cap (old index missed it)...
    assert(capped.get((1L, 2L)).contains(1000L),
      s"planted containment pair lost at the cap boundary: $capped")
    // ...and the capped run equals the exact (uncapped) answer: recall
    // only ever moves TOWARD the declared semantics
    assert(capped == uncapped, s"capped $capped != uncapped $uncapped")
    // capObs certifies exactness at runtime: post-floor, nothing crossed
    // the cap (the fragments that inflated df never entered the census)
    assert(obsCap.get("capped_shingles").asInstanceOf[Long] == 0L)
    assert(obsCap.get("capped_postings").asInstanceOf[Long] == 0L)
  }
}
