package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite
import graft.functions.{AcAutomaton, NativeHash}

/** Byte-level Aho–Corasick phrase-blocklist matcher: every-end-position
  * occurrence counting, fail-chain output folding, UTF-8 safety, and
  * codegen parity with a naive reference. */
class PhraseBlocklistSpec extends SparkSuite {
  import spark.implicits._

  /** Naive reference: count of (phrase, end position) pairs. */
  private def naive(text: String, phrases: Seq[String]): Long =
    phrases.map { p =>
      var c = 0L
      var i = text.indexOf(p)
      while (i >= 0) { c += 1; i = text.indexOf(p, i + 1) }
      c
    }.sum

  test("overlaps and fail-chain outputs count every end position") {
    val ac = new AcAutomaton(Seq("aa"))
    assert(ac.count(UTF8String.fromString("aaaa")) == 3L) // ends at 2,3,4
    // "b" ends wherever "ab" ends: the fail chain must fold both
    val ac2 = new AcAutomaton(Seq("ab", "b"))
    assert(ac2.count(UTF8String.fromString("ab")) == 2L)
    val ac3 = new AcAutomaton(Seq("a", "aa", "aab"))
    assert(ac3.count(UTF8String.fromString("aab")) == 4L) // a,a,aa,aab
    assert(new AcAutomaton(Seq("xyz")).count(UTF8String.fromString("xy")) == 0L)
  }

  test("randomized small-alphabet corpus equals the naive matcher") {
    val rnd = new scala.util.Random(1337)
    val phrases = Seq("ab", "ba", "aab", "bb", "a b", "abab")
    val ac = new AcAutomaton(phrases)
    (1 to 300).foreach { _ =>
      val s = Seq.fill(1 + rnd.nextInt(40))("ab b".charAt(rnd.nextInt(4))).mkString
      assert(ac.count(UTF8String.fromString(s)) == naive(s, phrases), s"text='$s'")
    }
  }

  test("randomized PHRASE SETS: automaton construction equals the naive matcher") {
    // random phrase sets stress goto/fail construction (shared prefixes,
    // phrases that are substrings/suffixes of each other), not just the
    // matching walk
    val rnd = new scala.util.Random(9001)
    (1 to 60).foreach { round =>
      val n = 1 + rnd.nextInt(6)
      val phrases = Seq.fill(n)(
        Seq.fill(1 + rnd.nextInt(5))("ab ".charAt(rnd.nextInt(3))).mkString).distinct
      val ac = new AcAutomaton(phrases)
      (1 to 20).foreach { _ =>
        val s = Seq.fill(rnd.nextInt(30))("ab ".charAt(rnd.nextInt(3))).mkString
        assert(ac.count(UTF8String.fromString(s)) == naive(s, phrases),
          s"round=$round phrases=$phrases text='$s'")
      }
    }
  }

  test("multi-byte UTF-8 phrases match exactly (self-synchronizing bytes)") {
    val ac = new AcAutomaton(Seq("héllo", "wörld"))
    assert(ac.count(UTF8String.fromString("héllo wörld héllo")) == 3L)
    assert(ac.count(UTF8String.fromString("hello world")) == 0L)
  }

  test("expression path (codegen) equals the naive reference over a DataFrame") {
    val phrases = Seq("scan filter", "slow table", "query spark hash", "key agg")
    val dir = tmpDir("phrase-plan")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val got = docs.select(col("doc_id"),
        NativeHash.phraseMatchCount(col("text"), phrases).as("hits"))
      .as[(Long, Long)].collect().toMap
    val want = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> naive(t, phrases) }.toMap
    assert(got == want)
    assert(got.values.sum > 0L, "fixture phrases must actually occur")
  }

  test("empty blocklists and empty phrases are refused") {
    intercept[IllegalArgumentException](new AcAutomaton(Nil))
    intercept[IllegalArgumentException](new AcAutomaton(Seq("ok", "")))
  }
}
