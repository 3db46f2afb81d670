package graft.operators

import scala.util.Random

import graft.SparkSuite

/** Exact substring (span) dedup — `Dedup.duplicateSpans` must equal a
  * driver-side brute force (positional k-grams, duplicated-gram positions,
  * interval merge) on randomized corpora with planted duplicated runs. */
class SpanDedupSpec extends SparkSuite {
  import spark.implicits._

  /** Brute-force maximal duplicated spans over single-space tokenized docs. */
  private def brute(docs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] = {
    val grams = docs.flatMap { case (id, text) =>
      val t = text.split(" ", -1)
      (0 to t.length - k).map(p => (id, p.toLong, t.slice(p, p + k).mkString(" ")))
    }
    val dupGrams = grams.groupBy(_._3).filter(_._2.size > 1).keySet
    grams.filter(g => dupGrams(g._3)).groupBy(_._1).flatMap { case (id, gs) =>
      val ps = gs.map(_._2).distinct.sorted
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      ps.foreach { p =>
        if (spans.nonEmpty && p - (spans.last._2 - k + 1) <= k)
          spans(spans.size - 1) = (spans.last._1, p + k - 1)
        else spans += ((p, p + k - 1))
      }
      spans.map { case (a, b) => (id, a, b) }
    }.toSet
  }

  private def run(docs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long)] =
    Dedup.duplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("planted duplicated runs produce exactly the merged spans") {
    val boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"one two three $boiler four five six seven eight nine ten eleven"),
      (2L, s"red green blue $boiler cyan magenta yellow black white gray pink"),
      // doc 3 repeats the boilerplate WITHIN itself
      (3L, s"$boiler mid1 mid2 mid3 mid4 mid5 mid6 mid7 mid8 mid9 $boiler"),
      (4L, "lonely words that appear nowhere else in this small corpus here"))
    val k = 8
    val got = run(docs, k)
    assert(got == brute(docs, k))
    // the 10-token boilerplate is a maximal [start, start+9] span in docs 1-2
    assert(got.contains((1L, 3L, 12L)) && got.contains((2L, 3L, 12L)))
    assert(!got.exists(_._1 == 4L))
  }

  test("randomized corpora with mutations match brute force") {
    val rnd = new Random(20260813L)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    (1 to 5).foreach { trial =>
      val base = (1 to 12).map(_ =>
        (1 to 15 + rnd.nextInt(25)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      // copies with point mutations: shared prefixes/suffixes become spans
      val mutated = base.take(6).map { t =>
        val toks = t.split(" ", -1)
        val i = rnd.nextInt(toks.length)
        toks.updated(i, "Z" + rnd.nextInt(3)).mkString(" ")
      }
      val docs = (base ++ mutated).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val k = 5 + rnd.nextInt(3)
      assert(run(docs, k) == brute(docs, k), s"trial $trial k=$k")
    }
  }

  test("docs shorter than k and empty corpus yield no spans") {
    assert(run(Seq((1L, "too short"), (2L, "also tiny")), 8).isEmpty)
    assert(run(Seq.empty[(Long, String)], 8).isEmpty)
  }

  test("native window-hash kernel ≡ xxhash64 over built gram strings") {
    import org.apache.spark.sql.functions._
    // multi-space runs, unicode, supplementary plane, leading/trailing
    // spaces, exactly-k and shorter-than-k docs
    val texts = Seq(
      "plain words here four five six",
      "double  space   runs keep empty tokens intact yes",
      " leading and trailing spaces ",
      "unicode café straße 中文 😀 mixed byte widths ok",
      "exactly three tok", "too short", "")
    val k = 3
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val native = df.select(col("id"),
        posexplode(graft.functions.NativeHash.kgramWindowHashes(col("text"), k))
          .as(Seq("pos", "h")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val viaStrings = df
      .select(col("id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= k)
      .select(col("id"), posexplode(transform(sequence(lit(0), size(col("t")) - k),
        i => concat_ws(" ", slice(col("t"), i + 1, lit(k))))).as(Seq("pos", "g")))
      .withColumn("h", xxhash64(col("g")))
      .select("id", "pos", "h")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(native == viaStrings)
    // the kernel is also a registered SQL function
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT graft_kgram_hashes('a b c d', 3) AS h")
      .head().getSeq[Long](0)
    val expect = spark.sql(
      "SELECT array(xxhash64('a b c'), xxhash64('b c d')) AS h").head().getSeq[Long](0)
    assert(viaSql == expect)
  }

  test("removeSpans cuts flagged tokens, passes clean docs through") {
    val docs = Seq(
      (1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"),
      (2L, "untouched text stays exactly as written"),
      (3L, "x0 x1 x2 x3 x4 x5")).toDF("doc_id", "text")
    val spans = Seq(
      (1L, 2L, 4L), (1L, 7L, 8L), // two spans in doc 1
      (3L, 0L, 5L)) // doc 3 fully covered
      .toDF("doc_id", "span_start", "span_end")
    val got = Dedup.removeSpans(docs, "doc_id", "text", spans)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "w0 w1 w5 w6 w9",
      2L -> "untouched text stays exactly as written",
      3L -> ""))
  }

  test("persistPositions mode agrees with the recompute default; counter observes") {
    val boiler = "p q r s t u v w x y"
    val docs = Seq(
      (1L, s"a1 a2 a3 $boiler a4 $boiler a5"),
      (2L, s"b1 b2 $boiler b3 b4 b5 b6 b7"),
      (3L, "all unique tokens here nothing repeats at window scale ever"))
      .toDF("doc_id", "text")
    def run(persist: Boolean) =
      Dedup.duplicateSpans(docs, "doc_id", "text", 8, persistPositions = persist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (re, pe) = (run(false), run(true))
    assert(re == pe, s"modes diverged: $re vs $pe")
    assert(re.nonEmpty)
    Dedup.releaseIntermediates()
    // the audit counter sees the hash-matched candidate-position volume
    val obs = org.apache.spark.sql.Observation()
    val n = Dedup.duplicateSpans(docs, "doc_id", "text", 8,
      candidateObs = Some(obs)).count()
    assert(n == re.size.toLong)
    assert(obs.get("candidates").asInstanceOf[Long] > 0L)
  }

  test("cross-corpus contamination finds exactly the benchmark-verbatim spans") {
    val leak = "q1 q2 q3 q4 q5 q6 q7 q8"
    val train = Seq(
      (1L, s"t1 t2 $leak t3 t4 t5 t6 t7"), // contains the benchmark span
      (2L, "clean doc nothing shared with benchmark at all here"),
      (3L, s"$leak x1 x2 x3 x4 x5 x6 x7")) // span at position 0
      .toDF("doc_id", "text")
    val bench = Seq((100L, s"intro words $leak outro words")).toDF("bid", "text")
    val got = Dedup.contaminatedSpans(train, "doc_id", "text", bench, "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1: leak at tokens 2..9; doc 3: tokens 0..7; doc 2 clean
    assert(got === Set((1L, 2L, 9L), (3L, 0L, 7L)))
    // composing with removeSpans scrubs the contamination
    val cleaned = Dedup.removeSpans(train, "doc_id", "text",
      Dedup.contaminatedSpans(train, "doc_id", "text", bench, "text", 8))
      .withColumnRenamed("clean_text", "text")
    assert(Dedup.contaminatedSpans(cleaned, "doc_id", "text", bench, "text", 8)
      .count() === 0L)
  }

  test("detect + apply leaves a corpus with no duplicated k-window") {
    val boiler = "p q r s t u v w x y"
    val docs = Seq(
      (1L, s"a1 a2 a3 $boiler a4 a5 a6 a7 a8"),
      (2L, s"b1 b2 b3 $boiler b4 b5 b6 b7 b8")).toDF("doc_id", "text")
    val k = 8
    val cleaned = Dedup.removeSpans(docs, "doc_id", "text",
      Dedup.duplicateSpans(docs, "doc_id", "text", k))
      .withColumnRenamed("clean_text", "text")
    assert(Dedup.duplicateSpans(cleaned, "doc_id", "text", k).count() == 0L)
  }
}
