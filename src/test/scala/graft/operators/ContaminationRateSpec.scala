package graft.operators

import graft.SparkSuite

/** [[TextCorpus.contaminationRate]] (per-doc n-gram dirtiness permille) and
  * [[TextCorpus.keywordsTfidf]] (top-k rational-idf keywords): both must
  * equal direct driver references, and the rate's bench-set cap must
  * refuse loudly rather than truncate. */
class ContaminationRateSpec extends SparkSuite {
  import spark.implicits._

  private def norm(s: String): String =
    s.trim.toLowerCase.replaceAll("\\s+", " ")
  private def grams(text: String, n: Int): Seq[String] = {
    val t = norm(text).split(" ", -1).toSeq
    if (t.size < n) Seq.empty else t.sliding(n).map(_.mkString(" ")).toSeq
  }

  private val rnd = new scala.util.Random(77)
  private val vocab = Vector("ash", "birch", "cedar", "elm", "fir", "hazel",
    "larch", "maple", "oak", "pine", "rowan", "willow", "yew")
  private def sentence(n: Int): String =
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  private def referenceRate(
      train: Seq[(Long, String)], bench: Seq[String], n: Int): Map[Long, (Long, Long, Long)] = {
    val bset = bench.flatMap(grams(_, n)).toSet
    train.map { case (id, t) =>
      val dg = grams(t, n).distinct
      val hits = dg.count(bset)
      val pm = if (dg.nonEmpty) hits.toLong * 1000L / dg.size else 0L
      id -> ((dg.size.toLong, hits.toLong, pm))
    }.toMap
  }

  test("randomized corpus with planted benchmark passages matches the reference") {
    val benchTexts = (0 until 4).map(_ => sentence(30))
    val train = (0L until 25L).map { i =>
      val own = sentence(10 + rnd.nextInt(40))
      val t =
        if (i % 5 == 0) s"${benchTexts((i % 4).toInt)} $own" // partly dirty
        else if (i == 7L) benchTexts(1) // fully dirty
        else own
      (i, t)
    }
    val got = TextCorpus.contaminationRate(
      train.toDF("doc_id", "text"), "doc_id", "text",
      benchTexts.map(Tuple1(_)).toDF("text"), "text", n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == referenceRate(train, benchTexts, 5))
    // the fully-contaminated doc reads exactly 1000 permille
    assert(got(7L)._3 == 1000L)
  }

  test("documents shorter than n grams read 0 over 0") {
    val got = TextCorpus.contaminationRate(
      Seq((1L, "oak ash")).toDF("doc_id", "text"), "doc_id", "text",
      Seq(Tuple1(sentence(20))).toDF("text"), "text", n = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 0L, 0L)))
  }

  test("empty benchmark side yields zero hits, not a crash") {
    val got = TextCorpus.contaminationRate(
      Seq((1L, sentence(20))).toDF("doc_id", "text"), "doc_id", "text",
      Seq.empty[Tuple1[String]].toDF("text"), "text", n = 5)
      .collect().head
    assert(got.getLong(1) > 0L && got.getLong(2) == 0L && got.getLong(3) == 0L)
  }

  test("bench-set cap refuses loudly instead of truncating") {
    val e = intercept[IllegalStateException] {
      TextCorpus.contaminationRate(
        Seq((1L, sentence(10))).toDF("doc_id", "text"), "doc_id", "text",
        Seq(Tuple1(sentence(50))).toDF("text"), "text", n = 3,
        maxBenchGrams = 5)
    }
    assert(e.getMessage.contains("refusing a truncated reference set"))
  }

  private def referenceKeywords(
      docs: Seq[(Long, String)], k: Int): Set[(Long, String, Long, Long)] = {
    val n = docs.size.toLong
    val tf = docs.flatMap { case (id, t) => norm(t).split(" ", -1).map(w => (id, w)) }
      .groupBy(identity).map { case (key, v) => key -> v.size.toLong }
    val dfq = tf.keys.toSeq.groupBy(_._2).map { case (w, v) => w -> v.size.toLong }
    docs.flatMap { case (id, _) =>
      val scored = tf.collect { case ((d, w), c) if d == id =>
        (w, c * (n * 1000L / dfq(w)))
      }.toSeq.sortBy { case (w, s) => (-s, w) }
      scored.take(k).zipWithIndex.map { case ((w, s), i) =>
        (id, w, s, i + 1L)
      }
    }.toSet
  }

  test("keywords match the reference, ties broken (score desc, term asc)") {
    val docs = (0L until 15L).map(i => (i, sentence(8 + rnd.nextInt(25))))
    val got = TextCorpus.keywordsTfidf(docs.toDF("doc_id", "text"),
      "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == referenceKeywords(docs, 3))
  }

  test("k beyond a document's vocabulary returns all its terms") {
    val docs = Seq((1L, "oak ash oak"), (2L, sentence(20)))
    val got = TextCorpus.keywordsTfidf(docs.toDF("doc_id", "text"),
      "doc_id", "text", k = 10)
    assert(got.filter(got("doc_id") === 1L).count() == 2L)
    assert(got.collect().forall(_.getLong(3) <= 10L))
  }
}
