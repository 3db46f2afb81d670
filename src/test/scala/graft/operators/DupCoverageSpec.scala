package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.{NativeHash, TextFunctions}

/** [[NativeHash.dupNgramCoverage]] (Gopher duplicate-n-gram coverage,
  * token units, union semantics): the hash-sorted kernel must equal a
  * raw-string driver reference, overlaps must count once, and sub-k docs
  * read zero. */
class DupCoverageSpec extends SparkSuite {
  import spark.implicits._

  private def norm(s: String): String =
    s.trim.toLowerCase.replaceAll("\\s+", " ")

  /** Union coverage over raw gram strings. */
  private def reference(text: String, k: Int): Long = {
    val t = norm(text).split(" ", -1).toSeq
    if (t.size < k) return 0L
    val grams = t.sliding(k).toSeq
    val counts = grams.groupBy(identity).map { case (g, v) => g -> v.size }
    val covered = new Array[Boolean](t.size)
    grams.zipWithIndex.foreach { case (g, i) =>
      if (counts(g) >= 2) (i until i + k).foreach(covered(_) = true)
    }
    covered.count(identity).toLong
  }

  private def run(docs: Seq[(Long, String)], k: Int): Map[Long, Long] =
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), NativeHash.dupNgramCoverage(
        TextFunctions.normalizeWs(col("text")), k).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private val rnd = new scala.util.Random(29)
  private val vocab = Vector("ox", "elk", "ram", "sow", "hen", "cub", "doe")
  private def sentence(n: Int): String =
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  test("randomized small-vocab corpus matches the raw-string reference at k = 1..4") {
    val docs = (0L until 40L).map(i => (i, sentence(3 + rnd.nextInt(60))))
    for (k <- 1 to 4) {
      val got = run(docs, k)
      docs.foreach { case (id, t) =>
        assert(got(id) == reference(t, k), s"doc $id k=$k")
      }
    }
  }

  test("overlapping occurrences cover each token once") {
    // "a a a a": three duplicated (a,a) bigrams, union = all 4 tokens
    assert(run(Seq((1L, "a a a a")), 2)(1L) == 4L)
  }

  test("no within-doc repeats reads zero; sub-k docs read zero") {
    assert(run(Seq((1L, "ox elk ram sow")), 2)(1L) == 0L)
    assert(run(Seq((2L, "ox")), 2)(2L) == 0L)
  }

  /** Top-coverage reference: union coverage of all modal grams, 0 when
    * the max count is < 2. */
  private def referenceTop(text: String, k: Int): Long = {
    val t = norm(text).split(" ", -1).toSeq
    if (t.size < k) return 0L
    val grams = t.sliding(k).toSeq
    val counts = grams.groupBy(identity).map { case (g, v) => g -> v.size }
    val m = counts.values.max
    if (m < 2) return 0L
    val covered = new Array[Boolean](t.size)
    grams.zipWithIndex.foreach { case (g, i) =>
      if (counts(g) == m) (i until i + k).foreach(covered(_) = true)
    }
    covered.count(identity).toLong
  }

  private def runTop(docs: Seq[(Long, String)], k: Int): Map[Long, Long] =
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), NativeHash.topNgramCoverage(
        TextFunctions.normalizeWs(col("text")), k).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("top coverage matches the modal-gram reference at k = 1..3") {
    val docs = (100L until 140L).map(i => (i, sentence(3 + rnd.nextInt(60))))
    for (k <- 1 to 3) {
      val got = runTop(docs, k)
      docs.foreach { case (id, t) =>
        assert(got(id) == referenceTop(t, k), s"doc $id k=$k")
      }
    }
  }

  test("top coverage: modal ties cover the union of all modal grams") {
    // 'ox elk' and 'ram sow' both occur twice — both count (no tie-break)
    val t = "ox elk cub ox elk doe ram sow hen ram sow"
    assert(runTop(Seq((1L, t)), 2)(1L) == referenceTop(t, 2))
    assert(runTop(Seq((1L, t)), 2)(1L) == 8L)
  }

  test("SQL surface: graft_dup_ngram_coverage / graft_top_ngram_coverage") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dup_ngram_coverage('a a a a', 2) AS d, " +
        "graft_top_ngram_coverage('ox elk cub ox elk', 2) AS t").head()
    assert(r.getLong(0) == 4L)
    assert(r.getLong(1) == 4L) // 'ox elk' twice → both occurrences' union
  }

  test("a planted repeated passage covers exactly its union span") {
    val passage = "ox elk ram sow hen"
    val t = s"$passage cub doe $passage"
    // tokens: 5 + 2 + 5 = 12; duplicated 5-grams: the two passage
    // occurrences → 10 covered tokens
    assert(run(Seq((1L, t)), 5)(1L) == 10L)
  }
}
