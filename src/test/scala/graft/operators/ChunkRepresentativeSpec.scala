package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Sliding-window chunking and quality-based cluster representatives:
  * hand-computed expectations. */
class ChunkRepresentativeSpec extends SparkSuite {
  import spark.implicits._

  test("chunks cover the document with the configured overlap") {
    // 10 tokens, chunk 4, overlap 1 → step 3 → starts 0,3,6,9
    val df = Seq((1L, "a b c d e f g h i j")).toDF("id", "text")
    val out = TextCorpus.chunkDocs(df, "id", "text", chunkTokens = 4, overlap = 1)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (0L, "a b c d", 4L), (1L, "d e f g", 4L),
      (2L, "g h i j", 4L), (3L, "j", 1L)))
  }

  test("short documents yield exactly one chunk; zero overlap tiles") {
    val df = Seq((1L, "only three tokens"), (2L, "a b c d")).toDF("id", "text")
    val out = TextCorpus.chunkDocs(df, "id", "text", chunkTokens = 3, overlap = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out === Set(
      (1L, 0L, "only three tokens"),
      (2L, 0L, "a b c"), (2L, 1L, "d")))
    intercept[IllegalArgumentException] {
      TextCorpus.chunkDocs(df, "id", "text", chunkTokens = 3, overlap = 3)
    }
  }

  test("null-text docs yield zero chunks; others unaffected") {
    val df = Seq((1L, "a b c d"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = TextCorpus.chunkDocs(df, "id", "text", chunkTokens = 3, overlap = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out === Set((1L, 0L, "a b c"), (1L, 1L, "d")))
  }

  test("corpus card on an empty corpus reads zeros, no NPE") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val card = TextCorpus.corpusCard(empty, "id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card("docs") === 0L && card("tokens") === 0L &&
      card("chars") === 0L && card("distinct_docs") === 0L &&
      card("dup_rate_x1000") === 0L)
    // the OLS trainer states its contract instead of NPEing on the same shape
    val e = intercept[IllegalArgumentException] {
      TextCorpus.fitLinearModelX1000(empty,
        Seq("len" -> length(col("text")).cast("long")), lit(null).cast("long"))
    }
    assert(e.getMessage.contains("at least one row"))
  }

  test("corpus card: exact counts, dup rate, language histogram") {
    val df = Seq(
      (1L, "a b c", "en"), (2L, "A  b C", "en"), // same fingerprint
      (3L, "totally different", "de")).toDF("id", "text", "lang")
    val card = TextCorpus.corpusCard(df, "id", "text", Some("lang"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card("docs") === 3L)
    assert(card("tokens") === 8L)
    assert(card("distinct_docs") === 2L)
    assert(card("dup_rate_x1000") === 333L)
    assert(card("docs_lang_en") === 2L && card("docs_lang_de") === 1L)
  }

  test("split labels are a pure function of the id and cover all rows") {
    val df = spark.range(0, 5000).toDF("id")
    val s1 = TextCorpus.splitLabels(df, "id", seed = 7L, 100, 100)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = TextCorpus.splitLabels(df.repartition(7), "id", seed = 7L, 100, 100)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 === s2) // partitioning-independent
    val hist = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    // ~10% val, ~10% test (LCG-uniform; generous tolerance)
    assert(hist("val") > 300 && hist("val") < 700)
    assert(hist("test") > 300 && hist("test") < 700)
    assert(hist("train") + hist("val") + hist("test") === 5000)
  }

  test("cluster representative = highest score, id breaks ties") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L))
      .toDF("id", "cluster_id")
    val scores = Seq((1L, 10L), (2L, 30L), (3L, 30L), (5L, 7L), (6L, 7L))
      .toDF("doc_id", "quality")
    val reps = Dedup.clusterRepresentatives(clusters, scores, "doc_id", "quality")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cluster 1: scores 10/30/30 → tie between 2 and 3 → id 2 wins
    // cluster 5: tie 7/7 → id 5 wins
    assert(reps === Map(1L -> 2L, 5L -> 5L))
  }
}
