package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[TextCorpus.bm25Index]]/[[TextCorpus.bm25IndexFold]]/
  * [[TextCorpus.bm25Serve]] — the persisted search index: serving from
  * the index is rank-identical to the one-shot scorer, folds are
  * doc-disjoint unions that survive parquet, and a re-ingested doc
  * refuses before it can double its postings. */
class Bm25IndexSpec extends SparkSuite {
  import spark.implicits._

  private def rmRf(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rmRf)); f.delete(): Unit
  }

  private def docs = Seq(
    (1L, "spark merge window merge"),
    (2L, "window window filter scan"),
    (3L, "merge spark spark spark"),
    (4L, "scan filter table key"),
    (5L, "window merge"),
    (6L, "spark window table")
  ).toDF("doc_id", "text")

  private val q = Seq("merge", "window", "spark")

  test("serving from the index is identical to the one-shot scorer") {
    val (p, l) = TextCorpus.bm25Index(docs, "doc_id", "text")
    val served = TextCorpus.bm25Serve(p, l, q, 5).collect().map(_.toSeq)
    val oneShot = TextCorpus.bm25TopK(docs, "doc_id", "text", q, 5)
      .collect().map(_.toSeq)
    assert(served.toSeq == oneShot.toSeq)
  }

  test("fold through parquet ≡ one-shot index over everything") {
    val root = java.nio.file.Files.createTempDirectory("bm25-spec")
    try {
      val (p0, l0) = TextCorpus.bm25Index(
        docs.filter(col("doc_id") <= 3), "doc_id", "text")
      p0.write.parquet(s"$root/p"); l0.write.parquet(s"$root/l")
      val (pb, lb) = TextCorpus.bm25Index(
        docs.filter(col("doc_id") > 3), "doc_id", "text")
      val (p1, l1) = TextCorpus.bm25IndexFold(
        spark.read.parquet(s"$root/p"), spark.read.parquet(s"$root/l"), pb, lb)
      val served = TextCorpus.bm25Serve(p1, l1, q, 6).collect().map(_.toSeq)
      val oneShot = TextCorpus.bm25TopK(docs, "doc_id", "text", q, 6)
        .collect().map(_.toSeq)
      assert(served.toSeq == oneShot.toSeq)
    } finally rmRf(root.toFile)
  }

  test("re-ingesting an indexed doc refuses before doubling its postings") {
    val (p0, l0) = TextCorpus.bm25Index(
      docs.filter(col("doc_id") <= 4), "doc_id", "text")
    val (pb, lb) = TextCorpus.bm25Index(
      docs.filter(col("doc_id") >= 4), "doc_id", "text") // doc 4 again
    val (p1, l1) = TextCorpus.bm25IndexFold(p0, l0, pb, lb)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      TextCorpus.bm25Serve(p1, l1, q, 5).collect()
    }
    assert(msgs(e).exists(_.contains("already indexed")))
  }

  test("index shape contracts refuse; empty index serves empty") {
    val (p, l) = TextCorpus.bm25Index(docs, "doc_id", "text")
    intercept[IllegalArgumentException] {
      TextCorpus.bm25Serve(p.withColumnRenamed("tf", "cnt"), l, q, 5)
    }
    intercept[IllegalArgumentException] {
      TextCorpus.bm25IndexFold(p, l.withColumnRenamed("len", "n"), p, l)
    }
    intercept[IllegalArgumentException] {
      TextCorpus.bm25Serve(p, l, Seq.empty, 5)
    }
    val (pe, le) = TextCorpus.bm25Index(docs.limit(0), "doc_id", "text")
    assert(TextCorpus.bm25Serve(pe, le, q, 5).count() == 0)
  }

  test("a query term absent from the index contributes nothing (no ghost df)") {
    val (p, l) = TextCorpus.bm25Index(docs, "doc_id", "text")
    val served = TextCorpus.bm25Serve(p, l, Seq("merge", "zzz_ghost"), 6)
      .collect().map(_.toSeq)
    val oneShot = TextCorpus.bm25TopK(docs, "doc_id", "text",
      Seq("merge", "zzz_ghost"), 6).collect().map(_.toSeq)
    assert(served.toSeq == oneShot.toSeq)
  }
}
