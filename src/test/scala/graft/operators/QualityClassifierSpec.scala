package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.NativeHash

/** In-engine linear quality-classifier training (full-batch integer
  * perceptron): driver-side replay of the epoch recurrence, partition
  * invariance, label validation, convergence early-stop, and train/apply
  * tokenization agreement. */
class QualityClassifierSpec extends SparkSuite {
  import spark.implicits._

  /** Driver-side replay of the documented contract. */
  private def replay(rows: Seq[(String, Long)], epochs: Int,
      vocabSize: Int): (Map[String, Long], Long) = {
    val toks = rows.map { case (t, l) =>
      (t.split(" ", -1).filter(_.nonEmpty).toSeq, l) }
    val vocab = toks.flatMap(_._1.distinct)
      .groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (t, d) => (-d, t) }.take(vocabSize).map(_._1).toSet
    var w = Map.empty[String, Long]
    var b = 0L
    (1 to epochs).foreach { _ =>
      val mis = toks.filter { case (ts, l) =>
        l * (b + ts.map(t => w.getOrElse(t, 0L)).sum) <= 0 }
      if (mis.nonEmpty) {
        b += mis.map(_._2).sum
        mis.foreach { case (ts, l) =>
          ts.filter(vocab).foreach(t => w = w.updated(t, w.getOrElse(t, 0L) + l)) }
      }
    }
    (w.filter(_._2 != 0L), b)
  }

  private val labeled = Seq(
    ("good clean prose with substance", 1L),
    ("solid clean writing with depth", 1L),
    ("good solid prose", 1L),
    ("spam spam click spam", -1L),
    ("click here spam now", -1L),
    ("buy click spam", -1L),
    ("clean prose about spam filters", 1L))

  test("trained weights and bias equal the driver replay") {
    val df = labeled.toDF("text", "label")
    (1 to 4).foreach { e =>
      val (w, b) = TextCorpus.trainQualityClassifier(df, "label", "text",
        epochs = e, vocabSize = 100)
      assert((w, b) == replay(labeled, e, 100), s"epochs=$e")
    }
  }

  test("training is partition-invariant (full-batch, not SGD)") {
    val a = TextCorpus.trainQualityClassifier(
      labeled.toDF("text", "label").repartition(1), "label", "text", epochs = 3)
    val b = TextCorpus.trainQualityClassifier(
      labeled.toDF("text", "label").repartition(7), "label", "text", epochs = 3)
    assert(a == b)
  }

  test("vocabulary cap drops rare tokens from updates deterministically") {
    val (w, b) = TextCorpus.trainQualityClassifier(
      labeled.toDF("text", "label"), "label", "text", epochs = 2, vocabSize = 3)
    assert((w, b) == replay(labeled, 2, 3))
    assert(w.keySet.subsetOf(Set("spam", "clean", "click", "prose")),
      s"only head-of-df tokens may carry weight, got ${w.keySet}")
  }

  test("labels outside {+1, -1} are refused") {
    val e = intercept[IllegalArgumentException](
      TextCorpus.trainQualityClassifier(
        Seq(("a", 1L), ("b", 0L)).toDF("text", "label"), "label", "text"))
    assert(e.getMessage.contains("+1 or -1"), e.getMessage)
    intercept[IllegalArgumentException](
      TextCorpus.trainQualityClassifier(
        Seq(("a", Some(1L)), ("b", None)).toDF("text", "label"), "label", "text"))
  }

  test("a separable set converges: extra epochs change nothing") {
    val sep = Seq(("alpha alpha", 1L), ("beta beta", -1L))
    val at2 = TextCorpus.trainQualityClassifier(
      sep.toDF("text", "label"), "label", "text", epochs = 2)
    val at9 = TextCorpus.trainQualityClassifier(
      sep.toDF("text", "label"), "label", "text", epochs = 9)
    assert(at2 == at9)
    // and the model actually separates the training set
    val (w, b) = at2
    val df = sep.toDF("text", "label")
    val wrong = df.filter(col("label") *
      NativeHash.linearTextScore(col("text"), w, b) <= 0L).count()
    assert(wrong == 0L)
  }

  test("apply path scores the sf corpus and agrees with a driver recompute") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("label", when(col("lang") === "en", 1L).otherwise(-1L))
    val (w, b) = TextCorpus.trainQualityClassifier(docs, "label", "text",
      epochs = 2, vocabSize = 200)
    assert(w.nonEmpty)
    val got = docs.select(col("doc_id"),
        NativeHash.linearTextScore(col("text"), w, b).as("m"))
      .as[(Long, Long)].collect().toMap
    val want = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> (b + t.split(" ", -1).map(tok => w.getOrElse(tok, 0L)).sum) }
      .toMap
    assert(got == want)
  }
}
