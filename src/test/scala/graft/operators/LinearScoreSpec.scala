package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.NativeHash

/** Fasttext-style linear scoring kernel — must equal the explode + join +
  * sum formulation exactly (integer milli-weights), on randomized docs
  * with unknown tokens, repeats, multi-space runs, and empty strings. */
class LinearScoreSpec extends SparkSuite {
  import spark.implicits._

  private val weights = Map("alpha" -> 40L, "beta" -> -25L, "gamma" -> 7L,
    "" -> 3L) // empty token weighted: multi-space runs must count it
  private val bias = 100L

  private def reference(text: String): Long =
    bias + text.split(" ", -1).map(t => weights.getOrElse(t, 0L)).sum

  test("kernel ≡ token-sum reference on edge cases") {
    val docs = Seq(
      "alpha beta gamma", "alpha alpha alpha", "unknown words only",
      "alpha  beta", // double space → one empty token (+3)
      " alpha", "alpha ", "", "beta")
    val got = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), NativeHash.linearTextScore(col("text"), weights, bias).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == reference(t), s"doc '$t'")
    }
  }

  test("kernel ≡ reference on randomized corpora") {
    val rnd = new Random(7L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x", "yz", "")
    val docs = (0 until 300).map { i =>
      (i.toLong, (0 until rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val got = docs.toDF("id", "text")
      .select(col("id"), NativeHash.linearTextScore(col("text"), weights, bias).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.foreach { case (id, t) => assert(got(id) == reference(t), s"doc '$t'") }
  }
}
