package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[TextCorpus.samplePriority]] — DLT weighted priority sampling: small
  * groups are kept whole and exact, the estimator's sample-sum tracks the
  * true total weight, the clamp path is deterministic, and contract
  * violations refuse loudly. */
class PrioritySampleSpec extends SparkSuite {
  import spark.implicits._

  private val Bound = 1152921504606846976L // 2^60

  private def md5Hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def corpus(n: Int, wOf: Int => Long) =
    (1 to n).map(i => ("g", i.toLong, md5Hash60(s"it$i"), wOf(i)))
      .toDF("g", "id", "h", "w")

  test("a group with <= k items is kept whole: est_weight == weight, tau 0") {
    val got = TextCorpus.samplePriority(corpus(5, _.toLong),
        "g", "id", "h", "w", k = 16, hashBound = Bound)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(got.length == 5)
    got.foreach { case (_, w, est) => assert(est == w) }
  }

  test("estimator sanity: sample-sum of est_weight tracks the true total") {
    // 2000 items, weights 1..2000 → true total 2001000; DLT at k=64 has
    // relative error ~1/sqrt(k-1) ≈ 13%; the hash family is fixed, so this
    // is a deterministic regression bound, not a flaky statistical one
    val n = 2000
    val truth = (1 to n).map(_.toLong).sum
    val est = TextCorpus.samplePriority(corpus(n, _.toLong),
        "g", "id", "h", "w", k = 64, hashBound = Bound)
      .agg(sum("est_weight")).head().getLong(0)
    val err = math.abs(est.toDouble - truth) / truth
    assert(err < 0.4, s"est $est vs truth $truth (err $err)")
  }

  test("partition-invariant: 1 vs 32 partitions pick the same sample") {
    val c = corpus(500, i => (i % 37 + 1).toLong)
    val one = TextCorpus.samplePriority(c.coalesce(1), "g", "id", "h", "w",
      16, Bound).collect().map(_.toSeq).toSet
    val many = TextCorpus.samplePriority(c.repartition(32), "g", "id", "h", "w",
      16, Bound).collect().map(_.toSeq).toSet
    assert(one == many)
  }

  test("heavier items are sampled more often") {
    // one heavy item (w = 10000) among 500 light ones (w = 1): the heavy
    // item's priority is 10000x the typical light draw — it must be kept
    val c = corpus(500, i => if (i == 250) 10000L else 1L)
    val kept = TextCorpus.samplePriority(c, "g", "id", "h", "w", 16, Bound)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(250L))
  }

  test("the priority clamp path is deterministic (huge weight, tiny hash)") {
    val c = Seq(("g", 1L, 0L, Long.MaxValue / 4), ("g", 2L, Bound - 1, 1L))
      .toDF("g", "id", "h", "w")
    val got = TextCorpus.samplePriority(c, "g", "id", "h", "w", 1, Bound)
      .collect()
    assert(got.length == 1 && got.head.getLong(1) == 1L)
    assert(got.head.getLong(3) == TextCorpus.PriorityCap)
  }

  test("contract violations refuse loudly") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val zeroW = Seq(("g", 1L, 5L, 0L)).toDF("g", "id", "h", "w")
    val e1 = intercept[Exception] {
      TextCorpus.samplePriority(zeroW, "g", "id", "h", "w", 4, Bound).collect()
    }
    assert(msgs(e1).exists(_.contains("positive weights")))
    val badH = Seq(("g", 1L, Bound, 3L)).toDF("g", "id", "h", "w")
    val e2 = intercept[Exception] {
      TextCorpus.samplePriority(badH, "g", "id", "h", "w", 4, Bound).collect()
    }
    assert(msgs(e2).exists(_.contains("hash outside")))
    intercept[IllegalArgumentException] {
      TextCorpus.samplePriority(
        zeroW.withColumn("wd", col("w").cast("double")),
        "g", "id", "h", "wd", 4, Bound)
    }
  }
}
