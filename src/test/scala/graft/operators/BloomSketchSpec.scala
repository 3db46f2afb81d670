package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Sketches.bloomState]] family — Bloom membership filter: inserted
  * hashes NEVER read absent, `false` is a proof of absence, the observed
  * false-positive rate tracks the (1 − e^(−kn/m))^k bound, building is
  * partition-invariant, the OR-fold is idempotent (the guard-free
  * maintainer class), and contract violations refuse loudly. */
class BloomSketchSpec extends SparkSuite {
  import spark.implicits._

  private val K = 4
  private val M = 4096

  private def md5Hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def rmRf(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(rmRf)); f.delete(): Unit
  }

  private def corpus(n: Int) =
    (1 to n).map(i => (s"item$i", md5Hash60(s"item$i"))).toDF("item", "h")

  test("no false negatives: every inserted hash reads might_contain") {
    val c = corpus(200)
    val st = Sketches.bloomState(c, "h", K, M)
    val got = Sketches.bloomProbe(st, c, "h", K, M).collect()
    assert(got.length == 200)
    got.foreach(r => assert(r.getBoolean(2), s"${r.getString(0)} false-negatived"))
  }

  test("absent probes mostly read false; observed fpp within 3x of the bound") {
    val n = 100
    val st = Sketches.bloomState(corpus(n), "h", K, M)
    val ghosts = (1 to 2000).map(i => (s"ghost$i", md5Hash60(s"ghost$i")))
      .toDF("item", "h")
    val fp = Sketches.bloomProbe(st, ghosts, "h", K, M)
      .filter(col("might_contain")).count()
    // bound: (1 - e^(-k n / m))^k = (1 - e^(-400/4096))^4 ~= 7.5e-5;
    // 2000 draws from the FIXED hash family — deterministic, not flaky.
    // Allow 3x headroom over the expectation's tail: any real regression
    // (wrong bit math, lost word) lands orders of magnitude above this.
    assert(fp <= 3, s"observed $fp false positives in 2000 absent probes")
    // and false is genuinely reachable (the filter filters)
    assert(fp < 2000)
  }

  test("partition-invariant: 1 vs 32 partitions produce identical words") {
    val one = Sketches.bloomState(corpus(150).coalesce(1), "h", K, M)
      .collect().map(_.toSeq).toSet
    val many = Sketches.bloomState(corpus(150).repartition(32), "h", K, M)
      .collect().map(_.toSeq).toSet
    assert(one == many)
  }

  test("fold ORs: split ≡ one-shot; fold is idempotent (fold(s,s) ≡ s)") {
    val c = corpus(120)
    val a = Sketches.bloomState(c.filter(col("h") % 2 === 0), "h", K, M)
    val b = Sketches.bloomState(c.filter(col("h") % 2 === 1), "h", K, M)
    val folded = Sketches.bloomFold(a, b).collect().map(_.toSeq).toSet
    val oneShot = Sketches.bloomState(c, "h", K, M).collect().map(_.toSeq).toSet
    assert(folded == oneShot)
    val selfFold = Sketches.bloomFold(a, a).collect().map(_.toSeq).toSet
    assert(selfFold == a.collect().map(_.toSeq).toSet,
      "OR-fold must be idempotent — the guard-free maintainer contract")
  }

  test("nulls are skipped; out-of-range hashes refuse at execution time") {
    val withNull = Seq(("a", Option(md5Hash60("a"))), ("b", Option.empty[Long]))
      .toDF("item", "h")
    val st = Sketches.bloomState(withNull, "h", K, M)
    // one item, k bits: at most K words, at least 1
    val words = st.count()
    assert(words >= 1 && words <= K.toLong)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val bad = Seq(("x", -3L)).toDF("item", "h")
    val e = intercept[Exception] {
      Sketches.bloomState(bad, "h", K, M).collect()
    }
    assert(msgs(e).exists(_.contains("graft bloom")))
    val e2 = intercept[Exception] {
      Sketches.bloomProbe(Sketches.bloomState(corpus(5), "h", K, M),
        bad, "h", K, M).collect()
    }
    assert(msgs(e2).exists(_.contains("probe hash outside")))
  }

  test("geometry and shape contracts refuse") {
    val c = corpus(10)
    intercept[IllegalArgumentException] {
      Sketches.bloomState(c, "h", 0, M)
    }
    intercept[IllegalArgumentException] {
      Sketches.bloomState(c, "h", K, 32)
    }
    val st = Sketches.bloomState(c, "h", K, M)
    // stamped-geometry mismatch between state and probe call refuses
    intercept[IllegalArgumentException] {
      Sketches.bloomProbe(st, c, "h", K, 2 * M)
    }
    // mixed-geometry fold refuses
    val other = Sketches.bloomState(c, "h", K, 2 * M)
    intercept[IllegalArgumentException] {
      Sketches.bloomFold(st, other)
    }
    // wrong state shape refuses
    intercept[IllegalArgumentException] {
      Sketches.bloomFold(st.withColumnRenamed("bits", "b"), st)
    }
    // __-prefixed probe columns refuse
    intercept[IllegalArgumentException] {
      Sketches.bloomProbe(st, c.withColumn("__x", lit(1)), "h", K, M)
    }
  }

  test("geometry survives parquet: a stored state still refuses a mismatched fold") {
    val dir = java.nio.file.Files.createTempDirectory("bloom-meta")
    try {
      Sketches.bloomState(corpus(20), "h", K, M)
        .write.mode("overwrite").parquet(dir.toString)
      val back = spark.read.parquet(dir.toString)
      val other = Sketches.bloomState(corpus(20), "h", K, 2 * M)
      intercept[IllegalArgumentException] {
        Sketches.bloomFold(back, other)
      }
      // and a matching fold through parquet equals the in-memory fold
      val folded = Sketches.bloomFold(back,
        Sketches.bloomState(corpus(40), "h", K, M)).collect().map(_.toSeq).toSet
      val direct = Sketches.bloomFold(Sketches.bloomState(corpus(20), "h", K, M),
        Sketches.bloomState(corpus(40), "h", K, M)).collect().map(_.toSeq).toSet
      assert(folded == direct)
    } finally {
      rmRf(dir.toFile)
    }
  }

  test("maintainer is guard-free: a re-delivered batch leaves the state bit-identical") {
    val root = java.nio.file.Files.createTempDirectory("bloom-replay")
    try {
      val dir = root.toString + "/tbl"
      val b0 = corpus(30).select("h")
      val b1 = corpus(60).filter(col("h") % 2 === 0).select("h")
      graft.streaming.StreamingIngest.bloomIngestBatch(b0, 0L, "h", K, M, dir, "app")
      graft.streaming.StreamingIngest.bloomIngestBatch(b1, 1L, "h", K, M, dir, "app")
      val tbl = new graft.store.VersionedTable(spark, dir)
      val after = tbl.read().collect().map(_.toSeq).toSet
      // at-least-once redelivery with a FRESH batchId (a retried epoch the
      // commit watermark cannot catch): the OR-fold itself must be the
      // exactly-once mechanism
      graft.streaming.StreamingIngest.bloomIngestBatch(b1, 2L, "h", K, M, dir, "app")
      val replayed = tbl.read().collect().map(_.toSeq).toSet
      assert(replayed == after, "re-delivered batch changed the bloom state")
      // and the served membership equals the one-shot filter
      val oneShot = Sketches.bloomState(
        corpus(30).select("h").unionByName(b1), "h", K, M)
        .collect().map(_.toSeq).toSet
      assert(replayed == oneShot)
    } finally {
      rmRf(root.toFile)
    }
  }
}
