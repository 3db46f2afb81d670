package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Baskets.cooccurrence]] — market-basket association mining: exact
  * pair/item/basket counts, integer-exact support and lift, duplicate
  * collapse, and the quadratic-fan-out cap refusing loudly. */
class BasketsSpec extends SparkSuite {
  import spark.implicits._

  // 4 baskets: {A,B}, {A,B,C}, {A,C}, {B} — (A,B) twice, (A,C) twice,
  // (B,C) once; counts A=3, B=3, C=2
  private def baskets = Seq(
    (1L, "A"), (1L, "B"),
    (2L, "A"), (2L, "B"), (2L, "C"),
    (3L, "A"), (3L, "C"),
    (4L, "B")
  ).toDF("b", "i")

  test("pair counts, support, and lift are exact") {
    val got = Baskets.cooccurrence(baskets, "b", "i", minPairCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // ("A","B"): pair 2, cnt 3/3, support 2000/4=500, lift 2*4*1000/(3*3)=888
    assert(got(("A", "B")) == (2L, 3L, 3L, 500L, 888L))
    // ("A","C"): pair 2, cnt 3/2, support 500, lift 8000/6=1333 (affinity)
    assert(got(("A", "C")) == (2L, 3L, 2L, 500L, 1333L))
    // ("B","C"): pair 1, cnt 3/2, support 250, lift 4000/6=666
    assert(got(("B", "C")) == (1L, 3L, 2L, 250L, 666L))
    assert(got.size == 3)
  }

  test("minPairCount prunes; duplicate (basket, item) rows collapse") {
    val withDups = baskets.unionByName(Seq((2L, "A"), (2L, "A")).toDF("b", "i"))
    val got = Baskets.cooccurrence(withDups, "b", "i", minPairCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("A", "B") -> 2L, ("A", "C") -> 2L))
  }

  test("null baskets/items are skipped; partition count does not change the result") {
    val withNulls = baskets.unionByName(
      Seq((Option(9L), Option.empty[String]),
        (Option.empty[Long], Option("A"))).toDF("b", "i"))
    val one = Baskets.cooccurrence(withNulls.coalesce(1), "b", "i", 1L)
      .collect().map(_.toSeq).toSet
    val many = Baskets.cooccurrence(withNulls.repartition(32), "b", "i", 1L)
      .collect().map(_.toSeq).toSet
    assert(one == many)
    assert(one == Baskets.cooccurrence(baskets, "b", "i", 1L)
      .collect().map(_.toSeq).toSet)
  }

  test("a basket past maxBasketSize refuses before the pair fan-out") {
    val big = (1 to 20).map(i => (9L, s"item$i")).toDF("b", "i")
      .unionByName(baskets)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      Baskets.cooccurrence(big, "b", "i", 1L, maxBasketSize = 16).collect()
    }
    assert(msgs(e).exists(_.contains("graft baskets")))
    // at the cap exactly, it passes
    val ok = Baskets.cooccurrence(big, "b", "i", 1L, maxBasketSize = 20)
    assert(ok.count() > 0)
  }

  test("packPairKeys: packed path ≡ unpacked on int64 ids; contract refuses loudly") {
    // integral-id corpus (the packed path's domain); includes ids at the
    // unsigned-int32 EDGE (0 and 2^31 - 1) to pin the pack/unpack bijection
    val edge = (1L << 31) - 1L
    val intBaskets = Seq(
      (1L, 7L), (1L, 9L), (1L, edge),
      (2L, 7L), (2L, 9L), (2L, 0L),
      (3L, 0L), (3L, 7L), (3L, edge),
      (4L, 9L)).toDF("b", "i")
    val packed = Baskets.cooccurrence(intBaskets, "b", "i", 1L,
      packPairKeys = true).collect().map(_.toSeq).toSet
    val unpacked = Baskets.cooccurrence(intBaskets, "b", "i", 1L,
      packPairKeys = false).collect().map(_.toSeq).toSet
    assert(packed == unpacked, s"packed $packed != unpacked $unpacked")
    assert(packed.nonEmpty)
    // schemas must be byte-compatible (same names, same types)
    assert(Baskets.cooccurrence(intBaskets, "b", "i", 1L, packPairKeys = true)
      .schema == Baskets.cooccurrence(intBaskets, "b", "i", 1L).schema)

    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // id >= 2^31 refuses IN-PLAN before any pair can form
    val tooBig = intBaskets.unionByName(Seq((1L, 1L << 31)).toDF("b", "i"))
    val e1 = intercept[Exception] {
      Baskets.cooccurrence(tooBig, "b", "i", 1L, packPairKeys = true).collect()
    }
    assert(msgs(e1).exists(_.contains("packPairKeys")), msgs(e1).mkString("|"))
    // negative ids refuse the same way
    val neg = intBaskets.unionByName(Seq((1L, -5L)).toDF("b", "i"))
    val e2 = intercept[Exception] {
      Baskets.cooccurrence(neg, "b", "i", 1L, packPairKeys = true).collect()
    }
    assert(msgs(e2).exists(_.contains("packPairKeys")), msgs(e2).mkString("|"))
    // non-integral item columns refuse at plan time
    val e3 = intercept[IllegalArgumentException] {
      Baskets.cooccurrence(baskets, "b", "i", 1L, packPairKeys = true).collect()
    }
    assert(e3.getMessage.contains("integral"))
  }

  test("persisted state: fold-through-parquet ≡ one-shot; counts add per key") {
    val root = java.nio.file.Files.createTempDirectory("bsk-spec")
    try {
      val (p0, i0, n0) = Baskets.cooccurrenceState(
        baskets.filter(col("b") % 2 === 0), "b", "i")
      p0.write.parquet(s"$root/p"); i0.write.parquet(s"$root/i")
      n0.write.parquet(s"$root/n")
      val (pb, ib, nb) = Baskets.cooccurrenceState(
        baskets.filter(col("b") % 2 === 1), "b", "i")
      val (p1, i1, n1) = Baskets.cooccurrenceFold(
        spark.read.parquet(s"$root/p"), spark.read.parquet(s"$root/i"),
        spark.read.parquet(s"$root/n"), pb, ib, nb)
      val served = Baskets.cooccurrenceOf(p1, i1, n1, 1L)
        .collect().map(_.toSeq).toSet
      val oneShot = Baskets.cooccurrence(baskets, "b", "i", 1L)
        .collect().map(_.toSeq).toSet
      assert(served == oneShot)
      // additive NOT idempotent: re-folding the batch doubles its counts —
      // the documented reason replay protection is the ingest's job
      val (p2, _, n2) = Baskets.cooccurrenceFold(p1, i1, n1, pb, ib, nb)
      assert(n2.head().getLong(0) ==
        n1.head().getLong(0) + nb.head().getLong(0))
      val doubled = p2.collect().map(r =>
        (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val once = p1.collect().map(r =>
        (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(doubled.exists { case (k, v) => v > once(k) })
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(root.toFile)
    }
  }

  test("maintainer replay is guarded: a re-delivered batch does not double-count") {
    val root = java.nio.file.Files.createTempDirectory("bsk-replay")
    try {
      val b0 = baskets.filter(col("b") <= 2)
      val b1 = baskets.filter(col("b") > 2)
      def ingest(b: org.apache.spark.sql.DataFrame, id: Long) =
        graft.streaming.StreamingIngest.basketsIngestBatch(b, id, "b", "i",
          256, s"$root/p", s"$root/i", s"$root/n", "app")
      ingest(b0, 0L); ingest(b1, 1L)
      def served = Baskets.cooccurrenceOf(
        new graft.store.VersionedTable(spark, s"$root/p").read(),
        new graft.store.VersionedTable(spark, s"$root/i").read(),
        new graft.store.VersionedTable(spark, s"$root/n").read(), 1L)
        .collect().map(_.toSeq).toSet
      val after = served
      // at-least-once redelivery of batch 1: the additive fold MUST be
      // skipped via the pairs-table txnApplied (pairs commit LAST, so its
      // watermark implies the whole batch applied)
      ingest(b1, 1L)
      assert(served == after, "re-delivered batch changed the basket state")
      assert(after == Baskets.cooccurrence(baskets, "b", "i", 1L)
        .collect().map(_.toSeq).toSet)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(root.toFile)
    }
  }

  test("state shape contracts refuse") {
    val (p, i, n) = Baskets.cooccurrenceState(baskets, "b", "i")
    intercept[IllegalArgumentException] {
      Baskets.cooccurrenceOf(p.withColumnRenamed("cnt", "c"), i, n)
    }
    intercept[IllegalArgumentException] {
      Baskets.cooccurrenceFold(p, i.withColumnRenamed("item", "it"), n, p, i, n)
    }
    intercept[IllegalArgumentException] {
      Baskets.cooccurrenceFold(p, i, n.withColumnRenamed("n_baskets", "x"), p, i, n)
    }
  }

  test("contracts refuse: bad budgets, reserved columns") {
    intercept[IllegalArgumentException] {
      Baskets.cooccurrence(baskets, "b", "i", 0L)
    }
    intercept[IllegalArgumentException] {
      Baskets.cooccurrence(baskets, "b", "i", 1L, maxBasketSize = 1)
    }
    intercept[IllegalArgumentException] {
      Baskets.cooccurrence(baskets.withColumn("__x", lit(1)), "b", "i", 1L)
    }
  }
}
