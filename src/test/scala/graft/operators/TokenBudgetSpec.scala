package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Token-budget data-mixture sampling — deterministic LCG order, per-group
  * budget cut, plan-independent selection. */
class TokenBudgetSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = (0L until 200L).map { i =>
    val g = s"g${i % 3}"
    val words = (0 to (i % 11).toInt).map(j => s"t${i}_$j").mkString(" ")
    (i, g, words)
  }.toDF("id", "grp", "text")

  private def brute(budgets: Map[String, Long],
      over: org.apache.spark.sql.DataFrame = corpus): Set[(Long, String, Long)] = {
    def bucket(id: Long): Long =
      ((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L % 1000L
    over.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter { case (_, g, _) => budgets.contains(g) }
      .groupBy(_._2).toSeq.flatMap { case (g, rows) =>
        val ordered = rows.sortBy { case (id, _, _) => (bucket(id), id) }
        val cum = ordered.map(_._3.split(" ", -1).length.toLong)
          .scanLeft(0L)(_ + _).init
        ordered.zip(cum).collect {
          case ((id, grp, t), before) if before < budgets(g) =>
            (id, grp, t.split(" ", -1).length.toLong)
        }
      }.toSet
  }

  test("budget cut matches the driver-side replay; crossing doc included") {
    val budgets = Map("g0" -> 120L, "g2" -> 35L)
    val got = TextCorpus.tokenBudgetSample(corpus, "id", "text", "grp", budgets)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = brute(budgets)
    assert(got == want)
    // g1 absent from budgets → dropped entirely
    assert(!got.exists(_._2 == "g1"))
    // budget respected: tokens BEFORE each group's last kept doc < budget,
    // and the total reaches the budget (crossing doc included)
    Seq("g0" -> 120L, "g2" -> 35L).foreach { case (g, b) =>
      val total = got.filter(_._2 == g).toSeq.map(_._3).sum
      assert(total >= b, s"$g must reach its budget")
    }
  }

  test("selection is identical at different partition counts") {
    val budgets = Map("g0" -> 80L, "g1" -> 50L, "g2" -> 35L)
    def ids(parts: Int): Set[Long] =
      TextCorpus.tokenBudgetSample(corpus.repartition(parts), "id", "text",
        "grp", budgets).collect().map(_.getLong(0)).toSet
    assert(ids(1) == ids(7) && ids(7) == ids(32))
  }

  test("tiny budget keeps exactly the first doc per group") {
    val got = TextCorpus.tokenBudgetSample(corpus, "id", "text", "grp",
      Map("g0" -> 1L)).collect()
    assert(got.length == 1 && got.head.getString(1) == "g0")
  }

  test("mixtureAllocate: hand-computed water-filling rounds") {
    // round 1: 5/8 share 1250 caps at 1136; round 2 splits 864 as 1:2
    assert(TextCorpus.allocateDriver(
      Map("a" -> 1L, "b" -> 2L, "c" -> 5L),
      Map("a" -> 10000L, "b" -> 10000L, "c" -> 1136L), 2000L) ==
      Map("a" -> 288L, "b" -> 576L, "c" -> 1136L))
    // cascading caps: everything fits → allocation = availability
    assert(TextCorpus.allocateDriver(
      Map("a" -> 1L, "b" -> 1L), Map("a" -> 10L, "b" -> 20L), 1000L) ==
      Map("a" -> 10L, "b" -> 20L))
    // largest remainder, tie by group name ascending: 10 as 1:1:1 → a bumped
    assert(TextCorpus.allocateDriver(
      Map("a" -> 1L, "b" -> 1L, "c" -> 1L),
      Map("a" -> 100L, "b" -> 100L, "c" -> 100L), 10L) ==
      Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
  }

  test("mixtureAllocate: randomized invariants") {
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val n = 1 + rnd.nextInt(6)
      val gs = (0 until n).map(i => s"g$i")
      val w = gs.map(g => g -> (1L + rnd.nextInt(9))).toMap
      val av = gs.map(g => g -> rnd.nextInt(500).toLong).toMap
      val b = rnd.nextInt(2000).toLong
      val al = TextCorpus.allocateDriver(w, av, b)
      assert(al.keySet == w.keySet)
      al.foreach { case (g, a) =>
        assert(a >= 0 && a <= av(g), s"over-allocated $g: $a > ${av(g)}") }
      // exact budget conservation: the whole budget lands unless the
      // corpus runs out first
      assert(al.values.sum == math.min(b, av.values.sum),
        s"b=$b w=$w av=$av al=$al")
      // deterministic
      assert(al == TextCorpus.allocateDriver(w, av, b))
    }
  }

  test("mixtureSample equals allocate-then-sample composition") {
    val weights = Map("g0" -> 1L, "g1" -> 3L)
    val got = TextCorpus.mixtureSample(corpus, "id", "text", "grp", weights, 150L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val budgets = TextCorpus.mixtureAllocate(corpus, "text", "grp", weights, 150L)
    assert(got == brute(budgets.filter(_._2 > 0L)))
    assert(budgets.values.sum == 150L)
  }

  /** Skewed corpus for the temperature tests: g0 dominates by ~100× so
    * the p^(1/T) damping is visible in the allocation proportions. */
  private def skewed = ((0L until 300L).map { i =>
    (i, "g0", (0 until 40).map(j => s"a${i}_$j").mkString(" "))
  } ++ (1000L until 1030L).map { i =>
    (i, "g1", (0 until 4).map(j => s"b${i}_$j").mkString(" "))
  }).toDF("id", "grp", "text")

  test("temperature T=2 damps the dominant group toward sqrt proportions") {
    // g0: 12000 tokens, g1: 120 — raw ratio 100×, sqrt ratio 10×. The
    // T=2 allocation must hand g1 ~1/11 of the budget (uniform-by-tokens
    // would give it under 1/100), replaying the driver weight math.
    val got = TextCorpus.temperatureMixtureSample(
      skewed, "id", "text", "grp", Seq("g0", "g1"), totalBudget = 660L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val w0 = math.floor(math.sqrt(12000.0) * 1000).toLong
    val w1 = math.floor(math.sqrt(120.0) * 1000).toLong
    val budgets = TextCorpus.allocateDriver(
      Map("g0" -> w0, "g1" -> w1), Map("g0" -> 12000L, "g1" -> 120L), 660L)
    assert(got.toSet == brute(budgets, skewed).filter(t => budgets(t._2) > 0))
    // damping: g1's share is ≥ 8% of the budget, far above its 1% token share
    assert(budgets("g1") * 100 / 660 >= 8, s"budgets=$budgets")
  }

  test("temperature selection is plan-independent and deeper sqrt damps harder") {
    val a = TextCorpus.temperatureMixtureSample(skewed.repartition(1),
      "id", "text", "grp", Seq("g0", "g1"), 660L)
    val b = TextCorpus.temperatureMixtureSample(skewed.repartition(13),
      "id", "text", "grp", Seq("g0", "g1"), 660L)
    assert(rowsOf(a.orderBy("id")) == rowsOf(b.orderBy("id")))
    // T=4 (two sqrt applications): ratio 100^(1/4) ≈ 3.2× — g1's share rises
    def g1Share(m: Int): Long = {
      val rows = TextCorpus.temperatureMixtureSample(skewed, "id", "text",
        "grp", Seq("g0", "g1"), 660L, sqrtApplications = m)
        .filter(col("grp") === "g1")
      rows.agg(sum("n_tokens")).head().getLong(0)
    }
    assert(g1Share(2) > g1Share(1), "deeper sqrt must upsample the small group more")
  }

  test("a listed-but-absent group clamps to weight 1 and caps at zero") {
    val budgets = {
      val got = TextCorpus.temperatureMixtureSample(
        skewed, "id", "text", "grp", Seq("g0", "g1", "ghost"), 660L)
        .collect().map(r => r.getString(1)).toSet
      got
    }
    assert(budgets == Set("g0", "g1"), "ghost group contributes no rows")
    val e = intercept[IllegalArgumentException](
      TextCorpus.temperatureMixtureSample(skewed, "id", "text", "grp",
        Seq("g0"), 10L, sqrtApplications = 0))
    assert(e.getMessage.contains("sqrtApplications"))
  }
}
