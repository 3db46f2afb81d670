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

  private def brute(budgets: Map[String, Long]): Set[(Long, String, Long)] = {
    def bucket(id: Long): Long =
      ((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L % 1000L
    corpus.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
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
}
