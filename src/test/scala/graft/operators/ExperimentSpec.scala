package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Experiment.assign]]/[[Experiment.lift]] — deterministic hash-split
  * A/B analytics: assignment is a pure function of the hash with exact
  * permille boundaries, the lift arithmetic is integer-exact, and every
  * contract violation refuses loudly. */
class ExperimentSpec extends SparkSuite {
  import spark.implicits._

  test("assignment follows cumulative permille ranges with exact boundaries") {
    // craft hashes whose % 1000 hits the boundary buckets exactly
    val rows = Seq(0L, 499L, 500L, 899L, 900L, 999L, 1999L).toDF("h")
    val got = Experiment.assign(rows, "h",
        Seq(("a", 500), ("b", 400), ("c", 100)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "a" && got(499L) == "a")
    assert(got(500L) == "b" && got(899L) == "b")
    assert(got(900L) == "c" && got(999L) == "c")
    // bucket is h % 1000, not h
    assert(got(1999L) == "c")
  }

  test("assignment is deterministic and total: every unit gets exactly one arm") {
    val df = (1 to 5000).map(_.toLong * 7919L).toDF("h")
    val a1 = Experiment.assign(df, "h", Seq(("x", 300), ("y", 700)))
    val a2 = Experiment.assign(df.repartition(32), "h", Seq(("x", 300), ("y", 700)))
    assert(a1.filter(col("arm").isNull).count() == 0)
    assert(a1.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      a2.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    // split proportions track the permilles on a hash-uniform population
    val counts = a1.groupBy("arm").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("x") - 1500L) < 150,
      s"300-permille arm got ${counts("x")}/5000")
  }

  test("arm contracts refuse: sum, positivity, duplicates, hash domain") {
    val df = Seq(1L).toDF("h")
    intercept[IllegalArgumentException] {
      Experiment.assign(df, "h", Seq(("a", 600), ("b", 500)))
    }
    intercept[IllegalArgumentException] {
      Experiment.assign(df, "h", Seq(("a", 1000), ("b", 0)))
    }
    intercept[IllegalArgumentException] {
      Experiment.assign(df, "h", Seq(("a", 500), ("a", 500)))
    }
    intercept[IllegalArgumentException] {
      Experiment.assign(df, "h", Seq.empty)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      Experiment.assign(Seq(-5L).toDF("h"), "h", Seq(("a", 1000))).collect()
    }
    assert(msgs(e).exists(_.contains("graft experiment")))
    // a NULL hash refuses too — it would otherwise become a silent
    // arm = NULL bucket no report surfaces
    val e2 = intercept[Exception] {
      Experiment.assign(Seq(Option.empty[Long]).toDF("h"), "h",
        Seq(("a", 1000))).collect()
    }
    assert(msgs(e2).exists(_.contains("NULL")))
  }

  test("lift arithmetic is integer-exact; control reads 0") {
    // control: 100 units / 20 conv; treatment: 100 units / 30 conv
    // lift = (30*100*1000) DIV (20*100) - 1000 = 500 permille
    val units = ((1 to 100).map(i => ("control", if (i <= 20) 1 else 0, 10L)) ++
      (1 to 100).map(i => ("treatment", if (i <= 30) 1 else 0, 20L)))
      .toDF("arm", "converted", "v")
    val got = Experiment.lift(units, "arm", "converted", Some("v"), "control")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    assert(got("control") == (100L, 20L, 1000L, 200L, Some(0L)))
    assert(got("treatment") == (100L, 30L, 2000L, 300L, Some(500L)))
  }

  test("zero-conversion control yields NULL lift; negative lift truncates toward zero rate") {
    val units = (Seq(("control", 0, 0L)) ++
      Seq(("treatment", 1, 5L), ("treatment", 0, 0L))).toDF("arm", "c", "v")
    val got = Experiment.lift(units, "arm", "c", Some("v"), "control").collect()
      .map(r => r.getString(0) -> r.isNullAt(5)).toMap
    assert(got("treatment"), "lift vs a never-converting control must be NULL")
    // worse-than-control: control 50%, treatment 25% -> (1*4*1000) DIV (2*4) - 1000 = -500
    val u2 = (Seq(("control", 1, 0L), ("control", 1, 0L), ("control", 0, 0L), ("control", 0, 0L)) ++
      Seq(("treatment", 1, 0L), ("treatment", 0, 0L), ("treatment", 0, 0L), ("treatment", 0, 0L)))
      .toDF("arm", "c", "v")
    val lift2 = Experiment.lift(u2, "arm", "c", Some("v"), "control")
      .filter(col("arm") === "treatment").collect().head.getLong(5)
    assert(lift2 == -500L)
  }

  test("per-event feeds refuse (convCol not 0/1); a missing control arm refuses") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val bad = Seq(("a", 3, 1L)).toDF("arm", "c", "v")
    val e = intercept[Exception] {
      Experiment.lift(bad, "arm", "c", Some("v"), "a").collect()
    }
    assert(msgs(e).exists(_.contains("one row per unit")))
    val noCtl = Seq(("t", 1, 1L)).toDF("arm", "c", "v")
    val e2 = intercept[Exception] {
      Experiment.lift(noCtl, "arm", "c", Some("v"), "control").collect()
    }
    assert(msgs(e2).exists(_.contains("control arm")))
  }

  test("srmCheck: deviations are exact; zero-traffic arms report and flag") {
    // 70/20/10 observed vs 50/30/20 expected: dev +200 / -100 / -100
    val assigned = (Seq.fill(7)("a") ++ Seq.fill(2)("b") ++ Seq.fill(1)("c"))
      .toDF("arm")
    val got = Experiment.srmCheck(assigned, "arm",
        Seq(("a", 500), ("b", 300), ("c", 200)), thresholdPermille = 150)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    assert(got("a") == (7L, 500L, 700L, 200L, true))
    assert(got("b") == (2L, 300L, 200L, -100L, false))
    assert(got("c") == (1L, 200L, 100L, -100L, false))
    // an arm with ZERO traffic still reports — its absence is the signal
    val partial = Seq.fill(10)("a").toDF("arm")
    val got2 = Experiment.srmCheck(partial, "arm",
        Seq(("a", 500), ("b", 500)), thresholdPermille = 50)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getBoolean(5))).toMap
    assert(got2("b") == (0L, 0L, true))
    assert(got2("a") == (10L, 1000L, true))
  }

  test("srmCheck refuses an arm in the data but not in the spec") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val assigned = Seq("a", "ghost").toDF("arm")
    val e = intercept[Exception] {
      Experiment.srmCheck(assigned, "arm", Seq(("a", 1000))).collect()
    }
    assert(msgs(e).exists(_.contains("not in the srmCheck spec")))
    intercept[IllegalArgumentException] {
      Experiment.srmCheck(assigned, "arm", Seq(("a", 900)))
    }
    intercept[IllegalArgumentException] {
      Experiment.srmCheck(assigned, "arm", Seq(("a", 1000)), thresholdPermille = 0)
    }
  }

  test("lift without a value column omits value_sum") {
    val units = Seq(("control", 1), ("t", 1)).toDF("arm", "c")
    val out = Experiment.lift(units, "arm", "c", None, "control")
    assert(out.columns.toSeq ==
      Seq("arm", "units", "conversions", "conv_permille", "lift_permille"))
    assert(out.count() == 2)
  }
}
