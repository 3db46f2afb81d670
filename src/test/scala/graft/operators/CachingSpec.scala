package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The [[Caching.spread]] partition probe fence: probing a plan plans it
  * physically, which for an exchange-bearing plan (join, agg, window …)
  * executes its broadcast builds / AQE query stages as a side effect —
  * spread must only probe scan/projection shapes and return anything else
  * untouched (r11 verdict's "unfenced footgun"). */
class CachingSpec extends SparkSuite {
  import spark.implicits._

  test("spread probes and widens a narrow scan/projection") {
    val dir = tmpDir("spread-scan")
    (0L until 100L).toDF("id").coalesce(1).write.mode("overwrite").parquet(dir)
    val one = spark.read.parquet(dir)
    assert(Caching.probeSafe(one))
    val out = Caching.spread(one.select(col("id")))
    val target = spark.sparkContext.defaultParallelism
    assert(out.rdd.getNumPartitions >= math.min(target, 100))
    // projection+filter over the scan stays probe-safe
    assert(Caching.probeSafe(one.select(col("id")).filter(col("id") > 3)))
  }

  test("spread is the identity (no probe) on exchange-bearing plans") {
    val a = (0L until 10L).toDF("id")
    val b = (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v")
    val joined = a.join(b, "id").select("id", "v")
    assert(!Caching.probeSafe(joined))
    // returned UNTOUCHED: same reference, nothing planned or executed
    assert(Caching.spread(joined) eq joined)
    val agged = b.groupBy("v").agg(count(lit(1)).as("n"))
    assert(!Caching.probeSafe(agged))
    assert(Caching.spread(agged) eq agged)
    val sorted = b.orderBy("id")
    assert(!Caching.probeSafe(sorted))
    val distinct = b.distinct()
    assert(!Caching.probeSafe(distinct))
    val repart = b.repartition(7)
    assert(!Caching.probeSafe(repart))
  }

  test("intermediateStorage NONE is rejected (persist is a correctness device)") {
    val prev = spark.conf.getOption("spark.graft.intermediateStorage")
    spark.conf.set("spark.graft.intermediateStorage", "NONE")
    try {
      val e = intercept[IllegalArgumentException] {
        Caching.spillPersist((0L until 10L).toDF("id"))
      }
      assert(e.getMessage.contains("NONE"))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.graft.intermediateStorage", v)
      case None => spark.conf.unset("spark.graft.intermediateStorage")
    }
    // a real level still works and is released cleanly
    val p = Caching.spillPersist((0L until 10L).toDF("id"))
    assert(p.count() == 10L)
    Caching.release()
  }
}
