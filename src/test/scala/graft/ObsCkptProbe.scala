package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical probe: does an Observation latch onto the eager
  * localCheckpoint action on this Spark version? (If yes, iterative loops
  * can fuse their convergence count into the checkpoint materialization —
  * one job per round instead of two.) */
object ObsCkptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val obs = org.apache.spark.sql.Observation()
    val df = spark.range(0, 1000)
      .withColumn("chg", col("id") % 3 === 0)
      .observe(obs, coalesce(sum(when(col("chg"), 1L)), lit(0L)).as("changed"))
      .localCheckpoint(true)
    // wait max 10s so a non-firing observation fails loudly, not forever
    val got = try {
      val f = scala.concurrent.Future(obs.get("changed"))(
        scala.concurrent.ExecutionContext.global)
      scala.concurrent.Await.result(f, scala.concurrent.duration.Duration("10s"))
    } catch { case _: java.util.concurrent.TimeoutException => "TIMEOUT" }
    println(s"[obsprobe] observation on localCheckpoint(eager) => $got (expect 334)")
    println(s"[obsprobe] checkpointed rows = ${df.count()}")
    spark.stop()
  }
}
