package graft

import org.apache.spark.sql.SparkSession

/** Manual plan-hygiene dump: prints formatted physical plans for the
  * queries whose shape matters at 100 TB, to eyeball pushdown, broadcast,
  * and whole-stage codegen. Run: sbt "Test/runMain graft.PlanCheck <sfDir>". */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq(
      "q1_agg", "q3_top_orders", "p3_watermark", "p1_projection",
      "j1_anti_join", "w1_latest_per_key", "dedup_simhash", "ann_topk_bruteforce")
    val fns = SparkEntry.queries
    interesting.foreach { name =>
      println(s"\n========== $name ==========")
      fns(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
