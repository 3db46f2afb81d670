package graft

import org.apache.spark.sql.SparkSession

/** JIT-share probe for the memoized scenario gates: run the same gate in
  * N FRESH scenario epochs within one JVM. Epoch 1 pays the write-path
  * JIT; later epochs are the steady state a long-running cluster sees.
  * Run: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.FreshEpochProbe <sfDir> <query> [n]"
  */
object FreshEpochProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val n = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fns = SparkEntry.queries
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    (1 to n).foreach { i =>
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(150)
      val t0 = System.nanoTime()
      graft.queries.Scenarios.withFreshScenarios {
        fns(name)(spark, sfDir).count()
      }
      println(f"[epoch] $name epoch$i ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    spark.stop()
  }
}
