package graft

import org.apache.spark.sql.SparkSession

/** One-gate scratch drive: run a single Catalog gate against an sf dir,
  * print its formatted plan, and dump the result as parquet so the DuckDB
  * oracle (see [[PrintOracle]]) can be replayed against it locally without
  * a full `graft.Verify` pass.
  *
  * `sbt "Test/runMain graft.GateDrive <gate> [sfDir] [outDir]"` */
object GateDrive {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GateDrive <gate> [sfDir] [outDir]")
    val gate = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 2) args(2) else "/tmp/gate-drive"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = queries.Catalog.queries(gate)(spark, sfDir)
    df.explain("formatted")
    df.write.mode("overwrite").parquet(s"$outDir/$gate")
    println(s"rows=${spark.read.parquet(s"$outDir/$gate").count()}")
    spark.stop()
  }
}
