package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round plan artifact dumper: writes `.explain("formatted")`
  * for each requested headline query to `<outDir>/<query>_<tag>.txt`, under
  * the SAME session geometry the bench uses (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions=cpus, AQE on), so the committed plan files are the
  * plans the bench actually executes. Run:
  *   SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.PlanDump <sfDir> <outDir> <tag> [q1,q2,...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "plans/r16"
    val tag = if (args.length > 2) args(2) else "before"
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
    Files.createDirectories(Paths.get(outDir))
    val fns = SparkEntry.queries
    val names =
      if (args.length > 3) args(3).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      else Bench.headline.filter(fns.contains)
    names.foreach { name =>
      try {
        spark.catalog.clearCache()
        val df = fns(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
        println(s"[plandump] wrote $outDir/${name}_$tag.txt (${plan.length} chars)")
      } catch {
        case e: Throwable =>
          println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
