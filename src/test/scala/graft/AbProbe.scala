package graft

import org.apache.spark.sql.SparkSession

/** Weather-neutral A/B probe: alternates a session conf between two values
  * within ONE JVM, interleaving runs (ABAB…), so host steal hits both arms
  * equally. Reports per-arm min and median. Run:
  *   SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.AbProbe <sfDir> <query,query> <confKey> <valA> <valB> [reps]"
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val queries = args(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val confKey = args(2)
    val valA = args(3)
    val valB = args(4)
    val reps = if (args.length > 5) args(5).toInt else 5
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
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    queries.foreach { name =>
      // one unmeasured warmup per arm (JIT/codegen)
      Seq(valA, valB).foreach { v =>
        spark.conf.set(confKey, v); spark.catalog.clearCache()
        fns(name)(spark, sfDir).count()
      }
      val times = scala.collection.mutable.Map(valA -> Vector.empty[Double],
        valB -> Vector.empty[Double])
      (1 to reps).foreach { _ =>
        Seq(valA, valB).foreach { v =>
          spark.conf.set(confKey, v)
          spark.catalog.clearCache()
          System.gc(); Thread.sleep(100)
          val t0 = System.nanoTime()
          fns(name)(spark, sfDir).count()
          times(v) = times(v) :+ (System.nanoTime() - t0) / 1e9
        }
      }
      Seq(valA, valB).foreach { v =>
        val xs = times(v)
        println(f"[ab] $name%-28s $confKey=$v%-22s min=${xs.min}%7.3f med=${med(xs)}%7.3f all=${xs.map(x => f"$x%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
