package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Manual profiler: counts Spark jobs and wall time per phase of the
  * scd2_history scenario. Run: sbt "Test/runMain graft.ProfileScd2 <sfDir>". */
object ProfileScd2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var jobs = 0
    val t0s = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        t0s.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("callSite.short")).getOrElse("?")))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(t0s.get(j.jobId)).foreach { case (t0, site) =>
          println(f"      job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e6}%6.0fms  $site")
        }
      }
    })
    // warmup
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    def phase[A](name: String)(body: => A): A = {
      val j0 = jobs; val t0 = System.nanoTime()
      val r = body
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs  jobs=${jobs - j0}")
      r
    }

    val dest = java.nio.file.Files.createTempDirectory("graft-prof").toString
    val b1 = graft.queries.Scenarios.batch1(spark, sfDir)
    val b2 = graft.queries.Scenarios.batch2(spark, sfDir)
    val cfg = WriteConfig(deltaCol = Some("ver"))
    phase("full load") {
      new graft.scd2.Synchronizer(spark,
        new graft.sources.DataFrameSource(b1, Seq("c_custkey")), dest, cfg).execute()
    }
    phase("delta load") {
      new graft.scd2.Synchronizer(spark,
        new graft.sources.DataFrameSource(b2, Seq("c_custkey")), dest, cfg).execute()
    }
    phase("read history") {
      new graft.store.VersionedTable(spark, s"$dest/delta").read().count()
    }
    spark.stop()
  }
}
