package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-job trace of one gate run: prints every Spark job's callsite,
  * duration, and task count — the "where do the 41 jobs of
  * store_delta_writer come from" measurement. Scenario-memoized gates run
  * inside a fresh epoch so the full engine run is traced. Run:
  *   SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.JobTrace <sfDir> <query>"
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      // r16 ADVICE: one-arg invocation used to take the default sfDir then
      // throw ArrayIndexOutOfBoundsException — print usage instead
      System.err.println("usage: JobTrace <sfDir> <query>")
      sys.exit(2)
    }
    val sfDir = args(0)
    val name = args(1)
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
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        // best attribution first: the job description (the engine labels
        // its steps per guide §1.5); else the first graft.* stack frame
        // from ANY stage's details (async/command execution hides the
        // caller from the final stage's callsite)
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
        val site = desc.getOrElse {
          val lines = j.stageInfos.flatMap(_.details.split('\n'))
          lines.find(l => l.contains("graft.") && !l.contains("JobTrace"))
            .map(_.trim)
            .getOrElse(lines.headOption.map(_.trim).getOrElse("?"))
        }
        val tasks = j.stageInfos.map(_.numTasks).sum
        starts.put(j.jobId, (System.nanoTime(), site, tasks))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.get(j.jobId)).foreach { case (t0, site, tasks) =>
          println(f"[job] ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e6}%8.1f ms tasks=$tasks%4d  $site")
        }
      }
    })
    val fns = SparkEntry.queries
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    println(s"=== $name (fresh scenario epoch) ===")
    val t0 = System.nanoTime()
    graft.queries.Scenarios.withFreshScenarios {
      fns(name)(spark, sfDir).count()
    }
    Thread.sleep(400)
    println(f"[job] TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
