package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Optimization-round gate profiler: runs each named query under a
  * SparkListener and reports DETERMINISTIC work-shape metrics — job count,
  * stage count, task count, shuffle read/write bytes, input bytes — plus
  * wall time. Jobs/stages/bytes are weather-independent, so before/after
  * comparisons of an optimization hold even on a contended box (guide §1:
  * measure the shape, not just the clock). Run:
  *   SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.GateProfile <sfDir> q1,q2,..."
  */
object GateProfile {
  final class Acc extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var shufRead = 0L
    @volatile var shufWrite = 0L
    @volatile var input = 0L
    @volatile var spill = 0L
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages += 1
      tasks += s.stageInfo.numTasks
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        shufRead += m.shuffleReadMetrics.totalBytesRead
        shufWrite += m.shuffleWriteMetrics.bytesWritten
        input += m.inputMetrics.bytesRead
        spill += m.diskBytesSpilled
      }
    }
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; shufRead = 0L
      shufWrite = 0L; input = 0L; spill = 0L }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    val fns = SparkEntry.queries
    val names =
      if (args.length > 1) args(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      else Bench.headline.filter(fns.contains)
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "2").toInt
    spark.read.parquet(s"$sfDir/nation.parquet").count() // JIT warmup
    names.foreach { name =>
      (1 to runs).foreach { i =>
        spark.catalog.clearCache()
        // settle listener-bus stragglers from the previous run
        Thread.sleep(300)
        acc.reset()
        val t0 = System.nanoTime()
        try {
          fns(name)(spark, sfDir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300) // let stage-completed events land
          println(f"[profile] $name%-30s run$i wall=$wall%7.3f jobs=${acc.jobs}%4d " +
            f"stages=${acc.stages}%4d tasks=${acc.tasks}%6d " +
            f"shufW=${acc.shufWrite / 1024}%9dKB shufR=${acc.shufRead / 1024}%9dKB " +
            f"input=${acc.input / 1024}%9dKB spill=${acc.spill / 1024}%6dKB")
        } catch {
          case e: Throwable => println(s"[profile] $name run$i FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
