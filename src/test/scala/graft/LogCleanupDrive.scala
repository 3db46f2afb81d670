package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.{DeltaTable, ForeignDeltaTable, VersionedTable}

/** End-to-end drive of expired-log cleanup and multi-checkpoint life: a
  * graft table crosses TWO mirror checkpoints (the `_last_checkpoint`
  * replacement path), is stripped to a pure `_delta_log`, keeps accepting
  * foreign commits, then `cleanupMetadata` drops the pre-floor history
  * while reads and floor-time-travel stay intact. Scratch main for
  * /verify. */
object LogCleanupDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("log-cleanup-drive").master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    val root = Files.createTempDirectory("logclean-drive").toString

    // a graft table through 25 commits — mirror checkpoints at 10 and 20,
    // so _last_checkpoint is REPLACED (the writeStringAtomic fallback)
    val t = new VersionedTable(spark, s"$root/tbl")
    (0 until 25).foreach(i => t.append(Seq((i.toLong, s"r$i")).toDF("id", "s")))
    require(DeltaTable.snapshot(spark, s"$root/tbl").version == 24L)

    // strip to a pure _delta_log (the migrating-deployment handoff) and
    // keep committing through the foreign writer
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(s"$root/tbl/_graft_log"))
    val f = new ForeignDeltaTable(spark, s"$root/tbl")
    f.append(Seq((100L, "x")).toDF("id", "s")) // v25
    val total = DeltaTable.read(spark, s"$root/tbl").count()
    require(total == 26L, s"expected 26 rows, got $total")

    // cleanup: floor = checkpoint 20; v0..v19 json history goes
    val gone = f.cleanupMetadata(retentionMs = Some(-1000L))
    require(gone.contains("00000000000000000000.json") &&
      gone.contains("00000000000000000019.json") &&
      !gone.exists(_.startsWith("00000000000000000020")),
      s"unexpected cleanup set: $gone")
    require(DeltaTable.read(spark, s"$root/tbl").count() == total)
    require(DeltaTable.read(spark, s"$root/tbl", versionAsOf = Some(20L))
      .count() == 21L)
    val blocked =
      try { DeltaTable.read(spark, s"$root/tbl", versionAsOf = Some(5L)).count(); false }
      catch { case scala.util.control.NonFatal(_) => true }
    require(blocked, "pre-floor time travel should fail loudly")
    println(s"LOG-CLEANUP-DRIVE OK: ${gone.size} expired log files removed, " +
      s"$total rows intact, floor time travel resolves")
    spark.stop()
  }
}
