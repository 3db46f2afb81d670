package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Dedup

/** Per-round timing of the label-propagation loop (kept in sync with
  * Dedup.duplicateClustersLabel) over a persisted sf0.1 pair set — where
  * do the ~1.7 s go: rounds, checkpoints, or counts? */
object ClustersRoundDrive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.3)
      .select("id_a", "id_b").persist(StorageLevel.DISK_ONLY)
    println(s"[rounds] pairs=${pairs.count()}")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[rounds] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      spark.catalog.clearCache()
      val edges = t("edges persist")(
        { val e = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
            .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
            .distinct().persist(StorageLevel.DISK_ONLY)
          e.count(); e })
      val idType = org.apache.spark.sql.types.LongType
      var labels = t("seed")(
        edges.groupBy("dst").agg(min("src").as("mn"))
          .select(col("dst").as("id"), least(col("dst"), col("mn")).as("cluster_id"))
          .localCheckpoint(true))
      var iters = 1
      var converged = false
      while (!converged && iters < 20) {
        val self = labels.select(col("id"), col("cluster_id").as("nl"),
          col("cluster_id").as("own"))
        val upd = edges
          .join(labels.select(col("id").as("dst"), col("cluster_id").as("nl")), "dst")
          .select(col("src").as("id"), col("nl"), lit(null).cast(idType).as("own"))
        val next = t(s"round $iters ckpt")(
          self.unionByName(upd)
            .groupBy("id").agg(min("nl").as("cluster_id"), max("own").as("old"))
            .select(col("id"), col("cluster_id"),
              (col("cluster_id") < col("old")).as("chg"))
            .localCheckpoint(true))
        val changed = t(s"round $iters count")(next.filter(col("chg")).count())
        println(s"[rounds]   changed=$changed")
        labels = next.select("id", "cluster_id")
        converged = changed == 0
        iters += 1
      }
      edges.unpersist(blocking = false)
    }
    spark.stop()
  }
}
