package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import org.apache.spark.storage.StorageLevel
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Phase-timing probe for the dedup_clusters bench entry: splits the cost
  * into ngramJaccardPairs materialization vs label-propagation rounds.
  * Run: sbt "Test/runMain graft.ProfileClusters /root/testdata/sf0.1". */
object ProfileClusters {
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
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    def timed[T](name: String)(f: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  jobs=${jobs.get() - j0}")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warmup
    docs.select(count(lit(1))).collect()

    for (round <- 1 to 3) {
      spark.catalog.clearCache()
      println(s"--- round $round ---")
      timed("  hsets only")(
        graft.functions.TextFunctions.shingleSets(
          docs.select(col("doc_id").as("id"), col("text")), "id", "text", 3)
          .select(col("id"), size(col("sh")).cast("long").as("sz"),
            transform(col("sh"), s => xxhash64(s)).as("hs"))
          .select(count(lit(1))).collect())
      // replicate the ngramJaccardPairs phases over a warm hsets to see
      // where its jobs/time go (keep in sync with Dedup.ngramJaccardPairs)
      locally {
        val threshold = 0.3
        val hsets = graft.functions.TextFunctions.shingleSets(
          docs.select(col("doc_id").as("id"), col("text")), "id", "text", 3)
          .select(col("id"), size(col("sh")).cast("long").as("sz"),
            sort_array(transform(col("sh"), s => xxhash64(s))).as("hs"))
          .persist(StorageLevel.DISK_ONLY)
        hsets.count()
        val posting = hsets.select(col("id"), col("sz"), explode(col("hs")).as("shh"))
        val dfreq = posting.groupBy("shh").agg(count(lit(1)).as("sdf"))
        timed("    dfreq")(dfreq.select(count(lit(1))).collect())
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy(col("sdf"), col("shh"))
        val prefix = posting.join(dfreq, "shh")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= col("sz") - ceil(col("sz") * threshold) + 1)
          .select("shh", "id")
        timed("    prefix")(prefix.select(count(lit(1))).collect())
        val cand = prefix.select(col("shh"), col("id").as("id_a"))
          .join(prefix.select(col("shh"), col("id").as("id_b")), Seq("shh"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
        timed("    cand+dedup")(cand.select(count(lit(1))).collect())
        val verify = cand
          .join(hsets.select(col("id").as("id_a"), col("sz").as("sz_a"), col("hs").as("hs_a")), "id_a")
          .join(hsets.select(col("id").as("id_b"), col("sz").as("sz_b"), col("hs").as("hs_b")), "id_b")
          .filter(least(col("sz_a"), col("sz_b")) * 1000L >=
            greatest(col("sz_a"), col("sz_b")) * (threshold * 1000).toLong)
          .withColumn("jaccard_x1000", Dedup.jaccardX1000Sorted(
            col("hs_a"), col("hs_b"), col("sz_a"), col("sz_b")))
          .filter(col("jaccard_x1000") >= (threshold * 1000).toLong)
        timed("    verify")(verify.select(count(lit(1))).collect())
        hsets.unpersist(blocking = false)
      }
      val pairs = timed("ngramJaccardPairs") {
        val p = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.3)
          .select("id_a", "id_b").persist(StorageLevel.DISK_ONLY)
        p.count(); p
      }
      timed("duplicateClusters(label)")(
        Dedup.duplicateClusters(pairs).count())
      timed("duplicateClusters(stars)")(
        Dedup.duplicateClusters(pairs, algorithm = "stars").count())
      timed("end-to-end gate shape")(
        Dedup.duplicateClusters(
          Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.3)
            .select("id_a", "id_b")).count())
    }
    spark.stop()
  }
}
