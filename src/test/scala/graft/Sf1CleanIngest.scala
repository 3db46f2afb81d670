package graft

import org.apache.spark.sql.SparkSession

/** Re-run ONLY the streaming_clean_ingest leg of the sf1 events sweep
  * (the synthesized corpora must already exist under tmp/sf1). */
object Sf1CleanIngest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    val out = "/root/repo/tmp/sf1"
    val outDir = "/root/repo/tmp/sf1-out"
    val t0 = System.nanoTime()
    graft.queries.Catalog.queries("streaming_clean_ingest")(spark, out)
      .write.mode("overwrite").parquet(s"$outDir/streaming_clean_ingest")
    graft.operators.Dedup.releaseIntermediates()
    println(f"GATE streaming_clean_ingest ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=${spark.read.parquet(s"$outDir/streaming_clean_ingest").count()}")
  }
}
