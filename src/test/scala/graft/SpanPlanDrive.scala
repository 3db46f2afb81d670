package graft

/** Scratch: plan + phase timing audit of dedup_spans at sf0.1. */
object SpanPlanDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $what%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm the read path
    docs.count()
    time("full dedup_spans (cold)") {
      graft.operators.Dedup.duplicateSpans(docs, "doc_id", "text", 8).count()
    }
    time("full dedup_spans (warm)") {
      graft.operators.Dedup.duplicateSpans(docs, "doc_id", "text", 8).count()
    }
    val grams = docs.select(col("doc_id"),
      posexplode(graft.functions.NativeHash.kgramWindowHashes(col("text"), 8))
        .as(Seq("pos", "h")))
    time("native pos-hash stream only")(grams.count())
    time("dup-hash count only")(
      grams.groupBy("h").count().filter(col("count") > 1).count())
  }
}
