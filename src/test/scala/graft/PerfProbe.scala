package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch perf probe (test scope, not shipped): phase-level timing of the
  * heaviest dedup headliners at a given SF dir. Run:
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.PerfProbe"
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): Unit = {
      // two passes: report both (first = includes codegen JIT, second = steady)
      val t0 = System.nanoTime(); f
      val t1 = System.nanoTime(); spark.catalog.clearCache(); f
      val t2 = System.nanoTime()
      println(f"[probe] $label%-34s first ${(t1 - t0) / 1e9}%6.3f  steady ${(t2 - t1) / 1e9}%6.3f s")
      spark.catalog.clearCache()
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm the scan

    import graft.functions.TextFunctions.shingleSets
    import graft.operators.Dedup

    // ---- minhash_lsh internal stages
    {
      val sh = shingleSets(docs.select(col("doc_id").as("id"), col("text")), "id", "text", 3)
      time("mh: shingle")(sh.select(col("id"), size(col("sh"))).count())
      val signed = sh.select(col("id"), Dedup.minhashSignature(col("sh"), 64).as("sig"))
      time("mh: shingle+sign")(signed.count())
      val bucketed = signed
        .select(col("id"), explode(Dedup.lshBands(col("sig"), 16, 4)).as("b"))
        .select(col("id"), col("b.band").as("band"), col("b.bucket").as("bucket"))
      time("mh: +band explode")(bucketed.count())
      time("mh: census")(bucketed.groupBy("band", "bucket").agg(count(lit(1))).count())
      val a = bucketed.select(col("band"), col("bucket"), col("id").as("id_a"))
      val b = bucketed.select(col("band"), col("bucket"), col("id").as("id_b"))
      time("mh: raw pair join+dedup")(
        a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").dropDuplicates("id_a", "id_b").count())
      time("mh: full pairs")(
        Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5).count())
    }

    // ---- simhash
    {
      time("sh: pairs (no verify)")(
        Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 7, numChunks = 8, polyHash = true).count())
      time("sh: verified pairs")(
        Dedup.simhashVerifiedPairs(docs, "doc_id", "text", maxHamming = 7,
          threshold = 0.9, numChunks = 8, polyHash = true).count())
    }

    // ---- ngram jaccard
    {
      time("ng: full pairs")(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.3).count())
    }
    spark.stop()
  }
}
