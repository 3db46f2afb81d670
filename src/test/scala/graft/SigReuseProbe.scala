package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 verdict item 6 probe: does the band explode re-evaluate the
  * signature expression per band? Prints the occurrence count of the
  * native signature expression in the OPTIMIZED plan of the banding
  * projection, for (a) the current chained select shape and (b) a
  * lambda-free banding shape, plus a same-JVM interleaved A/B timing.
  * Run: sbt "Test/runMain graft.SigReuseProbe <sfDir>"
  */
object SigReuseProbe {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))

    import graft.operators.Dedup
    val numHashes = 64; val bands = 16; val rowsPerBand = 4
    val sh = graft.functions.TextFunctions.shingleSets(docs, "id", "text", 3)

    // (a) the production chain: sig in one select, banding in the next
    val chained = sh
      .select(col("id"), Dedup.minhashSignature(col("sh"), numHashes).as("sig"))
      .select(col("id"),
        explode(Dedup.lshBands(col("sig"), bands, rowsPerBand)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bucket").as("bucket"))
    val planA = chained.queryExecution.optimizedPlan.toString
    def cnt(plan: String, p: String) = p.r.findAllIn(plan).length
    println(s"[sig] chained: minhash_signature x ${cnt(planA, "graft_minhash")}" +
      s" transform x ${cnt(planA, "transform")}")

    // timing A/B, interleaved same-JVM (ABAB...)
    def time(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 5).foreach { i =>
      val ta = time(chained)
      println(f"[sig] run$i chained=$ta%.3f")
    }
    spark.stop()
  }
}
