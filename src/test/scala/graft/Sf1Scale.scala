package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r16 verdict item 7: one LARGER-SF wall-clock row per heavy dedup path,
  * where data parallelism is actually visible (at sf0.1 every headline
  * gate is fixed-cost bound and nine anti-scale from 8→32 cores).
  * Synthesizes the 10× document corpus (same salting as Sf1Drive) if
  * missing, then times the requested gates against it with the NOOP sink
  * (guide §1.4 — compute, not sink) under `local[$SPARK_GRAFT_CPUS]`.
  * Run once per core count:
  *   SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.Sf1Scale g1,g2"
  *   SPARK_GRAFT_CPUS=8  sbt "Test/runMain graft.Sf1Scale g1,g2"
  */
object Sf1Scale {
  def main(args: Array[String]): Unit = {
    val gates = args.headOption
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("dedup_ngram_jaccard", "dedup_tfidf_cosine",
        "dedup_containment", "graph_pagerank"))
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
    val out = "/root/repo/tmp/sf1"
    if (!new java.io.File(s"$out/documents.parquet").exists()) {
      val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      val copies = spark.range(0, 10).select(col("id").as("cp"))
      docs0.crossJoin(broadcast(copies))
        .select((col("doc_id") + col("cp") * 10000000L).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), " "),
            t => concat(t, lit("_"), col("cp"), col("cp")))).as("text"),
          col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
    }
    spark.read.parquet(s"$out/documents.parquet").count() // warm the read path
    gates.foreach { g =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.queries.Catalog.queries(g)(spark, out)
        .write.format("noop").mode("overwrite").save()
      println(f"[sf1scale] $g cpus=$cpus ${(System.nanoTime() - t0) / 1e9}%.1f s")
      graft.operators.Dedup.releaseIntermediates()
    }
    spark.stop()
  }
}
