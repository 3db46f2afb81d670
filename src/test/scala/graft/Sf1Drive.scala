package graft

import org.apache.spark.sql.functions._

/** sf1-scale exactness sweep (round-7 verdict item 8): the oracle matrix
  * tops out at sf0.1, so this drive synthesizes a 10× corpus — ten copies
  * of the sf0.1 documents with per-copy token salting, which preserves each
  * copy's internal duplication character while keeping copies disjoint in
  * shingle/q-gram/window space (weak scaling, not a pathological 10×-
  * exact-duplication corpus) — runs the five heaviest dedup gates on it,
  * and dumps their outputs for the DuckDB oracle comparison script.
  *
  * The salt is TWO copy digits per token ("tok_33"): the corpus text
  * contains no digits (checked), so for any cross-copy doc pair the
  * edit distance is ≥ (count of the target copy's digit) = 2 × tokens ≥
  * 20 > the gate's maxDist 10 — cross-copy editdist pairs are impossible
  * BY CONSTRUCTION, which lets the (quadratic-cost) editdist oracle run
  * per copy instead of over the full 50k-doc corpus.
  * Run: sbt "Test/runMain graft.Sf1Drive"; compare with tools/sf1_check.py. */
object Sf1Drive {
  val gates = Seq("dedup_spans", "dedup_minhash_incremental", "dedup_editdist",
    "dedup_clusters", "dedup_simhash")

  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    val out = "/root/repo/tmp/sf1"
    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val copies = spark.range(0, 10).select(col("id").as("cp"))
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    docs0.crossJoin(broadcast(copies))
      .select((col("doc_id") + col("cp") * 10000000L).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit("_"), col("cp"), col("cp")))).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"corpus rows=${spark.read.parquet(s"$out/documents.parquet").count()}")
    gates.foreach { g =>
      val t0 = System.nanoTime()
      graft.queries.Catalog.queries(g)(spark, out)
        .write.mode("overwrite").parquet(s"/root/repo/tmp/sf1-out/$g")
      graft.operators.Dedup.releaseIntermediates()
      println(f"GATE $g ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"rows=${spark.read.parquet(s"/root/repo/tmp/sf1-out/$g").count()}")
    }
  }
}
