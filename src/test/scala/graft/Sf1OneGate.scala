package graft

/** Run a single Catalog gate against the ALREADY-SYNTHESIZED 10× corpora
  * under tmp/sf1 (run `Sf1Drive`/`Sf1Drive events` first) — the targeted
  * re-run tool for adding one gate to an existing sweep without paying the
  * full drive again. Usage: `Test/runMain graft.Sf1OneGate <gate>`. */
object Sf1OneGate {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Sf1OneGate <gateName>")
    val g = args.head
    val spark = SparkSuite.spark
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    val out = "/root/repo/tmp/sf1"
    val outDir = "/root/repo/tmp/sf1-out"
    val t0 = System.nanoTime()
    graft.queries.Catalog.queries(g)(spark, out)
      .write.mode("overwrite").parquet(s"$outDir/$g")
    graft.operators.Dedup.releaseIntermediates()
    println(f"GATE $g ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"rows=${spark.read.parquet(s"$outDir/$g").count()}")
  }
}
