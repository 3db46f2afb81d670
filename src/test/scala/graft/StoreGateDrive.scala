package graft

/** Scratch drive: run the store + new text gates at sf0.001 and dump
  * parquet for a DuckDB parity check. */
object StoreGateDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    val d = "/root/testdata/sf0.001"
    Seq("store_skipping", "store_optimize_zorder", "store_cdf", "text_dedup_tokens").foreach { n =>
      val df = graft.queries.Catalog.queries(n)(spark, d)
      df.write.mode("overwrite").parquet(s"/tmp/gate-out/$n")
      println(s"GATE $n rows=" + spark.read.parquet(s"/tmp/gate-out/$n").count())
    }
  }
}
