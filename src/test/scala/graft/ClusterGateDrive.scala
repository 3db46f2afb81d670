package graft

/** Scratch drive: run the store_foreign_cluster gate at sf0.001/sf0.01 and
  * dump parquet for a DuckDB parity check. */
object ClusterGateDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val sf = d.split('/').last
      val df = graft.queries.Catalog.queries("store_foreign_cluster")(spark, d)
      df.write.mode("overwrite").parquet(s"/tmp/gate-out/cluster-$sf")
      println(s"GATE store_foreign_cluster $sf rows=" +
        spark.read.parquet(s"/tmp/gate-out/cluster-$sf").count())
    }
  }
}
