package graft
object StoreGateDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    val d = "/root/testdata/sf0.001"
    Seq("store_skipping", "store_optimize_zorder").foreach { n =>
      val df = graft.queries.Catalog.queries(n)(spark, d)
      df.write.mode("overwrite").parquet(s"/tmp/gate-out/$n")
      println(s"GATE $n rows=" + spark.read.parquet(s"/tmp/gate-out/$n").count())
    }
  }
}
