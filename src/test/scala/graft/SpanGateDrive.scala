package graft

/** Scratch drive: dump round-7 pipeline gates at sf0.001 for DuckDB parity. */
object SpanGateDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    Seq("multimodal_image_near_dup").foreach { n =>
      val df = graft.queries.Catalog.queries(n)(spark, d)
      df.write.mode("overwrite").parquet(s"/tmp/gate-out/$n")
      println(s"GATE $n rows=" + spark.read.parquet(s"/tmp/gate-out/$n").count())
    }
  }
}
