package graft
object EditDistGateDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    val df = graft.queries.Catalog.queries("dedup_editdist")(spark, "/root/testdata/sf0.001")
    df.write.mode("overwrite").parquet("/tmp/gate-out/dedup_editdist")
    println("GATE rows=" + spark.read.parquet("/tmp/gate-out/dedup_editdist").count())
  }
}
