package graft
object AudioResampleDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    val df = graft.queries.Catalog.queries("multimodal_audio_resample")(spark, "/root/testdata/sf0.001")
    df.write.mode("overwrite").parquet("/tmp/gate-out/multimodal_audio_resample")
    println("GATE rows=" + spark.read.parquet("/tmp/gate-out/multimodal_audio_resample").count())
  }
}
