package graft
object SceneCutDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    val df = graft.queries.Catalog.queries("multimodal_scene_cuts")(spark, "/root/testdata/sf0.001")
    df.write.mode("overwrite").parquet("/tmp/gate-out/multimodal_scene_cuts")
    println("GATE rows=" + spark.read.parquet("/tmp/gate-out/multimodal_scene_cuts").count())
  }
}
