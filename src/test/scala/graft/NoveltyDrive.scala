package graft
object NoveltyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    val d = "/root/testdata/sf0.001"
    val df = graft.queries.Catalog.queries("text_bigram_novelty")(spark, d)
    df.write.mode("overwrite").parquet("/tmp/gate-out/text_bigram_novelty")
    println("GATE rows=" + spark.read.parquet("/tmp/gate-out/text_bigram_novelty").count())
    df.orderBy("doc_id").show(5)
  }
}
