package graft
import org.apache.spark.sql.SparkSession
object MinhashPlanDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions",8)
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val q = graft.operators.Dedup.minhashLshPairs(df, "doc_id", "text", threshold = 0.5)
    q.collect() // run with AQE so final plan shows reuse
    val plan = q.queryExecution.executedPlan.toString
    def cnt(p: String) = p.r.findAllIn(plan).length
    println("Exchange: " + cnt("Exchange hashpartitioning") +
      "  ReusedExchange: " + cnt("ReusedExchange") +
      "  FileScan parquet occurrences: " + cnt("Relation \\[") + "/" + cnt("FileScan"))
    spark.stop()
  }
}
