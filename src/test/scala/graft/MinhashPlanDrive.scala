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
    // bucket rows are persisted DISK_ONLY: every consumer must read the
    // cache (InMemoryTableScan nodes), not re-derive from parquet. The
    // plan TEXT still nests the cached child plan under InMemoryRelation,
    // so raw FileScan occurrences overcount — actual source scans are the
    // cache build (1) + the two verify text joins.
    println("Exchange: " + cnt("Exchange hashpartitioning") +
      "  ReusedExchange: " + cnt("ReusedExchange") +
      "  InMemoryTableScan: " + cnt("InMemoryTableScan") +
      "  cachedRDDs: " + spark.sparkContext.getPersistentRDDs.size)
    spark.stop()
  }
}
