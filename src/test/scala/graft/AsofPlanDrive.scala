package graft
import org.apache.spark.sql.SparkSession
object AsofPlanDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions",4)
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("asof_join")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    println("SortMergeJoin present: " + plan.contains("SortMergeJoin"))
    println("BroadcastNestedLoop present: " + plan.contains("BroadcastNestedLoop"))
    println("Window present: " + plan.contains("Window"))
    println("shuffle exchanges: " + "Exchange hashpartitioning".r.findAllIn(plan).length)
    spark.stop()
  }
}
