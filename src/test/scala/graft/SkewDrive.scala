package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SkewDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions",4)
      .config("spark.sql.autoBroadcastJoinThreshold","-1") // force shuffle join to see salt keys
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val l = ((1 to 100000).map(i => (1L, s"v$i")) ++ Seq((2L,"x"))).toDF("k","payload")
    val r = Seq((1L,"one"),(2L,"two")).toDF("k","name")
    val j = graft.operators.Skew.saltedJoin(l, r, "k", parts = 8)
    println("rows: " + j.count() + " (expect 100001)")
    val plan = j.queryExecution.executedPlan.toString
    println("join keys include salt: " + plan.contains("__salt"))
    val perSalt = graft.operators.Skew.saltedCount(l.withColumn("k", lit(1L)), "k", 8)
    println("hot-key rows counted: " + perSalt.head.getLong(1) + " (expect 100001)")
    spark.stop()
  }
}
