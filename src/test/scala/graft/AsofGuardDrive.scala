package graft
import org.apache.spark.sql.SparkSession
object AsofGuardDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "ts")
    val r = Seq((1L, 5L, "v")).toDF("k", "ts", "v")
    try graft.operators.Temporal.asofJoin(l, r, "k", "k", "ts", "ts", Seq("nope"), "ts")
    catch { case e: IllegalArgumentException => println("payload probe: " + e.getMessage) }
    val lBad = Seq((1L, 10L)).toDF("__k", "ts")
    try graft.operators.Temporal.asofJoin(lBad, r, "__k", "k", "ts", "ts", Seq("v"), "ts")
    catch { case e: IllegalArgumentException => println("reserved probe: " + e.getMessage) }
    spark.stop()
  }
}
