package graft
import org.apache.spark.sql.SparkSession
object CapDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions",4)
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = "the cat sat on the mat and looked at the moon while birds sang softly in the trees"
    val df = Seq((1L, base), (2L, base.replace("softly","loudly")), (3L, "unrelated db text entirely"))
      .toDF("doc_id","text")
    val normal = graft.operators.Dedup.minhashLshPairs(df, "doc_id", "text", threshold=0.5)
    println("normal cap: " + normal.count() + " pairs (expect >=1)")
    val capped = graft.operators.Dedup.minhashLshPairs(df, "doc_id", "text", threshold=0.5, maxBucketSize=1)
    println("cap=1: " + capped.count() + " pairs (expect 0 — every shared bucket dropped)")
    spark.stop()
  }
}
