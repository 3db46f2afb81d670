package graft
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
object FacadeDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions",4)
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("facade").toString
    val schema = StructType(Seq(StructField("id",LongType), StructField("v",StringType), StructField("ver",LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(Row(1L,"a",1L), Row(2L,"b",1L))), schema)
      .write.parquet(s"$tmp/src")
    val src = new graft.sources.ParquetSource(s"$tmp/src", pks=Seq("id"))
    val cfg = WriteConfig(deltaCol = Some("ver"))
    println("one-call sync: " + Graft.sync(spark, src, s"$tmp/dest", cfg))
    val w = Graft.writer(spark, src, s"$tmp/dest", cfg)
    println("resolved pks=" + w.targetPks + " delta=" + w.targetDelta)
    println("second sync (no change): " + w.execute())
    println("consistency issues: " + w.checkConsistency().count())
    println("current state rows: " + w.currentState().count())
    spark.stop()
  }
}
