package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Scratch probe: can Spark 4.1's parquet readers serve an INT32/FLOAT
  * file under a wider read schema (long/double/decimal)? Gates the
  * typeWidening reader-feature acceptance. */
object WidenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("widen").toString
    Seq((1, 1.5f, 7.toShort, java.sql.Date.valueOf("2026-01-02")))
      .toDF("i", "f", "s", "d").write.parquet(s"$dir/p")
    def rd(schema: StructType, vec: Boolean): Unit = {
      spark.conf.set("spark.sql.parquet.enableVectorizedReader", vec.toString)
      val r = spark.read.schema(schema).parquet(s"$dir/p").collect()(0)
      println(s"vec=$vec ${schema.simpleString} -> $r")
    }
    for (vec <- Seq(true, false)) {
      try rd(StructType(Seq(StructField("i", LongType))), vec)
      catch { case e: Throwable => println(s"vec=$vec i->long FAIL ${e.getMessage.take(200)}") }
      try rd(StructType(Seq(StructField("f", DoubleType))), vec)
      catch { case e: Throwable => println(s"vec=$vec f->double FAIL ${e.getMessage.take(200)}") }
      try rd(StructType(Seq(StructField("s", IntegerType))), vec)
      catch { case e: Throwable => println(s"vec=$vec s->int FAIL ${e.getMessage.take(200)}") }
      try rd(StructType(Seq(StructField("i", DecimalType(10, 0)))), vec)
      catch { case e: Throwable => println(s"vec=$vec i->dec(10,0) FAIL ${e.getMessage.take(200)}") }
      try rd(StructType(Seq(StructField("d", TimestampNTZType))), vec)
      catch { case e: Throwable => println(s"vec=$vec d->tsntz FAIL ${e.getMessage.take(200)}") }
      try rd(StructType(Seq(StructField("i", DoubleType))), vec)
      catch { case e: Throwable => println(s"vec=$vec i->double FAIL ${e.getMessage.take(200)}") }
    }
    spark.stop()
  }
}
