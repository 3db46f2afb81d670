package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: Spark 4.1 native VARIANT — parquet round-trip, schema
  * json form, stats behavior — before wiring variantType into the foreign
  * Delta reader/writer. */
object VariantProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = Seq((1L, """{"a": 1, "b": "x"}"""), (2L, """[1, 2, 3]"""))
      .toDF("id", "js")
      .select(col("id"), parse_json(col("js")).as("v"))
    df.printSchema()
    println("type json: " + df.schema("v").dataType.json)
    println("fromJson roundtrip: " +
      org.apache.spark.sql.types.DataType.fromJson(df.schema("v").dataType.json))
    val dir = java.nio.file.Files.createTempDirectory("variant-probe").toString
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    back.printSchema()
    back.select(col("id"), variant_get(col("v"), "$.a", "int").as("a"),
      to_json(col("v")).as("js")).show(false)
    // parquet physical footprint
    val f = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      spark.sparkContext.hadoopConfiguration,
      new org.apache.hadoop.fs.Path(f.getAbsolutePath))
    println("parquet schema: " + footer.getFileMetaData.getSchema)
    spark.stop()
  }
}
