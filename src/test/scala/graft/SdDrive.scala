package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Manual drive of the stateful streaming dedup surface.
  * Run: sbt "Test/runMain graft.SdDrive" */
object SdDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val tmp = Files.createTempDirectory("sd-drive").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))

    Seq((1L, "hello world"), (2L, "HELLO   world"), (3L, "other"))
      .toDF("doc_id", "text").write.mode("append").parquet(s"$tmp/in")
    graft.streaming.StatefulDedup.runAvailableNow(
      spark, s"$tmp/in", schema, "doc_id", "text", s"$tmp/out", s"$tmp/ckpt")
    println("run1 survivors: " + spark.read.parquet(s"$tmp/out")
      .orderBy("doc_id").collect().map(r => s"${r.getLong(0)}").mkString(","))

    Seq((4L, "hello world"), (5L, "fresh")).toDF("doc_id", "text")
      .write.mode("append").parquet(s"$tmp/in")
    graft.streaming.StatefulDedup.runAvailableNow(
      spark, s"$tmp/in", schema, "doc_id", "text", s"$tmp/out", s"$tmp/ckpt")
    println("run2 survivors (cumulative): " + spark.read.parquet(s"$tmp/out")
      .orderBy("doc_id").collect().map(r => s"${r.getLong(0)}").mkString(","))

    println("PROBE: third run with NO new data")
    graft.streaming.StatefulDedup.runAvailableNow(
      spark, s"$tmp/in", schema, "doc_id", "text", s"$tmp/out", s"$tmp/ckpt")
    println("run3 survivors (must be unchanged): " + spark.read.parquet(s"$tmp/out")
      .orderBy("doc_id").collect().map(r => s"${r.getLong(0)}").mkString(","))
    spark.stop()
  }
}
