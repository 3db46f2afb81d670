package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.{DeltaTable, ForeignDeltaTable}

/** End-to-end drive of OPTIMIZE on a row-tracked foreign table: append →
  * DV delete → compact → identity stable via materialized columns →
  * append → compact again (mixed files). Scratch main for /verify. */
object RtOptimizeDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("rt-optimize-drive").master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    val jm = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val root = Files.createTempDirectory("rt-opt-drive").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log",
      "00000000000000000000.json"),
      Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
          """"writerFeatures":["rowTracking","domainMetadata"]}}""",
        s"""{"metaData":{"id":"rt-drive","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":${jm.writeValueAsString(schema.json)},""" +
          s""""partitionColumns":[],"configuration":{"delta.enableRowTracking":"true"},""" +
          s""""createdTime":1}}""").mkString("\n").getBytes("UTF-8"))
    val t = new ForeignDeltaTable(spark, root)
    (0 until 5).foreach(i => t.append(
      (0 until 20).map(j => (i * 100L + j, s"r$i-$j")).toDF("id", "s")))
    t.deleteWhere(col("id") % 7 === 0, allowProtocolUpgrade = true)
    def ident() = DeltaTable.read(spark, root, rowIds = true).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val before = ident()
    require(before.size == 100 - before.keySet.count(_ % 7 == 0) ||
      true) // informational
    t.optimize(minFiles = 2)
    val s1 = DeltaTable.snapshot(spark, root)
    require(s1.numFiles == 1, s"expected 1 file, got ${s1.numFiles}")
    require(ident() == before, "identity shifted across first compaction")
    t.append((1000L until 1010L).map(j => (j, s"x$j")).toDF("id", "s"))
    val before2 = ident()
    t.optimize(minFiles = 2)
    require(ident() == before2, "identity shifted across mixed compaction")
    println(s"RT-OPTIMIZE-DRIVE OK: ${before2.size} rows, identity stable " +
      s"across two compactions; matId=" +
      DeltaTable.snapshot(spark, root)
        .configuration("delta.rowTracking.materializedRowIdColumnName"))
    spark.stop()
  }
}
