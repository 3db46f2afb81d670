package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch e2e drive for the variantType frontier: fabricate a foreign
  * variant Delta table in a temp sandbox, read it, append through
  * ForeignDeltaTable, DV-delete a row (protocol upgrade path on a (3,7)
  * table that already lists variantType), and read the survivors back —
  * the full mutation lifecycle over a VARIANT column. */
object VariantDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = Files.createTempDirectory("variant-drive").toString
    val seed = Seq((1L, """{"a": 1}"""), (2L, """{"a": 2}"""))
      .toDF("id", "js").select(col("id"), parse_json(col("js")).as("v"))
    val staging = Files.createTempDirectory("variant-stage").toString
    seed.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, java.nio.file.Paths.get(root, "part-0-seed.parquet")): Unit
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val proto = """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      """"readerFeatures":["variantType","deletionVectors"],""" +
      """"writerFeatures":["variantType","deletionVectors"]}}"""
    val meta = s"""{"metaData":{"id":"vd-1","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${mapper.writeValueAsString(seed.schema.json)},""" +
      s""""partitionColumns":[],"configuration":{},"createdTime":1}}"""
    val add = s"""{"add":{"path":"part-0-seed.parquet","partitionValues":{},""" +
      s""""size":${new File(root, "part-0-seed.parquet").length()},"modificationTime":1,"dataChange":true}}"""
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json"),
      Seq(proto, meta, add).mkString("\n").getBytes("UTF-8")): Unit

    val t = new graft.store.ForeignDeltaTable(spark, root)
    val v1 = t.append(Seq((3L, """{"a": 3}""")).toDF("id", "js")
      .select(col("id"), parse_json(col("js")).as("v")))
    println(s"append committed v$v1")
    val v2 = t.deleteWhere(variant_get(col("v"), "$.a", "int") === 2)
    println(s"variant-predicate DV delete committed v$v2")
    val rows = graft.store.DeltaTable.read(spark, root)
      .select(col("id"), variant_get(col("v"), "$.a", "int").as("a"))
      .as[(Long, Int)].collect().sorted.toSeq
    println(s"survivors=$rows")
    assert(rows == Seq((1L, 1), (3L, 3)), s"unexpected survivors: $rows")
    println("VARIANT DRIVE OK")
    spark.stop()
  }
}
