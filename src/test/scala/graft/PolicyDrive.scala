package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.{DeltaTable, ForeignDeltaTable}

/** End-to-end drive of the declared-column-contract surface on a foreign
  * Delta table: CHECK constraint + generated + identity on ONE table,
  * through append / merge / updateWhere / deleteWhere, read back through
  * the external-reader path. Scratch main for /verify. */
object PolicyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("policy-drive").master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    val root = Files.createTempDirectory("policy-drive").toString

    // a table another engine created: qty CHECK > 0, total generated
    // as qty*price, id GENERATED ALWAYS AS IDENTITY (START 1000 STEP 5)
    val jm = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    // the seed row consumed id=1000, and an honest owner engine recorded
    // that as the high-water mark — assignment must continue ABOVE it
    val idMeta = new MetadataBuilder().putLong("delta.identity.start", 1000L)
      .putLong("delta.identity.step", 5L)
      .putLong("delta.identity.highWaterMark", 1000L)
      .putBoolean("delta.identity.allowExplicitInsert", false).build()
    val genMeta = new MetadataBuilder().putString(
      "delta.generationExpression", "qty * price").build()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true, idMeta),
      StructField("qty", IntegerType, nullable = false),
      StructField("price", DoubleType),
      StructField("total", DoubleType, nullable = true, genMeta)))
    val stage = Files.createTempDirectory("policy-stage").toString
    Seq((1000L, 2, 3.0, 6.0)).toDF("id", "qty", "price", "total")
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, java.nio.file.Paths.get(root, "seed.parquet"))
    val meta = s"""{"metaData":{"id":"drive-1","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${jm.writeValueAsString(schema.json)},"partitionColumns":[],""" +
      s""""configuration":{"delta.constraints.qty_pos":"qty > 0"},"createdTime":1}}"""
    val add = s"""{"add":{"path":"seed.parquet","partitionValues":{},""" +
      s""""size":${new File(root, "seed.parquet").length()},"modificationTime":1,"dataChange":true}}"""
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json"),
      (Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta, add))
        .mkString("\n").getBytes("UTF-8"))

    val t = new ForeignDeltaTable(spark, root)

    // 1. append WITHOUT id/total: identity assigned, generated computed
    require(t.append(Seq((3, 2.0), (1, 10.0)).toDF("qty", "price")) == 1L)
    val afterAppend = DeltaTable.read(spark, root).orderBy("id").collect()
    require(afterAppend.length == 3, s"rows: ${afterAppend.length}")
    val assigned = afterAppend.filter(_.getLong(0) > 1000L)
    require(assigned.length == 2, s"expected 2 assigned ids above the " +
      s"seed's recorded mark, got ${assigned.map(_.getLong(0)).toSeq}")
    require(assigned.forall(r => (r.getLong(0) - 1000L) % 5L == 0L),
      "identity off lattice")
    require(assigned.forall(r => r.getDouble(3) == r.getInt(1) * r.getDouble(2)),
      "generated total wrong")
    val hwm1 = DeltaTable.snapshot(spark, root).schema.fields.find(_.name == "id")
      .get.metadata.getLong("delta.identity.highWaterMark")
    require(hwm1 == assigned.map(_.getLong(0)).max, "hwm not advanced")

    // 2. violating append refuses, table untouched
    val refused = try { t.append(Seq((-1, 1.0)).toDF("qty", "price")); false }
    catch { case e: Throwable =>
      (e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
        .contains("qty_pos") }
    require(refused, "violating append not refused with constraint name")
    require(DeltaTable.snapshot(spark, root).version == 1L, "table moved")

    // 3. updateWhere recomputes generated; constraint holds
    t.updateWhere(col("qty") === 3, Map("price" -> lit(7.0)),
      allowProtocolUpgrade = true)
    val upd = DeltaTable.read(spark, root).filter(col("qty") === 3).head()
    require(upd.getDouble(3) == 21.0, s"update did not recompute total: $upd")

    // 4. deleteWhere still composes
    t.deleteWhere(col("qty") === 1)
    require(DeltaTable.read(spark, root).count() == 2)

    // 5. next identity batch continues above the mark after all that
    t.append(Seq((9, 1.5)).toDF("qty", "price"))
    val last = DeltaTable.read(spark, root).orderBy(desc("id")).head()
    require(last.getLong(0) > hwm1 && (last.getLong(0) - 1000L) % 5L == 0L)
    require(last.getDouble(3) == 13.5)

    println("POLICY-DRIVE OK: identity lattice + hwm metaData, generated " +
      "compute/recompute, CHECK refusal, DV delete compose = " +
      DeltaTable.read(spark, root).orderBy("id").collect().mkString("; "))
    spark.stop()
  }
}
