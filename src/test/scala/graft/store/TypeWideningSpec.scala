package graft.store

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SchemaDrift, SparkSuite}

/** Writer-side Delta Type Widening: the [[TypeWidening]] lattice/stamping,
  * the foreign-writer gate ([[ForeignDeltaTable]] drift=Full appends), and
  * the mirror ([[DeltaLogMirror]]) carrying graft-store drift into the
  * `_delta_log` with the protocol's typeWidening feature + delta.typeChanges
  * trail. Reader-side promotion is spec'd in DeltaReaderSpec. */
class TypeWideningSpec extends SparkSuite {
  import spark.implicits._

  private val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()

  // ------------------------------------------------------------- unit level

  test("lattice: legal and illegal widenings") {
    assert(TypeWidening.legal(IntegerType, LongType))
    assert(TypeWidening.legal(ByteType, ShortType))
    assert(TypeWidening.legal(FloatType, DoubleType))
    assert(TypeWidening.legal(IntegerType, DoubleType))
    assert(TypeWidening.legal(DateType, TimestampNTZType))
    assert(TypeWidening.legal(DecimalType(10, 2), DecimalType(14, 4)))
    assert(TypeWidening.legal(IntegerType, DecimalType(10, 0)))
    assert(TypeWidening.legal(LongType, DecimalType(22, 2)))
    // graft-legal but DELTA-illegal
    assert(!TypeWidening.legal(DateType, TimestampType))
    // narrowings and lossy changes
    assert(!TypeWidening.legal(LongType, IntegerType))
    assert(!TypeWidening.legal(DoubleType, FloatType))
    assert(!TypeWidening.legal(DecimalType(14, 4), DecimalType(10, 2)))
    assert(!TypeWidening.legal(IntegerType, DecimalType(9, 0)))
    assert(!TypeWidening.legal(LongType, DecimalType(19, 0)))
    assert(!TypeWidening.legal(StringType, LongType))
  }

  test("stamp: field, nested array element, and carried trails") {
    val old = StructType(Seq(
      StructField("a", IntegerType),
      StructField("arr", ArrayType(FloatType)),
      StructField("st", StructType(Seq(StructField("x", ShortType))))))
    val nw = StructType(Seq(
      StructField("a", LongType),
      StructField("arr", ArrayType(DoubleType)),
      StructField("st", StructType(Seq(StructField("x", IntegerType)))),
      StructField("fresh", StringType)))
    val (stamped, changes) = TypeWidening.stamp(old, nw)
    assert(changes.map(_.toString).toSet == Set(
      "a: int -> bigint", "arr.element: float -> double", "st.x: smallint -> int"))
    assert(changes.forall(_.legalForDelta))
    val aTc = stamped("a").metadata.getMetadataArray(TypeWidening.MetaKey)
    assert(aTc.length == 1 && aTc(0).getString("fromType") == "integer" &&
      aTc(0).getString("toType") == "long" && !aTc(0).contains("fieldPath"))
    val arrTc = stamped("arr").metadata.getMetadataArray(TypeWidening.MetaKey)
    assert(arrTc(0).getString("fieldPath") == "element")
    // the nested struct FIELD carries its own entry (nearest-ancestor rule)
    val xTc = stamped("st").dataType.asInstanceOf[StructType]("x")
      .metadata.getMetadataArray(TypeWidening.MetaKey)
    assert(xTc(0).getString("fromType") == "short" && xTc(0).getString("toType") == "integer")
    assert(!stamped("fresh").metadata.contains(TypeWidening.MetaKey))
    // idempotent: re-stamping the same shape finds nothing and keeps trails
    val (again, none) = TypeWidening.stamp(stamped, StructType(stamped.fields.map(f =>
      f.copy(metadata = Metadata.empty))))
    assert(none.isEmpty)
    assert(again("a").metadata.getMetadataArray(TypeWidening.MetaKey).length == 1)
    // a SECOND widen appends to the carried trail
    val wider = StructType(again.fields.map(f =>
      if (f.name == "a") f.copy(dataType = DecimalType(22, 0)) else f))
    val (twice, more) = TypeWidening.stamp(again, wider)
    assert(more.map(_.toString) == Seq("a: bigint -> decimal(22,0)"))
    val trail = twice("a").metadata.getMetadataArray(TypeWidening.MetaKey)
    assert(trail.map(m => (m.getString("fromType"), m.getString("toType"))).toSeq ==
      Seq(("integer", "long"), ("long", "decimal(22,0)")))
  }

  // --------------------------------------------------------- foreign writer

  private def rm(path: String): Unit = {
    def loop(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(loop)
      f.delete(): Unit
    }
    loop(new File(path))
  }

  /** Minimal foreign table: one narrow parquet file + v0 commit. */
  private def narrowTable(root: String, config: String = "{}",
      protocol: String = """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      df: org.apache.spark.sql.DataFrame = null): Unit = {
    val data = Option(df).getOrElse(Seq((1, 1.5f), (2, 2.5f)).toDF("id", "score"))
    val staging = tmpDir("tw-stage")
    data.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dataName = "part-00000-narrow.snappy.parquet"
    Files.copy(part.toPath, java.nio.file.Paths.get(root, dataName)): Unit
    rm(staging)
    val meta = s"""{"metaData":{"id":"tw-1","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${mapper.writeValueAsString(data.schema.json)},""" +
      s""""partitionColumns":[],"configuration":$config,"createdTime":1}}"""
    val add = s"""{"add":{"path":"$dataName","partitionValues":{},""" +
      s""""size":${new File(root, dataName).length()},"modificationTime":1,"dataChange":true}}"""
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json"),
      Seq(protocol, meta, add).mkString("\n").getBytes("UTF-8")): Unit
  }

  private def commitLines(root: String, v: Long): Seq[String] =
    new String(Files.readAllBytes(java.nio.file.Paths.get(root, "_delta_log",
      f"$v%020d.json")), "UTF-8").split('\n').toSeq.filter(_.nonEmpty)

  test("foreign widen refuses without the owner's delta.enableTypeWidening") {
    val root = tmpDir("tw-refuse")
    narrowTable(root)
    val t = new ForeignDeltaTable(spark, root)
    val e = intercept[UnsupportedOperationException](
      t.append(Seq((3L, 3.5d)).toDF("id", "score"), drift = SchemaDrift.Full))
    assert(e.getMessage.contains("typeWidening") &&
      e.getMessage.contains("delta.enableTypeWidening"))
  }

  test("foreign widen refuses changes outside the Delta lattice") {
    val root = tmpDir("tw-lattice")
    narrowTable(root, config = """{"delta.enableTypeWidening":"true"}""",
      df = Seq((1, java.sql.Date.valueOf("2026-01-02"))).toDF("id", "d"))
    val t = new ForeignDeltaTable(spark, root)
    // date → timestamp(tz) is graft-legal drift but NOT Delta typeWidening
    val e = intercept[UnsupportedOperationException](
      t.append(Seq((2L, java.sql.Timestamp.valueOf("2026-01-02 03:04:05")))
        .toDF("id", "d"), drift = SchemaDrift.Full))
    assert(e.getMessage.contains("lattice"))
  }

  test("foreign widen with feature active: typeChanges stamped, files read back") {
    val root = tmpDir("tw-ok")
    narrowTable(root, config = """{"delta.enableTypeWidening":"true"}""",
      protocol = """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["typeWidening"],"writerFeatures":["typeWidening"]}}""")
    val t = new ForeignDeltaTable(spark, root)
    val v = t.append(Seq((3L, 3.5d)).toDF("id", "score"), drift = SchemaDrift.Full)
    assert(v == 1L)
    val df = DeltaTable.read(spark, root)
    assert(df.schema("id").dataType == LongType)
    assert(df.schema("score").dataType == DoubleType)
    assert(df.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)))
    // the commit: NO protocol action (feature already listed), metaData
    // carries the stable-shape trail (no tableVersion) on both fields
    val lines = commitLines(root, 1L)
    assert(!lines.exists(_.contains("\"protocol\"")))
    val md = lines.find(_.contains("\"metaData\"")).get
    val schema = DataType.fromJson(
      mapper.readTree(md).get("metaData").get("schemaString").asText())
      .asInstanceOf[StructType]
    val idTc = schema("id").metadata.getMetadataArray(TypeWidening.MetaKey)
    assert(idTc(0).getString("fromType") == "integer" &&
      idTc(0).getString("toType") == "long" && !idTc(0).contains("tableVersion"))
    assert(schema("score").metadata.getMetadataArray(TypeWidening.MetaKey)(0)
      .getString("toType") == "double")
    // a second, shape-stable append leaves the schema (and trail) alone
    t.append(Seq((4L, 4.5d)).toDF("id", "score"))
    assert(!commitLines(root, 2L).exists(_.contains("\"metaData\"")))
  }

  test("foreign widen upgrades the protocol when the property is set but the feature missing") {
    val root = tmpDir("tw-upg")
    narrowTable(root, config = """{"delta.enableTypeWidening":"true"}""")
    val t = new ForeignDeltaTable(spark, root)
    t.append(Seq((3L, 3.5d)).toDF("id", "score"), drift = SchemaDrift.Full)
    val lines = commitLines(root, 1L)
    val pn = mapper.readTree(lines.find(_.contains("\"protocol\"")).get).get("protocol")
    assert(pn.get("minReaderVersion").asInt() == 3 && pn.get("minWriterVersion").asInt() == 7)
    import scala.jdk.CollectionConverters._
    val rf = pn.get("readerFeatures").elements().asScala.map(_.asText()).toSeq
    val wf = pn.get("writerFeatures").elements().asScala.map(_.asText()).toSeq
    assert(rf == Seq("typeWidening"))
    // legacy (1,2)-implied writer features survive the upgrade
    assert(wf.toSet == Set("appendOnly", "invariants", "typeWidening"))
    // the upgraded table reads back whole
    assert(DeltaTable.read(spark, root).count() == 3)
  }

  test("preview-only tables stamp tableVersion per entry") {
    val root = tmpDir("tw-prev")
    narrowTable(root, config = """{"delta.enableTypeWidening":"true"}""",
      protocol = """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["typeWidening-preview"],"writerFeatures":["typeWidening-preview"]}}""")
    val t = new ForeignDeltaTable(spark, root)
    t.append(Seq((3L, 3.5d)).toDF("id", "score"), drift = SchemaDrift.Full)
    val md = commitLines(root, 1L).find(_.contains("\"metaData\"")).get
    val schema = DataType.fromJson(
      mapper.readTree(md).get("metaData").get("schemaString").asText())
      .asInstanceOf[StructType]
    val tc = schema("id").metadata.getMetadataArray(TypeWidening.MetaKey)(0)
    assert(tc.getLong("tableVersion") == 1L)
  }

  // ----------------------------------------------------------------- mirror

  test("mirror: graft drift widening upgrades the _delta_log and stamps typeChanges") {
    val root = tmpDir("tw-mirror")
    val t = new VersionedTable(spark, root)
    t.append(Seq((1, 10)).toDF("id", "v")) // v: int
    t.append(Seq((2, 5000000000L)).toDF("id", "v"), drift = SchemaDrift.Full)
    val v1 = commitLines(root, 1L)
    val pn = mapper.readTree(v1.find(_.contains("\"protocol\"")).get).get("protocol")
    assert(pn.get("minReaderVersion").asInt() == 3)
    import scala.jdk.CollectionConverters._
    assert(pn.get("readerFeatures").elements().asScala.map(_.asText()).toSeq ==
      Seq("typeWidening"))
    assert(pn.get("writerFeatures").elements().asScala.map(_.asText()).toSeq ==
      Seq("appendOnly", "invariants", "typeWidening"))
    val md = v1.find(_.contains("\"metaData\"")).get
    val schema = DataType.fromJson(
      mapper.readTree(md).get("metaData").get("schemaString").asText())
      .asInstanceOf[StructType]
    val tc = schema("v").metadata.getMetadataArray(TypeWidening.MetaKey)
    assert(tc(0).getString("fromType") == "integer" && tc(0).getString("toType") == "long")
    // an external Delta reader over the mirrored log serves both vintages
    val got = DeltaTable.read(spark, root).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == Seq((1, 10L), (2, 5000000000L)))
    // drift-free commits do NOT re-emit metaData (the stamp is stable)
    t.append(Seq((3, 7L)).toDF("id", "v"))
    assert(!commitLines(root, 2L).exists(_.contains("\"metaData\"")))
    // ... and the trail survives to the checkpoint: protocol row still
    // lists the feature, metaData row still carries the trail
    (3L to 10L).foreach(i => t.append(Seq((i.toInt, i)).toDF("id", "v")): Unit)
    val ckpt = spark.read.parquet(
      new File(root, "_delta_log/00000000000000000010.checkpoint.parquet").getAbsolutePath)
    val protoRow = ckpt.filter(col("protocol").isNotNull).select("protocol.*").head()
    assert(protoRow.getAs[scala.collection.Seq[String]]("readerFeatures")
      .contains("typeWidening"))
    val ckptSchema = DataType.fromJson(ckpt.filter(col("metaData").isNotNull)
      .select("metaData.schemaString").head().getString(0)).asInstanceOf[StructType]
    assert(ckptSchema("v").metadata.getMetadataArray(TypeWidening.MetaKey).nonEmpty)
  }
}
