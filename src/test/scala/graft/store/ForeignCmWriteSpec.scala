package graft.store

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Column-mapping WRITE support in the foreign Delta writer: appends into
  * name-mode and id-mode tables (physical column names / parquet field ids
  * in the data files, physically-keyed stats and partitionValues, logical
  * user surface), schema-drift refusal (fresh mapping ids are the owner's
  * call), and DV deletes composing with column mapping. */
class ForeignCmWriteSpec extends SparkSuite {
  import spark.implicits._

  private def fm(id: Long, phys: String) = new MetadataBuilder()
    .putLong("delta.columnMapping.id", id)
    .putString("delta.columnMapping.physicalName", phys).build()

  /** Logical (id, v, p) ← physical (col-11, col-22, col-33). */
  private def cmSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = true, fm(1, "col-11")),
    StructField("v", StringType, nullable = true, fm(2, "col-22")),
    StructField("p", IntegerType, nullable = true, fm(3, "col-33"))))

  /** One physical-named part file under `root/sub`; returns (name, size). */
  private def onePart(dir: String, df: org.apache.spark.sql.DataFrame): (String, Long) = {
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    val part = new File(dir).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    (part.getName, part.length)
  }

  /** Hand-craft a column-mapped foreign table (mode = name|id) with one
    * unpartitioned physical-named data file. */
  private def cmTable(root: String, mode: String): Unit = {
    val stage = tmpDir("cmw-stage")
    val phys0 = Seq((1L, "a", 1), (2L, "b", 2)).toDF("col-11", "col-22", "col-33")
    // an id-mode writer stamps parquet field ids into its data files
    val phys =
      if (mode != "id") phys0
      else {
        spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
        def idm(i: Long) = new MetadataBuilder().putLong("parquet.field.id", i).build()
        phys0.select(col("`col-11`").as("col-11", idm(1)),
          col("`col-22`").as("col-22", idm(2)), col("`col-33`").as("col-33", idm(3)))
      }
    val (f, sz) = onePart(stage, phys)
    Files.copy(java.nio.file.Paths.get(stage, f),
      java.nio.file.Paths.get(root, f)): Unit
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val meta = s"""{"metaData":{"id":"cm-$mode","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${mapper.writeValueAsString(cmSchema.json)},""" +
      s""""partitionColumns":[],"configuration":{"delta.columnMapping.mode":"$mode",""" +
      s""""delta.columnMapping.maxColumnId":"3"},"createdTime":1}}"""
    val add = s"""{"add":{"path":"$f","partitionValues":{},"size":$sz,""" +
      s""""modificationTime":1,"dataChange":true}}"""
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json"),
      (Seq("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["columnMapping"],"writerFeatures":["columnMapping"]}}""",
        meta, add)).mkString("\n").getBytes("UTF-8")): Unit
  }

  test("append into a NAME-mode table: physical file columns, logical reads") {
    val root = tmpDir("cmw-name")
    cmTable(root, "name")
    val t = new ForeignDeltaTable(spark, root)
    // user appends LOGICAL columns
    assert(t.append(Seq((3L, "c", 3), (4L, "d", 4)).toDF("id", "v", "p")) == 1L)
    val got = DeltaTable.read(spark, root).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, "a", 1), (2L, "b", 2), (3L, "c", 3), (4L, "d", 4)))
    // the written parquet carries PHYSICAL names
    val newFile = new File(root, "graft_data").listFiles.head.listFiles
      .find(_.getName.endsWith(".parquet")).get
    val cols = spark.read.parquet(newFile.getAbsolutePath).schema.fieldNames.toSeq
    assert(cols == Seq("col-11", "col-22", "col-33"))
    // stats keyed physically → skipping works through DeltaFileIndex
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val adds = new String(Files.readAllBytes(java.nio.file.Paths.get(
      root, "_delta_log", "00000000000000000001.json")), "UTF-8")
      .split('\n').filter(_.contains("\"add\"")).toSeq
      .map(l => mapper.readTree(l).get("add"))
    assert(adds.forall { a =>
      val st = mapper.readTree(a.get("stats").asText())
      st.get("minValues").has("col-11") && !st.get("minValues").has("id")
    })
    assert(DeltaTable.read(spark, root).filter(col("id") > 2L).count() == 2)
  }

  test("append into an ID-mode table: parquet field ids stamped") {
    val root = tmpDir("cmw-id")
    cmTable(root, "id")
    val t = new ForeignDeltaTable(spark, root)
    assert(t.append(Seq((10L, "x", 9)).toDF("id", "v", "p")) == 1L)
    val got = DeltaTable.read(spark, root).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, "a", 1), (2L, "b", 2), (10L, "x", 9)))
    // the field-id write flag is scoped to the write, not a lasting
    // session-conf mutation: an explicit user setting survives the append
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    try {
      assert(t.append(Seq((11L, "y", 9)).toDF("id", "v", "p")) == 2L)
      assert(spark.conf.get("spark.sql.parquet.fieldId.write.enabled") == "false",
        "fieldId.write.enabled leaked onto the session conf")
      // and the write itself still stamped ids despite the session value
      val files = new File(root, "graft_data").listFiles
        .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet"))
      assert(files.forall(f => spark.read.parquet(f.getAbsolutePath)
        .schema.fields.forall(_.metadata.contains("parquet.field.id"))))
    } finally spark.conf.unset("spark.sql.parquet.fieldId.write.enabled")
    // the new file's parquet schema carries field ids (read back with id
    // resolution against DELIBERATELY different physical names would only
    // work via ids — DeltaTable.read's id mode exercises exactly that)
    val newFile = new File(root, "graft_data").listFiles.head.listFiles
      .find(_.getName.endsWith(".parquet")).get
    val meta = spark.read.parquet(newFile.getAbsolutePath).schema
    assert(meta.fields.forall(_.metadata.contains("parquet.field.id")))
  }

  test("schema drift under column mapping assigns fresh ids; widening refuses") {
    val root = tmpDir("cmw-drift")
    cmTable(root, "name")
    val t = new ForeignDeltaTable(spark, root)
    // ADD-ONLY drift: the new column takes a fresh mapping id above
    // maxColumnId and a col-<uuid> physical name; the same commit's
    // metaData bumps delta.columnMapping.maxColumnId
    assert(t.append(Seq((5L, "e", 5, "extra")).toDF("id", "v", "p", "brand_new")) == 1L)
    val s = DeltaTable.snapshot(spark, root)
    val nf = s.schema.fields.find(_.name == "brand_new").get
    assert(nf.metadata.getLong("delta.columnMapping.id") == 4L)
    assert(nf.metadata.getString("delta.columnMapping.physicalName").startsWith("col-"))
    assert(s.configuration("delta.columnMapping.maxColumnId") == "4")
    // logical reads: fixture rows null out the new column, new row carries it
    val got = DeltaTable.read(spark, root)
    assert(got.schema.fieldNames.toSeq == Seq("id", "v", "p", "brand_new"))
    assert(got.filter(col("brand_new") === "extra").count() == 1)
    assert(got.filter(col("id") === 1L).select("brand_new").head().isNullAt(0))
    // the new data file carries the PHYSICAL col-<uuid> name, not the
    // logical one
    val physName = nf.metadata.getString("delta.columnMapping.physicalName")
    val newFile = new File(root, "graft_data").listFiles.head.listFiles
      .find(_.getName.endsWith(".parquet")).get
    val fileCols = spark.read.parquet(newFile.getAbsolutePath).schema.fieldNames.toSeq
    assert(fileCols.contains(physName) && !fileCols.contains("brand_new"))
    // WIDENING an existing mapped column still refuses (typeWidening is
    // the owner engine's call)
    val e = intercept[UnsupportedOperationException](
      t.append(Seq((6L, "f", 7L, "y")).toDF("id", "v", "p", "brand_new"),
        drift = graft.SchemaDrift.Full))
    assert(e.getMessage.contains("typeWidening"))
    // appends in the NEW shape keep working
    assert(t.append(Seq((6L, "f", 6, "x")).toDF("id", "v", "p", "brand_new")) == 2L)
  }

  test("DV delete composes with column mapping (logical predicate)") {
    val root = tmpDir("cmw-dv")
    cmTable(root, "name")
    val t = new ForeignDeltaTable(spark, root)
    t.append((100L until 120L).map(i => (i, s"r$i", (i % 3).toInt)).toDF("id", "v", "p"))
    val v = t.deleteWhere(col("p") === 1, allowProtocolUpgrade = true)
    assert(v == 2L)
    val got = DeltaTable.read(spark, root)
    assert(got.filter(col("p") === 1).count() == 0)
    assert(got.count() == 2 + 20 - 1 - 7) // fixture p=1 row + 7 appended p=1 rows
    // protocol kept columnMapping AND gained deletionVectors
    val s = DeltaTable.snapshot(spark, root)
    assert(s.readerFeatures.contains("columnMapping"))
    assert(s.readerFeatures.contains("deletionVectors"))
  }

  test("partitioned name-mode appends key partitionValues physically") {
    val root = tmpDir("cmw-part")
    // partitioned CM fixture: partition col p ← col-33; hive dir uses the
    // PHYSICAL name (what delta-spark writes under column mapping)
    val stage = tmpDir("cmw-pstage")
    val (f, sz) = onePart(stage, Seq((1L, "a")).toDF("col-11", "col-22"))
    new File(root, "col-33=1").mkdirs()
    Files.copy(java.nio.file.Paths.get(stage, f),
      java.nio.file.Paths.get(root, "col-33=1", f)): Unit
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val meta = s"""{"metaData":{"id":"cm-part","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${mapper.writeValueAsString(cmSchema.json)},""" +
      s""""partitionColumns":["p"],"configuration":{"delta.columnMapping.mode":"name",""" +
      s""""delta.columnMapping.maxColumnId":"3"},"createdTime":1}}"""
    val add = s"""{"add":{"path":"col-33=1/$f","partitionValues":{"col-33":"1"},""" +
      s""""size":$sz,"modificationTime":1,"dataChange":true}}"""
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json"),
      (Seq("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["columnMapping"],"writerFeatures":["columnMapping"]}}""",
        meta, add)).mkString("\n").getBytes("UTF-8")): Unit

    val t = new ForeignDeltaTable(spark, root)
    assert(t.append(Seq((2L, "b", 2), (3L, "c", 1)).toDF("id", "v", "p")) == 1L)
    val got = DeltaTable.read(spark, root).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, "a", 1), (2L, "b", 2), (3L, "c", 1)))
    // the commit's adds carry PHYSICALLY-keyed partitionValues and
    // physical hive dirs
    val adds = new String(Files.readAllBytes(java.nio.file.Paths.get(
      root, "_delta_log", "00000000000000000001.json")), "UTF-8")
      .split('\n').filter(_.contains("\"add\"")).toSeq
      .map(l => mapper.readTree(l).get("add"))
    assert(adds.forall(_.get("partitionValues").has("col-33")))
    assert(adds.forall(_.get("path").asText().contains("col-33=")))
    // logical partition pruning still works
    assert(DeltaTable.read(spark, root).filter(col("p") === 2).count() == 1)
  }
}
