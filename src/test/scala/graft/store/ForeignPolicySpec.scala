package graft.store

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Declared-column-contract enforcement on the foreign Delta write path
  * ([[ColumnPolicies]]): CHECK constraints, legacy invariants, NOT NULL,
  * generated columns (computed when absent, equality-enforced when
  * provided, recomputed on UPDATE), and identity columns (lattice
  * assignment past the high-water mark, mark advanced through the
  * commit's metaData so any OTHER Delta writer continues above us). All
  * checks run inside the distributed write job — a violation fails the
  * write loudly and leaves the table untouched. */
class ForeignPolicySpec extends SparkSuite {
  import spark.implicits._

  private val jmapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()

  /** Hand-crafted foreign table with a policy-bearing schema: one data
    * file + v0 with protocol (1,2) unless overridden. */
  private def policyTable(
      root: String, df: DataFrame, schema: StructType,
      config: String = "{}"): Unit = {
    val staging = tmpDir("fps-stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dataName = "part-00000-policy.snappy.parquet"
    Files.copy(part.toPath, java.nio.file.Paths.get(root, dataName)): Unit
    val meta = s"""{"metaData":{"id":"policy-1","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${jmapper.writeValueAsString(schema.json)},""" +
      s""""partitionColumns":[],"configuration":$config,"createdTime":1}}"""
    val add = s"""{"add":{"path":"$dataName","partitionValues":{},""" +
      s""""size":${new File(root, dataName).length()},"modificationTime":1,"dataChange":true}}"""
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log",
      "00000000000000000000.json"),
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta, add)
        .mkString("\n").getBytes("UTF-8")): Unit
  }

  private def rowsOf(root: String): Seq[Row] =
    DeltaTable.read(spark, root).orderBy("id").collect().toSeq

  test("CHECK constraints enforce in the write plan; violations abort untouched") {
    val root = tmpDir("fps-check")
    policyTable(root, Seq((1L, 10)).toDF("id", "qty"),
      StructType(Seq(StructField("id", LongType), StructField("qty", IntegerType))),
      config = """{"delta.constraints.qty_pos":"qty > 0"}""")
    val t = new ForeignDeltaTable(spark, root)
    // valid batch commits
    assert(t.append(Seq((2L, 5)).toDF("id", "qty")) == 1L)
    // violating batch fails LOUDLY, names the constraint, table untouched
    val e = intercept[Exception](t.append(Seq((3L, -1)).toDF("id", "qty")))
    assert(e.getMessage.contains("qty_pos") ||
      Option(e.getCause).exists(_.getMessage.contains("qty_pos")))
    assert(DeltaTable.snapshot(spark, root).version == 1L)
    assert(rowsOf(root).map(_.getLong(0)) == Seq(1L, 2L))
    // NULL constraint result is a violation too (the delta-spark contract)
    val e2 = intercept[Exception](t.append(
      spark.createDataFrame(
        java.util.Arrays.asList(Row(4L, null)),
        StructType(Seq(StructField("id", LongType),
          StructField("qty", IntegerType, nullable = true))))))
    assert(e2.getMessage.contains("qty_pos") ||
      Option(e2.getCause).exists(_.getMessage.contains("qty_pos")))
    // UPDATE SET that lands on a violation aborts as well
    assert(t.updateWhere(col("id") === 2L, Map("qty" -> lit(7)),
      allowProtocolUpgrade = true) == 2L)
    intercept[Exception](t.updateWhere(col("id") === 2L,
      Map("qty" -> lit(-9)), allowProtocolUpgrade = true))
    assert(DeltaTable.read(spark, root).filter(col("qty") < 0).count() == 0)
  }

  test("legacy column invariants and NOT NULL fields enforce") {
    val root = tmpDir("fps-inv")
    val invMeta = new MetadataBuilder().putString("delta.invariants",
      """{"expression":{"expression":"score < 100"}}""").build()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", IntegerType, nullable = true, invMeta)))
    policyTable(root, Seq((1L, 50)).toDF("id", "score"), schema)
    val t = new ForeignDeltaTable(spark, root)
    assert(t.append(Seq((2L, 99)).toDF("id", "score")) == 1L)
    // invariant violation
    val e = intercept[Exception](t.append(Seq((3L, 100)).toDF("id", "score")))
    assert(e.getMessage.contains("invariant") ||
      Option(e.getCause).exists(_.getMessage.contains("invariant")))
    // NOT NULL violation: a batch MISSING the non-nullable column
    // null-fills it in align — caught in-plan, not silently written
    val e2 = intercept[Exception](t.append(Seq(77).toDF("score")))
    assert(e2.getMessage.contains("NOT NULL") ||
      Option(e2.getCause).exists(_.getMessage.contains("NOT NULL")))
    // the declared nullability SURVIVES appends (no silent relaxation)
    assert(!DeltaTable.snapshot(spark, root).schema.fields
      .find(_.name == "id").get.nullable)
    assert(rowsOf(root).map(_.getLong(0)) == Seq(1L, 2L))
  }

  test("generated columns: computed when absent, equality-enforced when provided") {
    val root = tmpDir("fps-gen")
    val genMeta = new MetadataBuilder().putString(
      "delta.generationExpression", "id * 2").build()
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("twice", LongType, nullable = true, genMeta)))
    policyTable(root, Seq((1L, 2L)).toDF("id", "twice"), schema)
    val t = new ForeignDeltaTable(spark, root)
    // absent → computed from the generation expression
    assert(t.append(Seq(5L).toDF("id")) == 1L)
    assert(rowsOf(root).map(r => (r.getLong(0), r.getLong(1))) ==
      Seq((1L, 2L), (5L, 10L)))
    // provided and consistent → accepted
    assert(t.append(Seq((6L, 12L)).toDF("id", "twice")) == 2L)
    // provided and INCONSISTENT → violation
    val e = intercept[Exception](t.append(Seq((7L, 99L)).toDF("id", "twice")))
    assert(e.getMessage.contains("generated") ||
      Option(e.getCause).exists(_.getMessage.contains("generated")))
    // UPDATE of a dependency recomputes the generated column
    assert(t.updateWhere(col("id") === 5L, Map("id" -> lit(50L)),
      allowProtocolUpgrade = true) == 3L)
    assert(DeltaTable.read(spark, root).filter(col("id") === 50L)
      .head().getLong(1) == 100L)
    // SET directly on a generated column refuses
    val e2 = intercept[UnsupportedOperationException](
      t.updateWhere(col("id") === 6L, Map("twice" -> lit(0L))))
    assert(e2.getMessage.contains("generated"))
    // generation metadata survives the drift-merge of an append
    assert(DeltaTable.snapshot(spark, root).schema.fields
      .find(_.name == "twice").get.metadata.contains("delta.generationExpression"))
  }

  test("identity GENERATED ALWAYS: lattice assignment, hwm rides metaData") {
    val root = tmpDir("fps-ident")
    val idMeta = new MetadataBuilder()
      .putLong("delta.identity.start", 100L)
      .putLong("delta.identity.step", 10L)
      .putBoolean("delta.identity.allowExplicitInsert", false).build()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true, idMeta),
      StructField("v", StringType)))
    policyTable(root, Seq((100L, "seed")).toDF("id", "v"), schema)
    val t = new ForeignDeltaTable(spark, root)
    // explicit values into GENERATED ALWAYS refuse
    val e = intercept[UnsupportedOperationException](
      t.append(Seq((5L, "x")).toDF("id", "v")))
    assert(e.getMessage.contains("GENERATED ALWAYS"))
    // assignment: values land on the 100+10k lattice, unique, past the
    // (absent) high-water mark — and the commit advances the mark
    assert(t.append(Seq("a", "b", "c").toDF("v")) == 1L)
    val ids1 = DeltaTable.read(spark, root).filter(col("v") =!= "seed")
      .select("id").as[Long].collect().toSeq
    assert(ids1.size == 3 && ids1.distinct.size == 3)
    assert(ids1.forall(i => i >= 100L && (i - 100L) % 10L == 0L))
    val hwm1 = DeltaTable.snapshot(spark, root).schema.fields
      .find(_.name == "id").get.metadata.getLong("delta.identity.highWaterMark")
    assert(hwm1 == ids1.max)
    // the SECOND batch allocates strictly past the recorded mark
    assert(t.append(Seq("d", "e").toDF("v")) == 2L)
    val ids2 = DeltaTable.read(spark, root)
      .filter(col("v").isin("d", "e")).select("id").as[Long].collect().toSeq
    assert(ids2.forall(_ > hwm1))
    assert(ids2.forall(i => (i - 100L) % 10L == 0L))
    assert((ids1 ++ ids2).distinct.size == 5)
  }

  test("identity BY DEFAULT: explicit values accepted, off-lattice mark handled") {
    val root = tmpDir("fps-identd")
    val idMeta = new MetadataBuilder()
      .putLong("delta.identity.start", 1L)
      .putLong("delta.identity.step", 2L)
      .putBoolean("delta.identity.allowExplicitInsert", true).build()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true, idMeta),
      StructField("v", StringType)))
    policyTable(root, Seq((1L, "seed")).toDF("id", "v"), schema)
    val t = new ForeignDeltaTable(spark, root)
    // explicit OFF-LATTICE insert accepted; mark advances to it
    assert(t.append(Seq((8L, "x")).toDF("id", "v")) == 1L)
    val hwm = DeltaTable.snapshot(spark, root).schema.fields
      .find(_.name == "id").get.metadata.getLong("delta.identity.highWaterMark")
    assert(hwm == 8L)
    // next ASSIGNED values return to the lattice strictly past the mark
    assert(t.append(Seq("y", "z").toDF("v")) == 2L)
    val assigned = DeltaTable.read(spark, root).filter(col("v").isin("y", "z"))
      .select("id").as[Long].collect().toSeq
    assert(assigned.forall(i => i > 8L && (i - 1L) % 2L == 0L))
    // MERGE with explicit identity values advances the mark too
    val big = assigned.max + 100L
    assert(big % 2L == 1L || true) // value choice free under BY DEFAULT
    t.merge(Seq((big, "m")).toDF("id", "v"), Seq("id"),
      allowProtocolUpgrade = true)
    val hwm2 = DeltaTable.snapshot(spark, root).schema.fields
      .find(_.name == "id").get.metadata.getLong("delta.identity.highWaterMark")
    assert(hwm2 == big)
    // MERGE without the identity column refuses (matched rows must keep ids)
    val e = intercept[UnsupportedOperationException](
      t.merge(Seq("q").toDF("v"), Seq("v")))
    assert(e.getMessage.contains("identity"))
  }

  test("NOT NULL enforces on nested struct/array/map positions") {
    val root = tmpDir("fps-nnn")
    // s: nullable struct with a NON-nullable inner field; xs: array of
    // structs with a non-nullable field; m: map with non-nullable values
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StructType(Seq(
        StructField("a", IntegerType, nullable = false),
        StructField("b", StringType))), nullable = true),
      StructField("xs", ArrayType(StructType(Seq(
        StructField("q", IntegerType, nullable = false)))), nullable = true),
      StructField("m", MapType(StringType, IntegerType,
        valueContainsNull = false), nullable = true)))
    def mk(id: Long, a: java.lang.Integer, withNullElem: Boolean,
        withNullVal: Boolean): DataFrame = {
      import org.apache.spark.sql.Row
      val xs = if (withNullElem) Seq(Row(null.asInstanceOf[Any])) else Seq(Row(1))
      val m = if (withNullVal) Map("k" -> null.asInstanceOf[Integer])
        else Map("k" -> Integer.valueOf(2))
      spark.createDataFrame(
        java.util.Arrays.asList(Row(id, Row(a, "x"), xs, m)),
        StructType(schema.fields.map(f => f.copy(nullable = true))
          .map {
            case f if f.name == "s" => f.copy(dataType = StructType(Seq(
              StructField("a", IntegerType, nullable = true),
              StructField("b", StringType))))
            case f if f.name == "xs" => f.copy(dataType = ArrayType(StructType(Seq(
              StructField("q", IntegerType, nullable = true)))))
            case f if f.name == "m" => f.copy(dataType =
              MapType(StringType, IntegerType, valueContainsNull = true))
            case f => f
          }))
    }
    policyTable(root, mk(1L, 1, withNullElem = false, withNullVal = false), schema)
    val t = new ForeignDeltaTable(spark, root)
    // valid nested values commit
    assert(t.append(mk(2L, 5, withNullElem = false, withNullVal = false)) == 1L)
    // null in the non-nullable struct field fails LOUDLY
    val e1 = intercept[Exception](
      t.append(mk(3L, null, withNullElem = false, withNullVal = false)))
    assert(e1.getMessage.contains("NOT NULL") ||
      Option(e1.getCause).exists(_.getMessage.contains("NOT NULL")))
    // null array element's non-nullable field fails
    intercept[Exception](
      t.append(mk(4L, 5, withNullElem = true, withNullVal = false)))
    // null map value where valueContainsNull=false fails
    intercept[Exception](
      t.append(mk(5L, 5, withNullElem = false, withNullVal = true)))
    // a NULL struct PARENT is fine — the parent itself is nullable
    import org.apache.spark.sql.Row
    val nullParent = spark.createDataFrame(
      java.util.Arrays.asList(Row(6L, null, null, null)),
      StructType(schema.fields.map(_.copy(nullable = true))))
    assert(t.append(nullParent) == 2L)
    assert(DeltaTable.read(spark, root).count() == 3)
  }

  test("identity GENERATED ALWAYS under MERGE: matched keep ids, unmatched assigned") {
    val root = tmpDir("fps-identm")
    val idMeta = new MetadataBuilder()
      .putLong("delta.identity.start", 100L)
      .putLong("delta.identity.step", 10L)
      .putBoolean("delta.identity.allowExplicitInsert", false).build()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true, idMeta),
      StructField("k", StringType), StructField("v", StringType)))
    policyTable(root, Seq((100L, "a", "old")).toDF("id", "k", "v"), schema)
    val t = new ForeignDeltaTable(spark, root)
    // explicit identity values through MERGE refuse — forged ids
    val e = intercept[UnsupportedOperationException](
      t.merge(Seq((999L, "a", "forged")).toDF("id", "k", "v"), Seq("k"),
        allowProtocolUpgrade = true))
    assert(e.getMessage.contains("GENERATED ALWAYS"))
    // merge WITHOUT the column: matched row "a" keeps id=100, unmatched
    // "b"/"c" get fresh lattice values past the mark; mark advances
    t.merge(Seq(("a", "new"), ("b", "ins"), ("c", "ins")).toDF("k", "v"),
      Seq("k"), allowProtocolUpgrade = true)
    val out = DeltaTable.read(spark, root)
      .select("id", "k", "v").as[(Long, String, String)].collect().toSeq
    assert(out.size == 3)
    val byK = out.map(r => r._2 -> r).toMap
    assert(byK("a")._1 == 100L && byK("a")._3 == "new")
    val fresh = Seq(byK("b")._1, byK("c")._1)
    assert(fresh.forall(i => i > 100L && (i - 100L) % 10L == 0L))
    assert(fresh.distinct.size == 2)
    val hwm = DeltaTable.snapshot(spark, root).schema.fields
      .find(_.name == "id").get.metadata.getLong("delta.identity.highWaterMark")
    assert(hwm == fresh.max)
    // a second merge keeps allocating strictly past the advanced mark
    t.merge(Seq(("d", "ins")).toDF("k", "v"), Seq("k"))
    val idD = DeltaTable.read(spark, root).filter(col("k") === "d")
      .select("id").as[Long].head()
    assert(idD > hwm && (idD - 100L) % 10L == 0L)
  }

  test("identity hwm advances even when data-skipping stats exclude the column") {
    // delta.dataSkippingStatsColumns lists only v — the identity column is
    // FORCED into the written-files stats pass regardless, so the mark
    // still advances (a lost mark would silently reassign duplicate ids)
    val root = tmpDir("fps-identskip")
    val idMeta = new MetadataBuilder()
      .putLong("delta.identity.start", 1L)
      .putLong("delta.identity.step", 1L)
      .putLong("delta.identity.highWaterMark", 1L) // covers the seed row
      .putBoolean("delta.identity.allowExplicitInsert", false).build()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true, idMeta),
      StructField("v", StringType)))
    policyTable(root, Seq((1L, "seed")).toDF("id", "v"), schema,
      config = """{"delta.dataSkippingStatsColumns":"v"}""")
    val t = new ForeignDeltaTable(spark, root)
    assert(t.append(Seq("a", "b").toDF("v")) == 1L)
    val hwm = DeltaTable.snapshot(spark, root).schema.fields
      .find(_.name == "id").get.metadata.getLong("delta.identity.highWaterMark")
    val ids1 = DeltaTable.read(spark, root).filter(col("v") =!= "seed")
      .select("id").as[Long].collect().toSeq
    assert(hwm == ids1.max)
    // second batch strictly past the mark — no duplicate assignment
    assert(t.append(Seq("c").toDF("v")) == 2L)
    val all = DeltaTable.read(spark, root).select("id").as[Long].collect().toSeq
    assert(all.distinct.size == all.size)
    // and numIndexedCols=0 (stats effectively off) — same guarantee
    val root2 = tmpDir("fps-identskip0")
    policyTable(root2, Seq((1L, "seed")).toDF("id", "v"), schema,
      config = """{"delta.dataSkippingNumIndexedCols":"0"}""")
    val t2 = new ForeignDeltaTable(spark, root2)
    assert(t2.append(Seq("a", "b").toDF("v")) == 1L)
    assert(t2.append(Seq("c").toDF("v")) == 2L)
    val all2 = DeltaTable.read(spark, root2).select("id").as[Long].collect().toSeq
    assert(all2.distinct.size == all2.size)
  }

  test("identity as PARTITION column: hwm recovered from partition values") {
    // partition columns never appear in file stats — the mark is recovered
    // from the hive partition dir values instead
    val root = tmpDir("fps-identpart")
    val idMeta = new MetadataBuilder()
      .putLong("delta.identity.start", 7L)
      .putLong("delta.identity.step", 3L)
      .putBoolean("delta.identity.allowExplicitInsert", false).build()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true, idMeta),
      StructField("v", StringType)))
    // hand-craft v0 with id as a partition column and no seed data
    val meta = s"""{"metaData":{"id":"policy-p","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${jmapper.writeValueAsString(schema.json)},""" +
      s""""partitionColumns":["id"],"configuration":{},"createdTime":1}}"""
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log",
      "00000000000000000000.json"),
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta)
        .mkString("\n").getBytes("UTF-8")): Unit
    val t = new ForeignDeltaTable(spark, root)
    assert(t.append(Seq("a", "b").toDF("v")) == 1L)
    val ids1 = DeltaTable.read(spark, root).select("id").as[Long].collect().toSeq
    assert(ids1.size == 2 && ids1.forall(i => i >= 7L && (i - 7L) % 3L == 0L))
    val hwm = DeltaTable.snapshot(spark, root).schema.fields
      .find(_.name == "id").get.metadata.getLong("delta.identity.highWaterMark")
    assert(hwm == ids1.max)
    assert(t.append(Seq("c").toDF("v")) == 2L)
    val all = DeltaTable.read(spark, root).select("id").as[Long].collect().toSeq
    assert(all.distinct.size == 3 && all.max > hwm)
  }

  test("merge enforces constraints on source rows") {
    val root = tmpDir("fps-mc")
    policyTable(root, Seq((1L, 10)).toDF("id", "qty"),
      StructType(Seq(StructField("id", LongType), StructField("qty", IntegerType))),
      config = """{"delta.constraints.qty_pos":"qty > 0"}""")
    val t = new ForeignDeltaTable(spark, root)
    intercept[Exception](t.merge(Seq((1L, -5)).toDF("id", "qty"), Seq("id"),
      allowProtocolUpgrade = true))
    assert(DeltaTable.read(spark, root).filter(col("qty") < 0).count() == 0)
    assert(t.merge(Seq((1L, 20)).toDF("id", "qty"), Seq("id"),
      allowProtocolUpgrade = true) > 0L)
    assert(DeltaTable.read(spark, root).head().getInt(1) == 20)
  }

  test("checkConstraints/generatedColumns/identityColumns writer features accepted") {
    // a protocol-7 table LISTING the features is writable now that the
    // writer honors them (they were refusals before round 11)
    val root = tmpDir("fps-feat")
    policyTable(root, Seq((1L, 10)).toDF("id", "qty"),
      StructType(Seq(StructField("id", LongType), StructField("qty", IntegerType))),
      config = """{"delta.constraints.qty_pos":"qty > 0"}""")
    // rewrite v0's protocol to list the features explicitly
    val p0 = java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json")
    val body = new String(Files.readAllBytes(p0), "UTF-8").replace(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["checkConstraints","generatedColumns","identityColumns"]}}""")
    Files.write(p0, body.getBytes("UTF-8")): Unit
    val t = new ForeignDeltaTable(spark, root)
    assert(t.append(Seq((2L, 5)).toDF("id", "qty")) == 1L)
    intercept[Exception](t.append(Seq((3L, -1)).toDF("id", "qty")))
  }
}
