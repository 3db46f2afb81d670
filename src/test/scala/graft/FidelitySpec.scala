package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.scd2.Projection
import graft.sources.ParquetSource

/** Reference-fidelity specs for the projection layer and staged hooks:
  * uuid/oid/xid trim exemption (db_to_delta.py:80-88), the Postgres
  * xid→text→bigint double-cast (db_to_delta.py:73-77), xmin delta-col
  * auto-detect (write_init.py:222-251), ingest value caps
  * (odbc_reader.py:235,273-275), and the two-arg transformation hook
  * (spark_reader.py:97,111-113). */
class FidelitySpec extends SparkSuite {
  import spark.implicits._

  test("uuid-typed strings are exempt from TRIM; plain strings are trimmed") {
    val df = Seq(("  pad-me  ", "  pad-me  ")).toDF("u", "s")
    val out = df.select(
      Projection.sourceConvert(
        ColInfo("u", StringType, sourceType = Some("uniqueidentifier")), WriteConfig()),
      Projection.sourceConvert(ColInfo("s", StringType), WriteConfig())).head()
    assert(out.getString(0) == "  pad-me  ") // untouched
    assert(out.getString(1) == "pad-me")     // trimmed
  }

  test("xid source type double-casts to bigint and reports a bigint target type") {
    val c = ColInfo("xmin", StringType, sourceType = Some("xid"))
    assert(Projection.targetType(c, WriteConfig()) == LongType)
    val out = Seq(("123", "123")).toDF("xmin", "other")
      .select(Projection.sourceConvert(c, WriteConfig())).head()
    assert(out.getLong(0) == 123L)
    // an explicit mapping for xid wins over the double-cast default
    val cfgMapped = WriteConfig(dataTypeMap = Map("xid" -> StringType))
    assert(Projection.targetType(c, cfgMapped) == StringType)
  }

  test("xid column is auto-detected as the delta column (xmin semantics)") {
    val srcPath = tmpDir("graft-xid-src")
    Seq((1L, "a", "100"), (2L, "b", "101")).toDF("id", "v", "xmin")
      .write.mode("overwrite").parquet(srcPath)
    val inner = new ParquetSource(srcPath, pks = Seq("id"))
    val source = new graft.sources.Source {
      def read(s: org.apache.spark.sql.SparkSession) = inner.read(s)
      def primaryKeys(s: org.apache.spark.sql.SparkSession) = inner.primaryKeys(s)
      def columns(s: org.apache.spark.sql.SparkSession): Seq[ColInfo] =
        inner.columns(s).map(c =>
          if (c.name == "xmin") c.copy(sourceType = Some("xid")) else c)
    }
    val sync = Graft.writer(spark, source, tmpDir("graft-xid-dest"), WriteConfig())
    assert(sync.deltaCol.map(_.name).contains("xmin"))
    assert(sync.execute() == LoadResult.FullLoad(2))
    assert(sync.dest.delta.read().schema("xmin").dataType == LongType)
  }

  test("ROW START column is auto-detected as the delta column (temporal tables)") {
    // the reference's system-versioned fixture class (init_mssql.sql
    // company/company3, write_init.py:155 AS_ROW_START): no rowversion →
    // the generated-always row-start timestamp IS the delta source
    val srcPath = tmpDir("graft-rowstart-src")
    Seq((1L, "a", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
        (2L, "b", java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
      .toDF("id", "v", "SysStartTime")
      .write.mode("overwrite").parquet(srcPath)
    val inner = new ParquetSource(srcPath, pks = Seq("id"))
    val source = new graft.sources.Source {
      def read(s: org.apache.spark.sql.SparkSession) = inner.read(s)
      def primaryKeys(s: org.apache.spark.sql.SparkSession) = inner.primaryKeys(s)
      def columns(s: org.apache.spark.sql.SparkSession): Seq[ColInfo] =
        inner.columns(s).map(c =>
          if (c.name == "SysStartTime")
            c.copy(sourceType = Some("datetime2"), isRowStart = true)
          else c)
    }
    val sync = Graft.writer(spark, source, tmpDir("graft-rowstart-dest"), WriteConfig())
    assert(sync.deltaCol.map(_.name).contains("SysStartTime"))
    assert(sync.execute() == LoadResult.FullLoad(2))
  }

  test("xml source values are never trimmed (not a string type at the source)") {
    val c = ColInfo("dt", org.apache.spark.sql.types.StringType,
      sourceType = Some("xml"))
    val df = Seq("  <root>x</root>  ").toDF("dt")
    val out = df.select(graft.scd2.Projection.sourceConvert(c, WriteConfig()))
      .collect().head.getString(0)
    assert(out == "  <root>x</root>  ")
  }

  test("maxTextSize / maxBinarySize cap values after trim") {
    val cfg = WriteConfig(maxTextSize = Some(4), maxBinarySize = Some(3))
    val df = Seq(("  abcdefgh  ", Array[Byte](1, 2, 3, 4, 5))).toDF("t", "b")
    val out = df.select(
      Projection.sourceConvert(ColInfo("t", StringType), cfg),
      Projection.sourceConvert(ColInfo("b", BinaryType), cfg)).head()
    assert(out.getString(0) == "abcd")
    assert(out.getAs[Array[Byte]](1).toSeq == Seq[Byte](1, 2, 3))
  }

  test("two-arg hook: per-stage transforms reach loads and the state probe") {
    val srcPath = tmpDir("graft-hook-src")
    val dest = tmpDir("graft-hook-dest")
    Seq((1L, "a", 10L), (2L, "b", 11L), (3L, "drop", 12L))
      .toDF("id", "name", "ver").write.mode("overwrite").parquet(srcPath)
    val stages = scala.collection.mutable.Set.empty[String]
    // the hook filters rows in EVERY stage — change detection must see the
    // same universe the loads ingest, or watermarks silently skip rows
    val cfg = WriteConfig(deltaCol = Some("ver"),
      transformationHook = (df, stage) => {
        stages.synchronized { stages += stage }
        df.filter(col("name") =!= "drop")
      })
    val source = new ParquetSource(srcPath, pks = Seq("id"))
    assert(Graft.sync(spark, source, dest, cfg) == LoadResult.FullLoad(2))
    assert(Graft.sync(spark, source, dest, cfg) == LoadResult.NoLoad)
    assert(stages.contains("sql2delta") && stages.contains("source2py"))
    // delta run: the hook still gates what arrives
    Seq((1L, "a", 10L), (2L, "b", 11L), (3L, "drop", 13L), (4L, "d", 14L))
      .toDF("id", "name", "ver").write.mode("overwrite").parquet(srcPath)
    Graft.sync(spark, source, dest, cfg) match {
      case LoadResult.DeltaLoad(inserts, _, deletes, _) =>
        assert(inserts == 1 && deletes == 0) // id=4 only; id=3 never visible
      case other => fail(s"expected DeltaLoad, got $other")
    }
  }
}
