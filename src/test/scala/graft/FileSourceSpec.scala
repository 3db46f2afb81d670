package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.FileSource

/** SCD2 ingestion from non-parquet file formats: CSV and JSON drops feed
  * the same engine (the reference reads ODBC only — file-drop sources are
  * a graft extension sharing the Source seam). */
class FileSourceSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("ver", LongType, nullable = false)))

  test("full + delta SCD2 sync from a CSV drop") {
    val dir = tmpDir("graft-csv-src")
    val dest = tmpDir("graft-csv-dest")
    def writeCsv(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(dir, name),
        ("id,name,ver" +: rows).mkString("\n").getBytes,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)

    writeCsv("a.csv", Seq("1,alpha,1", "2,beta,1", "3,gamma,1"))
    val src = new FileSource(dir, "csv",
      options = Map("header" -> "true"), schema = Some(schema), pks = Seq("id"))
    val cfg = WriteConfig(deltaCol = Some("ver"))
    assert(Graft.sync(spark, src, dest, cfg) == LoadResult.FullLoad(3))
    assert(Graft.sync(spark, src, dest, cfg) == LoadResult.NoLoad)

    // the next drop updates 2, inserts 4, deletes 3
    writeCsv("a.csv", Seq("1,alpha,1", "2,beta2,2", "4,delta,2"))
    Graft.sync(spark, src, dest, cfg) match {
      case LoadResult.DeltaLoad(ins, strange, del, dirty) =>
        assert(ins == 2 && strange == 0 && del == 1 && !dirty)
      case other => fail(s"expected DeltaLoad, got $other")
    }
    val cur = Graft.writer(spark, src, dest, cfg).currentState()
    assert(cur.count() == 3)
    assert(cur.filter(col("id") === 2).head().getAs[String]("name") == "beta2")
    assert(cur.filter(col("id") === 3).isEmpty)
  }

  test("full + delta SCD2 sync from a JSON-lines drop") {
    val dir = tmpDir("graft-json-src")
    val dest = tmpDir("graft-json-dest")
    def writeJson(name: String, rows: Seq[String]): Unit =
      Files.write(Paths.get(dir, name), rows.mkString("\n").getBytes,
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)

    writeJson("a.json", Seq(
      """{"id": 1, "name": "alpha", "ver": 1}""",
      """{"id": 2, "name": "beta", "ver": 1}"""))
    val src = new FileSource(dir, "json", schema = Some(schema), pks = Seq("id"))
    val cfg = WriteConfig(deltaCol = Some("ver"))
    assert(Graft.sync(spark, src, dest, cfg) == LoadResult.FullLoad(2))

    writeJson("a.json", Seq(
      """{"id": 1, "name": "alpha", "ver": 1}""",
      """{"id": 2, "name": "beta9", "ver": 2}"""))
    Graft.sync(spark, src, dest, cfg) match {
      case LoadResult.DeltaLoad(ins, _, del, _) => assert(ins == 1 && del == 0)
      case other => fail(s"expected DeltaLoad, got $other")
    }
    val cur = Graft.writer(spark, src, dest, cfg).currentState()
    assert(cur.filter(col("id") === 2).head().getAs[String]("name") == "beta9")
  }
}
