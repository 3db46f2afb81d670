package graft

import graft.store.VersionedTable

/** The graft_table / graft_changes / graft_history table-valued functions:
  * SQL-only access to the versioned store, planning the same
  * GraftFileIndex-backed scan as the Scala API (a WHERE on the TVF must
  * prune dirs at planning time like any other filtered read). */
class TvfSpec extends SparkSuite {
  import spark.implicits._

  test("store TVFs: snapshot, versionAsOf, changes, history, pruned WHERE") {
    GraftExtensions.register(spark)
    val root = tmpDir("tvf")
    val t = new VersionedTable(spark, root)
    (0 until 3).foreach { k =>
      t.append((k * 10 until (k + 1) * 10).map(i => (i.toLong, s"s$i")).toDF("id", "s"))
    }
    assert(spark.sql(s"SELECT * FROM graft_table('$root')").count() == 30)
    assert(spark.sql(s"SELECT * FROM graft_table('$root', 0)").count() == 10)
    assert(spark.sql(
      s"SELECT * FROM graft_changes('$root', 1, 2)").count() == 20)
    val h = spark.sql(s"SELECT version, operation FROM graft_history('$root')")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(h.toSeq == Seq((2L, "append"), (1L, "append"), (0L, "append")))
    // a WHERE through the TVF reaches the file index as a pushed filter
    val df = spark.sql(s"SELECT * FROM graft_table('$root') WHERE id = 15")
    assert(df.count() == 1)
    val idx = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.relation.location
    }.collectFirst { case g: org.apache.spark.sql.graft.GraftFileIndex => g }
    assert(idx.flatMap(_.lastPruning).contains((1, 3)), s"got ${idx.flatMap(_.lastPruning)}")
    // deletion vectors apply through the SQL surface too: the TVF plans the
    // same scanDirs read, so DV'd rows are gone without any file rewrite
    t.delete(org.apache.spark.sql.functions.col("id") < 5)
    assert(spark.sql(s"SELECT * FROM graft_table('$root')").count() == 25)
    assert(spark.sql(
      s"SELECT * FROM graft_table('$root') WHERE id < 5").count() == 0)
    // time travel through the TVF still shows the pre-delete snapshot
    assert(spark.sql(s"SELECT * FROM graft_table('$root', 2)").count() == 30)
  }

  test("graft_change_feed TVF surfaces _change_type provenance through SQL") {
    GraftExtensions.register(spark)
    val root = tmpDir("tvf-feed")
    val t = new VersionedTable(spark, root)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s")) // v0
    t.setProperties(Map(VersionedTable.CdfProp -> "true")) // v1
    t.merge(Seq((2L, "B"), (3L, "c")).toDF("id", "s"), Seq("id")) // v2
    val got = spark.sql(
      s"""SELECT id, s, ${VersionedTable.ChangeTypeCol}
         FROM graft_change_feed('$root', 2, 2) ORDER BY id, s""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(
      (2L, "B", "update_postimage"), (2L, "b", "update_preimage"),
      (3L, "c", "insert")))
  }

  test("delta_table / delta_changes TVFs: the foreign surface through SQL") {
    GraftExtensions.register(spark)
    // a FOREIGN table = a graft-mirrored log with the graft side stripped
    val root = tmpDir("tvf-delta")
    val t = new VersionedTable(spark, root)
    t.append((0L until 10L).map(i => (i, s"s$i")).toDF("id", "s")) // v0
    t.append((10L until 20L).map(i => (i, s"s$i")).toDF("id", "s")) // v1
    t.setProperties(Map(VersionedTable.CdfProp -> "true")) // v2: CDF on
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(s"$root/_graft_log"))
    assert(spark.sql(s"SELECT * FROM delta_table('$root')").count() == 20)
    assert(spark.sql(s"SELECT * FROM delta_table('$root', 0)").count() == 10)
    // a foreign DV delete's cdc actions read back exactly through SQL
    new graft.store.ForeignDeltaTable(spark, root)
      .deleteWhere(org.apache.spark.sql.functions.col("id") < 3,
        allowProtocolUpgrade = true) // v3
    assert(spark.sql(s"SELECT * FROM delta_table('$root')").count() == 17)
    val ch = spark.sql(
      s"SELECT id, `_change_type` FROM delta_changes('$root', 1, 3)")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ch == ((10L until 20L).map(i => (i, "insert")).toSet ++
      (0L until 3L).map(i => (i, "delete")).toSet))
  }

  test("delta_row_ids TVF: row identity through SQL on a row-tracked table") {
    GraftExtensions.register(spark)
    val root = tmpDir("tvf-rowids")
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val schemaJ = mapper.writeValueAsString(
      Seq((1L, "a")).toDF("id", "s").schema.json)
    new java.io.File(s"$root/_delta_log").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_delta_log", "00000000000000000000.json"),
      Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
          """"writerFeatures":["rowTracking","domainMetadata"]}}""",
        s"""{"metaData":{"id":"tvf-rt","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":$schemaJ,"partitionColumns":[],""" +
          s""""configuration":{"delta.enableRowTracking":"true"},"createdTime":1}}""")
        .mkString("\n").getBytes("UTF-8")): Unit
    val t = new graft.store.ForeignDeltaTable(spark, root)
    t.append((0L until 5L).map(i => (i, s"s$i")).toDF("id", "s")
      .repartition(1).sortWithinPartitions("id")) // v1: ids 0..4
    val got = spark.sql(
      s"SELECT id, `_row_id`, `_row_commit_version` FROM delta_row_ids('$root')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == (0L until 5L).map(i => (i, i, 1L)).toSet)
    // plain delta_table stays id-free
    assert(!spark.sql(s"SELECT * FROM delta_table('$root')")
      .columns.contains("_row_id"))
  }
}
