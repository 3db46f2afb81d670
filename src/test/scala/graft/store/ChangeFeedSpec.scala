package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Row-level change feed (`readChangeFeed`) — Delta-CDF-like `_change_type`
  * provenance: appends surface as inserts, a CDF-enabled merge surfaces its
  * updates as update_preimage/update_postimage pairs and its new keys as
  * inserts, content-neutral commits emit nothing, and vacuum reclaims
  * change-data dirs with their commits. */
class ChangeFeedSpec extends SparkSuite {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("id", "name", "bal")

  test("merge with CDF enabled emits update pre/post pairs and inserts") {
    val t = new VersionedTable(spark, tmpDir("cdf-merge"))
    t.append(base) // v0
    t.setProperties(Map(VersionedTable.CdfProp -> "true")) // v1
    // update ids 2,3 (bal += 5), insert id 9
    val src = Seq((2L, "b", 25.0), (3L, "c", 35.0), (9L, "z", 90.0))
      .toDF("id", "name", "bal")
    val v = t.merge(src, Seq("id")) // v2
    assert(v == 2L)

    val feed = t.readChangeFeed(2L, 2L)
      .select("id", "bal", VersionedTable.ChangeTypeCol)
    val got = rowsOf(feed).map { case Seq(id, bal, ct) => (id, bal, ct) }.toSet
    assert(got == Set(
      (2L, 20.0, "update_preimage"), (2L, 25.0, "update_postimage"),
      (3L, 30.0, "update_preimage"), (3L, 35.0, "update_postimage"),
      (9L, 90.0, "insert")))
    // versions and commit timestamps ride every row
    val meta = t.readChangeFeed(2L, 2L)
      .select(VersionedTable.VersionCol, VersionedTable.CommitTsCol)
    assert(rowsOf(meta).forall { case Seq(v2, ts) => v2 == 2L && ts != null })
  }

  test("append commits surface as inserts; neutral commits emit nothing") {
    val t = new VersionedTable(spark, tmpDir("cdf-append"))
    t.append(base) // v0
    t.setProperties(Map(VersionedTable.CdfProp -> "true")) // v1 (neutral)
    t.append(Seq((5L, "e", 50.0)).toDF("id", "name", "bal")) // v2

    val all = t.readChangeFeed(0L, 2L)
    val byVersion = rowsOf(all.groupBy(VersionedTable.VersionCol).count()
      .orderBy(VersionedTable.VersionCol))
      .map { case Seq(v, n) => (v, n) }
    assert(byVersion == Seq((0L, 4L), (2L, 1L))) // v1 absent
    assert(rowsOf(all.select(VersionedTable.ChangeTypeCol).distinct()) ==
      Seq(Seq("insert")))
  }

  test("merge WITHOUT the property falls back to added-dir inserts") {
    val t = new VersionedTable(spark, tmpDir("cdf-off"))
    t.append(base) // v0
    t.merge(Seq((2L, "b", 25.0)).toDF("id", "name", "bal"), Seq("id")) // v1
    val feed = t.readChangeFeed(1L, 1L)
    // the rewritten dir: kept rows 1,3,4 + upsert 2 — all tagged insert
    assert(feed.count() == 4L)
    assert(rowsOf(feed.select(VersionedTable.ChangeTypeCol).distinct()) ==
      Seq(Seq("insert")))
  }

  test("feed equals readChanges for append-only histories (plus tags)") {
    val t = new VersionedTable(spark, tmpDir("cdf-appendonly"))
    t.append(base)
    t.append(Seq((6L, "f", 60.0), (7L, "g", 70.0)).toDF("id", "name", "bal"))
    val feed = t.readChangeFeed(0L, 1L)
      .drop(VersionedTable.ChangeTypeCol, VersionedTable.CommitTsCol)
    val changes = t.readChanges(0L, 1L)
    assert(rowsOf(feed.orderBy("id")) == rowsOf(changes.orderBy("id")))
  }

  test("vacuum reclaims change-data dirs of dropped commits") {
    val dir = tmpDir("cdf-vacuum")
    val t = new VersionedTable(spark, dir)
    t.append(base) // v0
    t.setProperties(Map(VersionedTable.CdfProp -> "true")) // v1
    t.merge(Seq((2L, "b", 25.0)).toDF("id", "name", "bal"), Seq("id")) // v2
    t.append(Seq((8L, "h", 80.0)).toDF("id", "name", "bal")) // v3
    t.merge(Seq((8L, "h", 85.0)).toDF("id", "name", "bal"), Seq("id")) // v4
    def changeDirs = Option(new java.io.File(s"$dir/_change_data").list())
      .map(_.toSet).getOrElse(Set.empty[String])
    assert(changeDirs.size == 2)
    t.vacuum(keepVersions = 2) // keeps v3, v4 → only v4's change dir survives
    assert(changeDirs.size == 1)
    assert(rowsOf(t.readChangeFeed(4L, 4L).select(VersionedTable.ChangeTypeCol)
      .distinct()).flatten.toSet == Set("update_preimage", "update_postimage"))
  }

  test("restore and optimize commits carry no stale change dir") {
    val t = new VersionedTable(spark, tmpDir("cdf-restore"))
    t.append(base) // v0
    t.setProperties(Map(VersionedTable.CdfProp -> "true")) // v1
    t.merge(Seq((2L, "b", 25.0)).toDF("id", "name", "bal"), Seq("id")) // v2
    // v3 restores the MERGE version: its manifest copy must drop v2's
    // changeDir or the feed would re-surface v2's changes under v3
    t.restore(2L)
    t.optimize(clusterBy = Seq("id")) // v4
    assert(t.readChangeFeed(3L, 4L).count() == 0L)
  }
}
