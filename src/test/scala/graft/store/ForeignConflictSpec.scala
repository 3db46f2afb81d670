package graft.store

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Logical conflict analysis for lost commit races on the foreign Delta
  * writer: a mutation (deleteWhere/updateWhere/merge/optimize) that loses
  * its optimistic commit retries internally against the fresh snapshot
  * when every winning commit is retry-COMPATIBLE — no metaData/protocol
  * action and a removed/re-added file set DISJOINT from the files the
  * loser's attempt touched (its [[ForeignDeltaTable.attemptFootprint]]).
  * Pure appends are always compatible; since r13 two MUTATIONS on
  * disjoint files (e.g. DV deletes in different partitions) both land
  * too — delta-spark's ConflictChecker resolves the same cases. A winner
  * that removed a file the loser touched is a true write-write conflict
  * and still aborts loudly (ConcurrentDeleteDelete). The concurrent
  * writer fires deterministically through the `onBeforeCommit` test
  * seam, exactly between the loser's snapshot resolution and its commit
  * publish. */
class ForeignConflictSpec extends SparkSuite {
  import spark.implicits._

  private def foreignTable(root: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val staging = tmpDir("fcx-stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dataName = "part-00000-seed.snappy.parquet"
    Files.copy(part.toPath, java.nio.file.Paths.get(root, dataName)): Unit
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    val meta = s"""{"metaData":{"id":"conflict-1","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${mapper.writeValueAsString(df.schema.json)},""" +
      s""""partitionColumns":[],"configuration":{},"createdTime":1}}"""
    val add = s"""{"add":{"path":"$dataName","partitionValues":{},""" +
      s""""size":${new File(root, dataName).length()},"modificationTime":1,"dataChange":true}}"""
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log",
      "00000000000000000000.json"),
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", meta, add)
        .mkString("\n").getBytes("UTF-8")): Unit
  }

  /** Arm `t.onBeforeCommit` to run `body` exactly once (the loser's FIRST
    * publish attempt), then disarm — the retry publishes unimpeded. */
  private def interleaveOnce(t: ForeignDeltaTable)(body: => Unit): Unit = {
    var fired = false
    t.onBeforeCommit = () => {
      if (!fired) { fired = true; body }
    }
  }

  test("deleteWhere auto-retries over a concurrent disjoint append") {
    val root = tmpDir("fcx-del")
    foreignTable(root, Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    val loser = new ForeignDeltaTable(spark, root)
    val winner = new ForeignDeltaTable(spark, root)
    // the append lands BETWEEN the delete's snapshot and its publish —
    // and even inserts a row MATCHING the delete predicate
    interleaveOnce(loser) {
      winner.append(Seq((4L, "keep"), (5L, "drop-me")).toDF("id", "v")): Unit
    }
    val committed = loser.deleteWhere(
      col("id") === 2L || col("v") === "drop-me", allowProtocolUpgrade = true)
    // both landed without a manual re-run: v1 = append, v2 = delete
    assert(committed == 2L)
    val rows = DeltaTable.read(spark, root)
      .select("id", "v").as[(Long, String)].collect().toSet
    // the retry ran against the FRESH snapshot: the appended matching row
    // is deleted too (serial append→delete order)
    assert(rows == Set((1L, "a"), (3L, "c"), (4L, "keep")))
  }

  test("updateWhere auto-retries over a concurrent disjoint append") {
    val root = tmpDir("fcx-upd")
    foreignTable(root, Seq((1L, 10), (2L, 20)).toDF("id", "qty"))
    val loser = new ForeignDeltaTable(spark, root)
    val winner = new ForeignDeltaTable(spark, root)
    interleaveOnce(loser) {
      winner.append(Seq((3L, 30)).toDF("id", "qty")): Unit
    }
    val committed = loser.updateWhere(col("qty") >= 20,
      Map("qty" -> (col("qty") + 1)), allowProtocolUpgrade = true)
    assert(committed == 2L)
    val rows = DeltaTable.read(spark, root)
      .select("id", "qty").as[(Long, Int)].collect().toSet
    assert(rows == Set((1L, 10), (2L, 21), (3L, 31)))
  }

  test("merge auto-retries over a concurrent disjoint append") {
    val root = tmpDir("fcx-mrg")
    foreignTable(root, Seq((1L, "old"), (2L, "old")).toDF("id", "v"))
    val loser = new ForeignDeltaTable(spark, root)
    val winner = new ForeignDeltaTable(spark, root)
    interleaveOnce(loser) {
      winner.append(Seq((9L, "appended")).toDF("id", "v")): Unit
    }
    val committed = loser.merge(Seq((1L, "new"), (5L, "ins")).toDF("id", "v"),
      Seq("id"), allowProtocolUpgrade = true)
    assert(committed == 2L)
    val rows = DeltaTable.read(spark, root)
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "new"), (2L, "old"), (5L, "ins"), (9L, "appended")))
  }

  /** Two-file seed table with the deletionVectors feature ALREADY on the
    * protocol (no upgrade line in the racers' commits — a protocol action
    * is never retry-compatible): `dfA`'s rows land in one parquet file,
    * `dfB`'s in another, so predicates selecting rows from only one side
    * touch disjoint file sets. */
  private def foreignTableDvTwoFiles(
      root: String, dfA: org.apache.spark.sql.DataFrame,
      dfB: org.apache.spark.sql.DataFrame): Unit = {
    val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
    def stage(df: org.apache.spark.sql.DataFrame, name: String): String = {
      val staging = tmpDir(s"fcx2-stage-$name")
      df.coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new File(staging).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, java.nio.file.Paths.get(root, name)): Unit
      s"""{"add":{"path":"$name","partitionValues":{},""" +
        s""""size":${new File(root, name).length()},"modificationTime":1,"dataChange":true}}"""
    }
    val addA = stage(dfA, "part-00000-a.snappy.parquet")
    val addB = stage(dfB, "part-00000-b.snappy.parquet")
    val meta = s"""{"metaData":{"id":"conflict-dv","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":${mapper.writeValueAsString(dfA.schema.json)},""" +
      s""""partitionColumns":[],"configuration":{},"createdTime":1}}"""
    val proto = """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      """"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}"""
    new File(root, "_delta_log").mkdirs()
    Files.write(java.nio.file.Paths.get(root, "_delta_log",
      "00000000000000000000.json"),
      Seq(proto, meta, addA, addB).mkString("\n").getBytes("UTF-8")): Unit
  }

  test("two MUTATING writers on DISJOINT files both land (DV deletes)") {
    val root = tmpDir("fcx-dj")
    foreignTableDvTwoFiles(root,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"),
      Seq((4L, "d"), (5L, "e"), (6L, "f")).toDF("id", "v"))
    val loser = new ForeignDeltaTable(spark, root)
    val winner = new ForeignDeltaTable(spark, root)
    // the winner's DELETE (remove + DV re-add of file B) lands between the
    // loser's snapshot and publish; the loser's delete touches only file A
    // — footprints disjoint, so the loser retries and BOTH mutations land
    interleaveOnce(loser) {
      winner.deleteWhere(col("id") === 5L): Unit
    }
    val committed = loser.deleteWhere(col("id") === 2L)
    assert(committed == 2L, "winner v1, loser retried into v2")
    val rows = DeltaTable.read(spark, root)
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "a"), (3L, "c"), (4L, "d"), (6L, "f")))
  }

  test("two MUTATING writers touching the SAME file still abort loudly") {
    val root = tmpDir("fcx-ovl")
    foreignTableDvTwoFiles(root,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"),
      Seq((4L, "d"), (5L, "e"), (6L, "f")).toDF("id", "v"))
    val loser = new ForeignDeltaTable(spark, root)
    val winner = new ForeignDeltaTable(spark, root)
    // both deletes target rows in file A: the winner's commit removed and
    // re-added the very file the loser DV'd — a true write-write conflict
    // (delta-spark's ConcurrentDeleteDelete) that must surface, not retry
    interleaveOnce(loser) {
      winner.deleteWhere(col("id") === 1L): Unit
    }
    val e = intercept[java.util.ConcurrentModificationException](
      loser.deleteWhere(col("id") === 3L))
    assert(e.getMessage.contains("commit race"))
    // the winner's delete is intact; the loser's never half-applied
    val rows = DeltaTable.read(spark, root)
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(rows == Set((2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"), (6L, "f")))
  }

  test("disjoint-file UPDATE over a concurrent DV delete retries; model exact") {
    val root = tmpDir("fcx-updj")
    foreignTableDvTwoFiles(root,
      Seq((1L, 10L), (2L, 20L)).toDF("id", "qty"),
      Seq((3L, 30L), (4L, 40L)).toDF("id", "qty"))
    val loser = new ForeignDeltaTable(spark, root)
    val winner = new ForeignDeltaTable(spark, root)
    interleaveOnce(loser) {
      winner.deleteWhere(col("id") === 4L): Unit // touches file B only
    }
    // the update touches file A only; serial order winner→loser means the
    // deleted row must NOT reappear updated
    val committed = loser.updateWhere(col("id") <= 2L,
      Map("qty" -> (col("qty") + 1L)))
    assert(committed == 2L)
    val rows = DeltaTable.read(spark, root)
      .select("id", "qty").as[(Long, Long)].collect().toSet
    assert(rows == Set((1L, 11L), (2L, 21L), (3L, 30L)))
  }

  test("a race lost to a MUTATION (removes) still aborts loudly") {
    val root = tmpDir("fcx-abort")
    foreignTable(root, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val loser = new ForeignDeltaTable(spark, root)
    val winner = new ForeignDeltaTable(spark, root)
    // the winner OVERWRITES (remove actions) — not a pure append: the
    // loser's predicate analysis cannot prove disjointness, so it aborts
    loser.onBeforeCommit = () => {
      loser.onBeforeCommit = () => ()
      winner.overwrite(Seq((7L, "ow")).toDF("id", "v")): Unit
    }
    val e = intercept[java.util.ConcurrentModificationException](
      loser.deleteWhere(col("id") === 1L, allowProtocolUpgrade = true))
    assert(e.getMessage.contains("commit race"))
    // the winner's state is intact; nothing half-applied
    val rows = DeltaTable.read(spark, root)
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(rows == Set((7L, "ow")))
  }

  test("two-writer op mix: mutations raced by appends auto-resolve, model exact") {
    // randomized serialization check: writer A runs a seeded op mix; for
    // every MUTATION, writer B appends fresh rows exactly between A's
    // snapshot and A's publish (the onBeforeCommit seam). The expected
    // model applies B's append FIRST, then A's mutation — the serial
    // order the conflict retry must realize. Appends that never fire
    // (the mutation short-circuited on an empty match) are detected via
    // the `appended` capture and excluded from the model.
    val rnd = new scala.util.Random(0xC0FFEE)
    val root = tmpDir("fcx-mix")
    var model: Map[Long, Long] = (0L until 30L).map(i => i -> rnd.nextLong(8)).toMap
    var nextId = 30L
    foreignTable(root, model.toSeq.toDF("id", "k"))
    val a = new ForeignDeltaTable(spark, root)
    val b = new ForeignDeltaTable(spark, root)
    def freshRows(n: Int): Seq[(Long, Long)] = {
      val rows = (nextId until nextId + n).map(id => id -> rnd.nextLong(8))
      nextId += n
      rows
    }
    def armedAppend(): () => Seq[(Long, Long)] = {
      var appended: Seq[(Long, Long)] = Nil
      var fired = false
      a.onBeforeCommit = () => {
        if (!fired) {
          fired = true
          val rows = freshRows(1 + rnd.nextInt(4))
          b.append(rows.toDF("id", "k")): Unit
          appended = rows
        }
      }
      () => { a.onBeforeCommit = () => (); appended }
    }
    (1 to 18).foreach { i =>
      rnd.nextInt(4) match {
        case 0 => // plain append, no race
          val rows = freshRows(1 + rnd.nextInt(6))
          a.append(rows.toDF("id", "k")): Unit
          model = model ++ rows
        case 1 => // raced DV delete
          val kk = rnd.nextLong(8)
          val take = armedAppend()
          a.deleteWhere(col("k") === kk, allowProtocolUpgrade = true): Unit
          model = (model ++ take()).filterNot(_._2 == kk)
        case 2 => // raced MERGE (updates a slice + inserts)
          val updates = model.toSeq.filter(_ => rnd.nextInt(4) == 0)
            .map { case (id, _) => id -> rnd.nextLong(8) }
          val inserts = freshRows(rnd.nextInt(3))
          val src = updates ++ inserts
          if (src.nonEmpty) {
            val take = armedAppend()
            a.merge(src.toDF("id", "k"), Seq("id"), allowProtocolUpgrade = true): Unit
            model = model ++ take() ++ src
          }
        case 3 => // raced UPDATE WHERE
          val kk = rnd.nextLong(8)
          val take = armedAppend()
          a.updateWhere(col("k") === kk, Map("k" -> lit(99L)),
            allowProtocolUpgrade = true): Unit
          val app = take()
          // serial order: B's append lands first, so appended rows with
          // k == kk are updated too
          model = (model ++ app).map {
            case (id, k) if k == kk => id -> 99L
            case kv => kv
          }
      }
      val got = DeltaTable.read(spark, root)
        .select("id", "k").as[(Long, Long)].collect().toMap
      assert(got == model, s"op $i diverged: " +
        s"extra=${(got.toSet -- model.toSet).take(5)} " +
        s"missing=${(model.toSet -- got.toSet).take(5)}")
    }
  }

  test("three-writer mix: one race carries an append AND a disjoint mutation; true overlap aborts; model exact") {
    // Extends the two-writer model: while writer A's mutation is between
    // snapshot and publish, writer B APPENDS and writer C runs a MUTATION
    // of its own — so A's retry must judge a MULTI-commit winner set
    // (one pure append + one remove-bearing commit) in a single race.
    // Region discipline keeps footprints predictable at the FILE level:
    // region-A rows (k in 0..3) and region-B rows (k in 4..7) never share
    // a data file (separate seed/appends; updates keep k inside the
    // region), so C's region-B delete is disjoint from A's region-A
    // mutation by construction and the serial order B → C → A must land.
    // On deliberate COLLISION rounds C deletes A's own target k: C's
    // commit then removed/re-added files A touched — a true write-write
    // conflict that must abort A loudly, leaving exactly B + C applied.
    val rnd = new scala.util.Random(0xBEEF13)
    val root = tmpDir("fcx-three")
    var model: Map[Long, Long] = (0L until 24L).map(i => i -> rnd.nextLong(4)).toMap
    foreignTable(root, model.toSeq.toDF("id", "k"))
    val a = new ForeignDeltaTable(spark, root)
    val b = new ForeignDeltaTable(spark, root)
    val c = new ForeignDeltaTable(spark, root)
    val regionB = (100L until 124L).map(i => i -> (4L + rnd.nextLong(4)))
    b.append(regionB.toDF("id", "k")): Unit
    model = model ++ regionB
    // pre-upgrade the protocol (DV feature) with one unraced delete: a
    // protocol action inside a RACED winner commit is correctly
    // non-retryable and would turn every first-collision round into an
    // abort for the wrong reason
    b.append(Seq(999L -> 98L).toDF("id", "k")): Unit
    c.deleteWhere(col("k") === 98L, allowProtocolUpgrade = true): Unit
    var nextId = 200L
    def fresh(n: Int, region: Int): Seq[(Long, Long)] = {
      val base = if (region == 0) 0L else 4L
      val rows = (nextId until nextId + n).map(id => id -> (base + rnd.nextLong(4)))
      nextId += n
      rows
    }
    var bRows: Seq[(Long, Long)] = Nil
    var cK: Option[Long] = None
    var fired = false
    def arm(collideWith: Option[Long]): Unit = {
      bRows = Nil; cK = None; fired = false
      a.onBeforeCommit = () => if (!fired) {
        fired = true
        // B appends a single-region batch (a mixed batch would create a
        // file spanning both regions and break the disjointness argument)
        val rows = fresh(1 + rnd.nextInt(3), rnd.nextInt(2))
        b.append(rows.toDF("id", "k")): Unit
        bRows = rows
        val kk = collideWith.getOrElse(4L + rnd.nextLong(4))
        cK = Some(kk)
        c.deleteWhere(col("k") === kk, allowProtocolUpgrade = true): Unit
      }
    }
    def dropCk(m: Map[Long, Long]): Map[Long, Long] =
      m.filterNot(kv => cK.contains(kv._2))
    (1 to 15).foreach { i =>
      rnd.nextInt(3) match {
        case 0 => // raced region-A DV delete; 1-in-3 rounds a true collision
          val kk = rnd.nextLong(4)
          val collide = rnd.nextInt(3) == 0 && model.values.exists(_ == kk)
          arm(if (collide) Some(kk) else None)
          if (collide) {
            val e = intercept[java.util.ConcurrentModificationException](
              a.deleteWhere(col("k") === kk, allowProtocolUpgrade = true))
            assert(e.getMessage.contains("commit race"))
            assert(fired, "a collision round must have reached the seam")
            model = (model ++ bRows).filterNot(_._2 == kk) // B then C; A aborted
          } else {
            a.deleteWhere(col("k") === kk, allowProtocolUpgrade = true): Unit
            if (fired) model = dropCk(model ++ bRows).filterNot(_._2 == kk)
          }
        case 1 => // raced region-A UPDATE (k folds to 2, staying in-region)
          val kk = rnd.nextLong(4)
          val collide = rnd.nextInt(3) == 0 && model.values.exists(_ == kk)
          arm(if (collide) Some(kk) else None)
          if (collide) {
            val e = intercept[java.util.ConcurrentModificationException](
              a.updateWhere(col("k") === kk, Map("k" -> lit(2L)),
                allowProtocolUpgrade = true))
            assert(e.getMessage.contains("commit race"))
            assert(fired)
            model = (model ++ bRows).filterNot(_._2 == kk)
          } else {
            a.updateWhere(col("k") === kk, Map("k" -> lit(2L)),
              allowProtocolUpgrade = true): Unit
            if (fired) model = dropCk(model ++ bRows)
              .map { case (id, k) => if (k == kk) id -> 2L else id -> k }
          }
        case 2 => // raced region-A MERGE (updates + inserts); C stays disjoint
          val updates = model.toSeq
            .filter { case (_, k) => k < 4 && rnd.nextInt(4) == 0 }
            .map { case (id, _) => id -> rnd.nextLong(4) }
          val inserts = fresh(rnd.nextInt(3), region = 0)
          val src = updates ++ inserts
          if (src.nonEmpty) {
            arm(None)
            a.merge(src.toDF("id", "k"), Seq("id"), allowProtocolUpgrade = true): Unit
            if (fired) model = dropCk(model ++ bRows) ++ src
            else model = model ++ src
          }
      }
      a.onBeforeCommit = () => ()
      val got = DeltaTable.read(spark, root)
        .select("id", "k").as[(Long, Long)].collect().toMap
      assert(got == model, s"round $i diverged: " +
        s"extra=${(got.toSet -- model.toSet).take(5)} " +
        s"missing=${(model.toSet -- got.toSet).take(5)}")
    }
  }

  test("bounded retries: a writer appending at every attempt exhausts the budget") {
    val root = tmpDir("fcx-bound")
    foreignTable(root, Seq((1L, "a")).toDF("id", "v"))
    val loser = new ForeignDeltaTable(spark, root)
    val winner = new ForeignDeltaTable(spark, root)
    var appends = 0L
    // fires on EVERY publish attempt — the retry budget (3) must bound it
    loser.onBeforeCommit = () => {
      appends += 1
      winner.append(Seq((100L + appends, "w")).toDF("id", "v")): Unit
    }
    val e = intercept[java.util.ConcurrentModificationException](
      loser.deleteWhere(col("id") === 1L, allowProtocolUpgrade = true))
    assert(e.getMessage.contains("commit race"))
    assert(appends == 4L, s"1 initial + 3 retries, got $appends")
  }
}
