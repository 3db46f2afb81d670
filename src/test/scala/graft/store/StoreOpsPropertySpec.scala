package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Randomized op-mix property test for the versioned store: a seeded
  * sequence of append / DELETE WHERE (deletion vectors) / merge (both
  * copy-on-write and merge-on-read) / OPTIMIZE / restore is replayed
  * against a driver-side model; after EVERY op the table must equal the
  * model, every recorded version must time-travel back exactly, and at
  * the end the mirrored `_delta_log` must read identically through the
  * external Delta reader. This is the catch-all for cross-op interactions
  * no single-op spec exercises (DV over rewritten dirs, restore across DV
  * commits, optimize dissolving bitmaps mid-history, merges touching
  * DV'd files). */
class StoreOpsPropertySpec extends SparkSuite {
  import spark.implicits._

  private type Model = Map[Long, Long] // id -> k

  private def toDf(rows: Seq[(Long, Long)]) = rows.toDF("id", "k")

  private def snapshot(t: VersionedTable): Model =
    t.read().select("id", "k").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def runMix(seed: Int, ops: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val path = tmpDir(s"dvprop$seed")
    val t = new VersionedTable(spark, path)
    var model: Model = (0L until 40L).map(i => i -> rnd.nextLong(50)).toMap
    var nextId = 40L
    t.append(toDf(model.toSeq))
    // version -> expected model, for time-travel replay at the end
    val history = scala.collection.mutable.ArrayBuffer(
      t.latestVersion.get -> model)

    (1 to ops).foreach { i =>
      rnd.nextInt(6) match {
        case 0 => // append fresh ids
          val n = 1 + rnd.nextInt(20)
          val rows = (nextId until nextId + n).map(id => id -> rnd.nextLong(50))
          nextId += n
          t.append(toDf(rows))
          model = model ++ rows
        case 1 => // DV delete on a k-slice (may match nothing)
          val kk = rnd.nextLong(50)
          t.delete(col("k") === kk)
          model = model.filterNot(_._2 == kk)
        case 2 | 3 => // merge: updates of existing ids + some inserts
          val useDv = rnd.nextBoolean()
          val ids = model.keys.toSeq.sorted
          val upd = rnd.shuffle(ids).take(math.min(ids.size, 1 + rnd.nextInt(10)))
            .map(id => id -> rnd.nextLong(50))
          val ins = (nextId until nextId + rnd.nextInt(5))
            .map(id => id -> rnd.nextLong(50))
          nextId += ins.size
          if (upd.nonEmpty || ins.nonEmpty) {
            t.merge(toDf(upd ++ ins), Seq("id"), useDeletionVectors = useDv)
            model = model ++ upd ++ ins
          }
        case 4 => // optimize (clusterBy sometimes)
          if (rnd.nextBoolean()) t.optimize()
          else t.optimize(clusterBy = Seq("id"), targetDirs = 2)
        case 5 => // restore to a random recorded version
          val (v, m) = history(rnd.nextInt(history.size))
          t.restore(v)
          model = m
      }
      val got = snapshot(t)
      assert(got == model, s"seed=$seed op=$i diverged: " +
        s"extra=${(got.toSet -- model.toSet).take(5)} " +
        s"missing=${(model.toSet -- got.toSet).take(5)}")
      history += t.latestVersion.get -> model
    }

    // every recorded version time-travels back exactly
    rnd.shuffle(history.toSeq).take(6).foreach { case (v, m) =>
      val got = t.readVersion(v).select("id", "k").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == m, s"seed=$seed version $v time travel diverged")
    }

    // the mirrored _delta_log reads identically through the external reader
    val ext = DeltaTable.read(spark, path).select("id", "k").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ext == model, s"seed=$seed delta mirror diverged")

    // vacuum keeps the latest version exact and the mirror readable
    t.vacuum(keepVersions = 2)
    assert(snapshot(t) == model, s"seed=$seed post-vacuum diverged")
  }

  test("randomized append/delete/merge/optimize/restore mix equals the model") {
    runMix(seed = 7, ops = 25)
    runMix(seed = 41, ops = 25)
  }
}
