package graft

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.scd2.Synchronizer
import graft.sources.DataFrameSource

/** Property-style test of the core SCD2 invariant (SURVEY.md §5): after
  * ANY sequence of insert/update/delete batches,
  *
  *   persisted latest_pk_version ≡ W1-recomputation from history, and
  *   currentState() ≡ the source's live rows.
  *
  * A seeded RNG drives several rounds of random mutations against an
  * in-memory model; the engine must track it exactly. This is the
  * reference's `write_db_to_delta_with_check` invariant
  * (consistency.py:17-56, tests/utils.py:29-83) strengthened into a
  * randomized scenario. */
class Scd2PropertySpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("payload", StringType),
    StructField("ver", LongType)))

  private def toDf(model: Map[Long, (String, Long)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        model.toSeq.map { case (id, (p, v)) => Row(id, p, v) }, 4),
      schema)

  test("random insert/update/delete sequences preserve snapshot ≡ f(history)") {
    val rnd = new Random(0xC0FFEE)
    var model = (0L until 200L).map(id => id -> (s"p$id", 1L)).toMap
    var nextId = 200L
    val dest = tmpDir("graft-prop")
    val cfg = WriteConfig(deltaCol = Some("ver"))

    def sync() = new Synchronizer(spark,
      new DataFrameSource(toDf(model), Seq("id")), dest, cfg)

    sync().execute() // full load

    (1 to 5).foreach { round =>
      val ver = round + 1L
      // deletes: ~5%
      val deleted = model.keys.filter(_ => rnd.nextDouble() < 0.05).toSet
      model = model -- deleted
      // updates: ~10%
      model = model.map { case (id, (p, v)) =>
        if (rnd.nextDouble() < 0.10) id -> (s"$p-u$round", ver) else id -> (p, v)
      }
      // inserts: ~12 new keys
      (0 until 12).foreach { _ =>
        model += nextId -> (s"n$nextId", ver); nextId += 1
      }
      val s = sync()
      s.execute()

      // invariant 1: persisted snapshot ≡ recomputed-from-history
      assert(s.checkConsistency().isEmpty, s"round $round: snapshot drift")
      // invariant 2: current state ≡ live model
      val cur = s.currentState()
        .select("id", "payload", "ver").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(cur == model, s"round $round: currentState != model " +
        s"(missing=${(model.keySet -- cur.keySet).take(5)}, " +
        s"extra=${(cur.keySet -- model.keySet).take(5)})")
      // invariant 3: history only ever grows (append-only)
      assert(s.dest.delta.read().count() >= model.size)
    }
  }

  test("out-of-band (backwards) version changes are repaired by the strange path") {
    val rnd = new Random(0xBEEF)
    var model = (0L until 100L).map(id => id -> (s"p$id", 5L)).toMap
    val dest = tmpDir("graft-prop-strange")
    val cfg = WriteConfig(deltaCol = Some("ver"))
    def sync() = new Synchronizer(spark,
      new DataFrameSource(toDf(model), Seq("id")), dest, cfg)
    sync().execute()

    // simulate restore-from-backup: some rows drop BACK to ver 1 with
    // different payloads; one insert moves the (max,count) state
    model = model.map { case (id, (p, v)) =>
      if (rnd.nextDouble() < 0.15) id -> (s"$p-restored", 1L) else id -> (p, v)
    }
    model += 100L -> ("new", 6L)
    val s = sync()
    s.execute()
    assert(s.checkConsistency().isEmpty)
    val cur = s.currentState().select("id", "payload", "ver").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(cur == model)
  }
}
