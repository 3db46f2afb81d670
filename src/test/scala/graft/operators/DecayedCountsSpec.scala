package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Temporal.decayedCounts]]/[[Temporal.decayedCountsFold]] — the
  * integer-exact EWMA feature: hand-checked recurrence, common-frontier
  * comparability, fold ≡ one-shot, and the late-data/span contracts. */
class DecayedCountsSpec extends SparkSuite {
  import spark.implicits._

  // width 10: key 1 has 3 events in bucket 0, 2 in bucket 2;
  // key 2 has 1 event in bucket 0 only
  private def ev = (Seq.fill(3)((1L, 5L)) ++ Seq.fill(2)((1L, 25L)) :+ ((2L, 7L)))
    .toDF("k", "ts")

  test("the recurrence is exact, empty buckets decay, frontier is common") {
    // decay 1/2 to frontier 3:
    // key 1: s0=3, s1=3/2=1, s2=1/2+2=2, s3=2/2=1
    // key 2: s0=1, s1=0, s2=0, s3=0 (decayed away, still reported)
    val got = Temporal.decayedCounts(ev, "k", "ts", 10L, 1, 2, frontier = 3L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == (0L, 2L, 1L))
    assert(got(2L) == (0L, 1L, 0L))
  }

  test("fold through parquet ≡ one-shot; new keys start, absent keys decay") {
    val dir = java.nio.file.Files.createTempDirectory("decay-spec")
    try {
      // extra key 3 appears only after the cut
      val all = ev.unionByName(Seq((3L, 35L)).toDF("k", "ts"))
      Temporal.decayedCounts(all.filter(col("ts") <= 19L),
          "k", "ts", 10L, 85, 100, frontier = 1L)
        .write.mode("overwrite").parquet(dir.toString)
      val state = spark.read.parquet(dir.toString)
      val folded = Temporal.decayedCountsFold(state,
          all.filter(col("ts") > 19L), "k", "ts", newFrontier = 3L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val oneShot = Temporal.decayedCounts(all, "k", "ts", 10L, 85, 100, 3L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(folded == oneShot)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir.toFile)
    }
  }

  test("late data refuses; frontier and span contracts hold") {
    val state = Temporal.decayedCounts(ev, "k", "ts", 10L, 85, 100, 2L)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // a batch event in an already-folded bucket
    val e = intercept[Exception] {
      Temporal.decayedCountsFold(state, Seq((1L, 15L)).toDF("k", "ts"),
        "k", "ts", newFrontier = 4L).collect()
    }
    assert(msgs(e).exists(_.contains("cannot absorb late data")))
    intercept[IllegalArgumentException] {
      Temporal.decayedCountsFold(state, ev, "k", "ts", newFrontier = 2L)
    }
    intercept[IllegalArgumentException] {
      Temporal.decayedCountsFold(state, ev, "k", "ts",
        newFrontier = 10000L, maxSpan = 100)
    }
    // a state without stamps (plain projection) refuses
    intercept[IllegalArgumentException] {
      Temporal.decayedCountsFold(
        state.select(col("k"), col("first_bucket"), col("n_active_buckets"),
          (col("decayed_x") + 0L).as("decayed_x")),
        ev, "k", "ts", newFrontier = 4L)
    }
    intercept[IllegalArgumentException] {
      Temporal.decayedCounts(ev, "k", "ts", 10L, 2, 2, 3L) // decay >= 1
    }
    // an event PAST the frontier refuses (symmetric with the fold's
    // late-data rule) — silently dropping it would hide fresh activity
    val e2 = intercept[Exception] {
      Temporal.decayedCounts(ev, "k", "ts", 10L, 85, 100, frontier = 1L)
        .collect()
    }
    assert(msgs(e2).exists(_.contains("past the frontier")))
    // a maintainer restart with drifted decay params refuses
    val root = java.nio.file.Files.createTempDirectory("decay-cfg")
    try {
      val dir = root.toString + "/tbl"
      graft.streaming.StreamingIngest.decayIngestBatch(
        ev.filter(col("ts") <= 19L), 0L, "k", "ts", 10L, 85, 100, dir, "app")
      val e3 = intercept[IllegalArgumentException] {
        graft.streaming.StreamingIngest.decayIngestBatch(
          ev.filter(col("ts") > 19L), 1L, "k", "ts", 10L, 50, 100, dir, "app")
      }
      assert(e3.getMessage.contains("stamped"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(root.toFile)
    }
  }

  test("maintainer replay: a re-delivered batch is skipped BEFORE the fold (late-data refusal cannot trip)") {
    val root = java.nio.file.Files.createTempDirectory("decay-replay")
    try {
      val dir = root.toString + "/tbl"
      def ingest(b: org.apache.spark.sql.DataFrame, id: Long) =
        graft.streaming.StreamingIngest.decayIngestBatch(b, id, "k", "ts",
          10L, 85, 100, dir, "app")
      ingest(ev.filter(col("ts") <= 19L), 0L)
      ingest(ev.filter(col("ts") > 19L), 1L)
      val tbl = new graft.store.VersionedTable(spark, dir)
      val after = tbl.read().collect().map(_.toSeq).toSet
      // a replay of batch 1: the fold REFUSES late data, so only the
      // txnApplied-first rule keeps this from throwing — and the state
      // must be bit-identical after
      ingest(ev.filter(col("ts") > 19L), 1L)
      assert(tbl.read().collect().map(_.toSeq).toSet == after)
      // served scores equal the one-shot recurrence
      val oneShot = Temporal.decayedCounts(ev, "k", "ts", 10L, 85, 100, 2L)
        .collect().map(_.toSeq).toSet
      assert(after == oneShot)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(root.toFile)
    }
  }

  test("a key whose span exceeds the cap refuses in-projection") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      Temporal.decayedCounts(ev, "k", "ts", 10L, 85, 100,
        frontier = 100000L, maxSpan = 64).collect()
    }
    assert(msgs(e).exists(_.contains("graft decayedCounts")))
  }
}
