package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Temporal.activeUsers]] — rolling DAU/WAU/MAU semantics: trailing
  * coverage per window, distinct across source buckets, frontier clamping,
  * the retentionState-shared incremental form, and stickiness. */
class ActiveUsersSpec extends SparkSuite {
  import spark.implicits._

  private def ev(rows: (Long, Long)*) = rows.toDF("user_id", "ts")

  test("trailing coverage, distinct within window, frontier clamp") {
    // buckets (width 10): u1 active in 0 and 2; u2 active in 2 only
    val df = ev((1L, 5L), (1L, 25L), (1L, 27L), (2L, 21L))
    val got = Temporal.activeUsers(df, "user_id", "ts", 10L, Seq(1L, 3L))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // win=1: bucket 0 -> {u1}, bucket 2 -> {u1, u2}
    assert(got((0L, 1L)) == 1L && got((2L, 1L)) == 2L)
    assert(!got.contains((1L, 1L))) // no activity in bucket 1
    // win=3: bucket 0 covers act@0; bucket 1 covers act@0; bucket 2 covers
    // act@{0,2} — u1 active twice inside the window counts ONCE; buckets
    // 3..4 are past the observed frontier (max bucket 2) and absent
    assert(got((0L, 3L)) == 1L && got((1L, 3L)) == 1L && got((2L, 3L)) == 2L)
    assert(!got.exists { case ((b, _), _) => b > 2L })
  }

  test("pre-epoch timestamps bucket by FLOOR division") {
    val df = ev((1L, -5L), (2L, 5L))
    val got = Temporal.activeUsers(df, "user_id", "ts", 10L, Seq(1L))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(-1L) == 1L && got(0L) == 1L)
  }

  test("incremental: retentionState fold serves the identical view") {
    val b1 = ev((1L, 5L), (1L, 25L), (2L, 21L), (3L, 8L))
    val b2 = ev((1L, 27L), (2L, 45L), (4L, 41L), (1L, 5L)) // incl. a replay
    val oneShot = Temporal.activeUsers(b1.unionByName(b2),
      "user_id", "ts", 10L, Seq(1L, 3L)).collect().map(_.toSeq).toSet
    val st = Temporal.retentionState(b1, "user_id", "ts", 10L)
    val folded = Temporal.retentionFold(st, b2, "user_id", "ts", 10L)
    val served = Temporal.activeUsersOf(folded, Seq(1L, 3L))
      .collect().map(_.toSeq).toSet
    assert(served == oneShot)
  }

  test("stickiness: integer permille of the long window's actives") {
    val df = ev((1L, 5L), (2L, 8L), (3L, 2L), (1L, 25L))
    val act = Temporal.activeUsers(df, "user_id", "ts", 10L, Seq(1L, 3L))
    val got = Temporal.stickiness(act, 1L, 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // bucket 0: dau {1,2,3}=3, w3 {1,2,3}=3 -> 1000; bucket 2: dau {1}=1,
    // w3 covers act@{0,2} = {1,2,3} -> 333
    assert(got(0L) == ((3L, 3L, 1000L)))
    assert(got(2L) == ((1L, 3L, 333L)))
  }

  test("sketch: exact below k, duplicate-insensitive, clamps like the exact form") {
    // hashes ARE the keys here (distinct positive longs), k larger than any
    // cell's distinct count -> n_kept must equal the exact active count and
    // est_active must be EXACT, bucket-for-bucket
    val df = ev((11L, 5L), (22L, 8L), (33L, 2L), (11L, 25L), (11L, 27L), (22L, 21L))
    val exact = Temporal.activeUsers(df, "user_id", "ts", 10L, Seq(1L, 3L))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sk = Temporal.activeUsersSketch(df, "user_id", "ts", 10L, Seq(1L, 3L),
        k = 16, hashBound = 1L << 40)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(4)))).toMap
    assert(sk.keySet == exact.keySet)
    sk.foreach { case (cell, (kept, est)) =>
      assert(kept == exact(cell) && est == exact(cell), s"cell $cell")
    }
    // at k below the distinct count the estimate engages: 3 distinct in
    // bucket 0's win=3 cell with k=2 -> kth_min = 2nd smallest hash
    val tight = Temporal.activeUsersSketch(df, "user_id", "ts", 10L, Seq(3L),
        k = 2, hashBound = 1L << 40)
      .filter(col("bucket") === 0L).collect().head
    assert(tight.getLong(2) == 2L) // n_kept capped at k
    // deterministic: kth_min = 2nd smallest of {11, 22, 33} = 22, and the
    // estimate replays the (k-1)*bound DIV (kth+1) formula exactly
    assert(tight.getLong(3) == 22L)
    assert(tight.getLong(4) == (1L << 40) / 23L)
  }

  test("contract refusals: fan-out budget, window order, state shape, empty input") {
    val df = ev((1L, 5L))
    val e = intercept[IllegalArgumentException] {
      Temporal.activeUsers(df, "user_id", "ts", 1L, Seq(1L, 4096L))
    }
    assert(e.getMessage.contains("replication budget"))
    intercept[IllegalArgumentException] {
      Temporal.stickiness(
        Temporal.activeUsers(df, "user_id", "ts", 10L, Seq(1L, 3L)), 3L, 1L)
    }
    intercept[IllegalArgumentException] {
      Temporal.activeUsersOf(df, Seq(1L)) // not a retentionState shape
    }
    assert(Temporal.activeUsers(df.limit(0), "user_id", "ts", 10L,
      Seq(1L, 7L)).count() == 0L)
  }
}
