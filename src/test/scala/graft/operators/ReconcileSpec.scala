package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Reconcile.diffSnapshots]] — the data-diff: statuses, per-column
  * change detection incl. null transitions, and contracts. */
class ReconcileSpec extends SparkSuite {
  import spark.implicits._

  private def old = Seq(
    (1L, Option("a"), Option(10L)),
    (2L, Option("b"), Option(20L)),
    (3L, Option("c"), Option.empty[Long]),
    (4L, Option("d"), Option(40L))
  ).toDF("k", "s", "v")

  private def neu = Seq(
    (1L, Option("a"), Option(10L)),      // unchanged — omitted
    (2L, Option("B"), Option(21L)),      // both columns changed
    (3L, Option("c"), Option(30L)),      // NULL -> value IS a change
    (5L, Option("e"), Option(50L))       // inserted; 4 deleted
  ).toDF("k", "s", "v")

  test("statuses and changed columns are exact; null transitions count") {
    val got = Reconcile.diffSnapshots(old, neu, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getString(3))).toMap
    assert(got == Map(
      2L -> ("changed", 2L, "s,v"),
      3L -> ("changed", 1L, "v"),
      4L -> ("deleted", 0L, ""),
      5L -> ("inserted", 0L, "")))
  }

  test("identical snapshots diff to empty; contracts refuse") {
    assert(Reconcile.diffSnapshots(old, old, Seq("k"), Seq("s", "v")).count() == 0)
    intercept[IllegalArgumentException] {
      Reconcile.diffSnapshots(old, neu, Seq("k"), Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      Reconcile.diffSnapshots(old, neu, Seq("k"), Seq("k", "v"))
    }
    intercept[IllegalArgumentException] {
      Reconcile.diffSnapshots(old, neu, Seq.empty, Seq("v"))
    }
  }
}
