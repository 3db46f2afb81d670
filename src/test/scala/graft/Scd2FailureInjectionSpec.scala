package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.scd2.Synchronizer
import graft.sources.DataFrameSource

/** Failure injection across the delta-load step boundaries (round-8 verdict
  * item 8; reference db_to_delta.py:269-286 rollback, exercised indirectly
  * by tests/test_12). A hook throws at each committed step boundary
  * ([[Synchronizer.failpoint]]): the run must roll BOTH snapshot tables
  * back to their pre-run state — including DROPPING a `primary_keys_ts`
  * that did not exist before the run (first delta load after a full load),
  * where a leftover step-1 snapshot would advance the watermark past rows
  * step 2 never committed and the next run's short-circuit would silently
  * skip them — and a subsequent clean run must converge to the same
  * current state as a never-failed sequence, with a consistent
  * latest_pk_version. */
class Scd2FailureInjectionSpec extends SparkSuite {
  import spark.implicits._

  private val pk = Seq("id")
  private def cfg = WriteConfig(deltaCol = Some("ver"))

  private def batch1: DataFrame =
    (1 to 12).map(i => (i.toLong, s"n$i", 1L)).toDF("id", "name", "ver")

  /** Deletes 11/12, updates 1-3 (ver 2), inserts 13/14 (ver 2). */
  private def batch2: DataFrame =
    ((1 to 10).map(i => (i.toLong, if (i <= 3) s"n${i}u" else s"n$i",
      if (i <= 3) 2L else 1L)) ++ Seq((13L, "n13", 2L), (14L, "n14", 2L)))
      .toDF("id", "name", "ver")

  private def payload(df: DataFrame): Seq[Seq[Any]] =
    df.select("id", "name", "ver").collect().toSeq.map(_.toSeq).sortBy(_.head.toString)

  /** Clean two-run reference: what current state + tombstones must be. */
  private lazy val (refCurrent, refTombstones) = {
    val dest = tmpDir("graft-fi-ref")
    new Synchronizer(spark, new DataFrameSource(batch1, pk), dest, cfg).execute()
    val s = new Synchronizer(spark, new DataFrameSource(batch2, pk), dest, cfg)
    s.execute()
    (payload(s.currentState()),
      s.dest.delta.read().filter(col(SystemCols.isDeleted)).count())
  }

  for (point <- Seq("mid_step2", "after_step2", "after_step3", "after_step4"))
    test(s"crash at $point: snapshots roll back, retry converges") {
      val dest = tmpDir(s"graft-fi-$point")
      new Synchronizer(spark, new DataFrameSource(batch1, pk), dest, cfg).execute()
      val sFail = new Synchronizer(spark, new DataFrameSource(batch2, pk), dest, cfg)
      val pkBefore = payloadPk(sFail)
      val histBefore = sFail.dest.delta.read().count()
      assert(!sFail.dest.primaryKeysTs.exists) // first delta run: no pre-run snapshot

      sFail.failpoint = p => if (p == point) throw new RuntimeException(s"boom:$point")
      val e = intercept[RuntimeException](sFail.execute())
      assert(e.getMessage == s"boom:$point")

      // rollback: latest_pk_version content restored, primary_keys_ts DROPPED
      val sAfter = new Synchronizer(spark, new DataFrameSource(batch2, pk), dest, cfg)
      assert(payloadPk(sAfter) == pkBefore, "latest_pk_version not restored")
      assert(!sAfter.dest.primaryKeysTs.exists,
        "primary_keys_ts must be dropped when it did not exist pre-run")
      if (point == "mid_step2") // nothing committed before this point
        assert(sAfter.dest.delta.read().count() == histBefore)

      // retry without injection: same current state as the clean sequence
      val r = sAfter.execute()
      assert(r.isInstanceOf[LoadResult.DeltaLoad], s"retry produced $r")
      assert(payload(sAfter.currentState()) == refCurrent)
      assert(sAfter.dest.delta.read().filter(col(SystemCols.isDeleted)).count()
        == refTombstones)
      assert(sAfter.checkConsistency().isEmpty)
    }

  test("crash after_step2 on a later run RESTORES primary_keys_ts content") {
    val dest = tmpDir("graft-fi-restore")
    new Synchronizer(spark, new DataFrameSource(batch1, pk), dest, cfg).execute()
    val s2 = new Synchronizer(spark, new DataFrameSource(batch2, pk), dest, cfg)
    s2.execute() // clean delta run → primary_keys_ts exists
    val tsBefore = snapshotPkTs(s2)

    val batch3 = batch2.withColumn("ver",
      when(col("id") === 4L, lit(3L)).otherwise(col("ver")))
      .withColumn("name", when(col("id") === 4L, lit("n4u")).otherwise(col("name")))
    val sFail = new Synchronizer(spark, new DataFrameSource(batch3, pk), dest, cfg)
    sFail.failpoint = p => if (p == "after_step2") throw new RuntimeException("boom")
    intercept[RuntimeException](sFail.execute())

    val sAfter = new Synchronizer(spark, new DataFrameSource(batch3, pk), dest, cfg)
    assert(snapshotPkTs(sAfter) == tsBefore, "primary_keys_ts not restored to pre-run")
    sAfter.execute()
    assert(payload(sAfter.currentState().filter(col("id") === 4L))
      == Seq(Seq(4L, "n4u", 3L)))
    assert(sAfter.checkConsistency().isEmpty)
  }

  private def payloadPk(s: Synchronizer): Seq[Seq[Any]] =
    s.dest.latestPkVersion.read().collect().toSeq.map(_.toSeq).sortBy(_.head.toString)
  private def snapshotPkTs(s: Synchronizer): Seq[Seq[Any]] =
    s.dest.primaryKeysTs.read().collect().toSeq.map(_.toSeq).sortBy(_.head.toString)
}
