package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the data-diff every migration/backfill ends
  * with: which keys were inserted, deleted, or changed between two
  * versions of a table, and WHICH columns changed. The verification
  * counterpart to the SCD2 engine's internal delta detection, exposed as
  * a standalone operator for tables the engine does not own. */
object Reconcile {

  /** Diff two snapshots keyed by `pks`: one row per key present in
    * either side with `status` ∈ inserted / deleted / changed (unchanged
    * keys are omitted — at reconciliation scale they are the overwhelming
    * majority and carry no information), plus `n_changed_cols` and the
    * comma-joined sorted `changed_cols` (empty for inserts/deletes —
    * every column "changed" is noise when the whole row appeared).
    * Column comparison is null-safe (a NULL→value transition IS a
    * change, NULL→NULL is not).
    *
    * Shape at scale: ONE full outer join on the key columns — co-locate
    * both scans by pre-bucketing on the pk for the shuffle-free form —
    * and per-column comparison as codegen projection arithmetic; the
    * output is bounded by the churn, not the table. */
  def diffSnapshots(
      oldDf: DataFrame, newDf: DataFrame,
      pks: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(pks.nonEmpty, "need at least one key column")
    require(compareCols.nonEmpty, "need at least one compare column")
    (pks ++ compareCols).foreach { c =>
      require(oldDf.columns.contains(c), s"old snapshot is missing '$c'")
      require(newDf.columns.contains(c), s"new snapshot is missing '$c'")
    }
    require(pks.intersect(compareCols).isEmpty,
      s"key columns cannot also be compared: ${pks.intersect(compareCols).mkString(", ")}")
    val o = oldDf.select((pks ++ compareCols).map(c => col(c).as(s"__o_$c")): _*)
      .withColumn("__in_old", lit(1))
    val n = newDf.select((pks ++ compareCols).map(c => col(c).as(s"__n_$c")): _*)
      .withColumn("__in_new", lit(1))
    val joined = o.join(n,
      pks.map(c => col(s"__o_$c") <=> col(s"__n_$c")).reduce(_ && _), "full")
    val diffs = compareCols.sorted.map(c =>
      when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c)))
    val changedArr = array_compact(array(diffs: _*))
    joined
      .withColumn("status",
        when(col("__in_old").isNull, lit("inserted"))
          .when(col("__in_new").isNull, lit("deleted"))
          .when(size(changedArr) > 0, lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(pks.map(c => coalesce(col(s"__n_$c"), col(s"__o_$c")).as(c)) ++ Seq(
        col("status"),
        when(col("status") === "changed", size(changedArr).cast("long"))
          .otherwise(lit(0L)).as("n_changed_cols"),
        when(col("status") === "changed", array_join(changedArr, ","))
          .otherwise(lit("")).as("changed_cols")): _*)
  }
}
