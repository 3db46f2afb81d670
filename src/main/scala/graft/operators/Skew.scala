package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins and aggregations.
  *
  * AQE's runtime skew-join handling (`spark.sql.adaptive.skewJoin`) covers
  * sort-merge joins after statistics exist; explicit salting is still the
  * tool when a key's row count is so extreme that even one split is too
  * big, when the skewed side feeds a window/groupBy rather than a join, or
  * when the plan must be deterministic up front (no AQE replan).
  *
  * Salt derivation is a real tradeoff, so it's a switch:
  *  - `positional = true` (default): content hash mixed with
  *    monotonically_increasing_id, so byte-identical duplicate rows — the
  *    canonical hot-key case in scraped corpora — still fan out across
  *    salts. CAVEAT: the row→salt mapping depends on physical row position;
  *    if the input comes off an upstream SHUFFLE, a partial stage retry can
  *    recompute rows into different positions → different salts (the
  *    SPARK-23207 correctness class). Safe for inputs read directly from
  *    stable storage (files), which is the common salting site.
  *  - `positional = false`: pure content hash — retry-deterministic under
  *    any lineage, but full-duplicate rows share a salt and re-collide on
  *    one task. Use for shuffle-fed inputs where duplicates are rare. */
object Skew {

  /** Per-row salt in [0, parts) — see the object doc for the
    * positional/content tradeoff. */
  private[graft] def rowSalt(
      allCols: Seq[Column], parts: Int, positional: Boolean = true): Column = {
    val mix = if (positional) allCols :+ monotonically_increasing_id() else allCols
    pmod(xxhash64(mix: _*), lit(parts)).cast("int")
  }

  /** Salted equi-join of a skewed LEFT side against a smaller right side:
    * left rows get a content-derived salt in [0, parts); the right side is
    * replicated `parts` times; the join key becomes (key, salt), so one hot
    * key fans out over `parts` tasks instead of one straggler.
    *
    * Right-side replication multiplies its size by `parts` — use for
    * moderate right sides that are too big to broadcast but small enough to
    * replicate; for broadcast-able right sides just use broadcast(). */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      parts: Int = 16,
      joinType: String = "inner",
      positionalSalt: Boolean = true): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      rowSalt(left.columns.toSeq.map(col), parts, positionalSalt))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(parts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase salted aggregation: count per (key, salt) partially, then
    * combine per key. Spark's hash aggregate already does map-side partial
    * combine, which handles most skew for algebraic aggregates — this
    * explicit form is for when the FIRST shuffle itself must avoid a hot
    * partition (e.g. a follow-on window function over the key). */
  def saltedCount(
      df: DataFrame, key: String, parts: Int = 16,
      positionalSalt: Boolean = true): DataFrame =
    df.withColumn("__salt", rowSalt(df.columns.toSeq.map(col), parts, positionalSalt))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__c"))
      .groupBy(col(key)).agg(sum("__c").as("cnt"))

  /** Top-heavy key detector: keys whose row share exceeds `threshold` of
    * the total — the diagnosis step before salting. */
  def skewedKeys(df: DataFrame, key: String, threshold: Double = 0.01): DataFrame = {
    val total = df.count()
    df.groupBy(key).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > (total * threshold).toLong)
      .withColumn("share_x1000", (col("cnt") * 1000L / lit(total)).cast("long"))
  }
}
