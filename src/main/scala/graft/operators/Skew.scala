package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins and aggregations.
  *
  * AQE's runtime skew-join handling (`spark.sql.adaptive.skewJoin`) covers
  * sort-merge joins after statistics exist; explicit salting is still the
  * tool when a key's row count is so extreme that even one split is too
  * big, when the skewed side feeds a window/groupBy rather than a join, or
  * when the plan must be deterministic up front (no AQE replan). Salts mix
  * row content with the row's physical position (partition id + in-partition
  * counter) — never RNG, so a given input layout yields identical results
  * across runs — and the position term guarantees full-duplicate rows (the
  * canonical hot-key case in scraped corpora) still fan out across salts
  * instead of re-colliding on one task (round-2 ADVICE finding). */
object Skew {

  /** Deterministic per-row salt in [0, parts): content hash mixed with
    * monotonically_increasing_id (which embeds the partition id), so
    * identical rows in the same partition get DIFFERENT salts. */
  private[graft] def rowSalt(allCols: Seq[Column], parts: Int): Column =
    pmod(xxhash64(allCols :+ monotonically_increasing_id(): _*), lit(parts)).cast("int")

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
      joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      rowSalt(left.columns.toSeq.map(col), parts))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(parts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase salted aggregation: count per (key, salt) partially, then
    * combine per key. Spark's hash aggregate already does map-side partial
    * combine, which handles most skew for algebraic aggregates — this
    * explicit form is for when the FIRST shuffle itself must avoid a hot
    * partition (e.g. a follow-on window function over the key). */
  def saltedCount(df: DataFrame, key: String, parts: Int = 16): DataFrame =
    df.withColumn("__salt", rowSalt(df.columns.toSeq.map(col), parts))
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
