package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable sketches whose whole statistic is DETERMINISTIC and
  * integer-exact, so an external engine replays them bit-for-bit — the
  * house discipline [[TextCorpus.distinctSketch]] set for distinct counts,
  * applied to other aggregate shapes. */
object Sketches {

  /** Per-group RELATIVE-ERROR quantile sketch — the DDSketch/HDR-histogram
    * shape in pure integer arithmetic: every non-negative value lands in
    * the bucket keyed by its top `1 + mantissaBits` binary digits
    * (`shift = max(bitlen(v) − 1 − mantissaBits, 0)`, bucket id
    * `v >> shift`), so bucket width / lower edge ≤ 2^−mantissaBits and the
    * reported estimate (the covering bucket's UPPER edge) is at most that
    * relative factor above the true q-quantile — while values below
    * 2^mantissaBits are EXACT (shift 0: singleton buckets). The estimate
    * rule is integer-exact rank covering: the first bucket (by value
    * order) whose cumulative count `cum·1000 ≥ q‰·total`.
    *
    * Why not `percentile_approx`/exact `percentile`: Spark's GK sketch is
    * merge-order-dependent (not externally replayable), and the exact form
    * sorts every group. This sketch is a plain map-side-combinable
    * histogram GROUP BY — at most `64·2^mantissaBits` buckets per group,
    * O(1) state per bucket — followed by one keyed window over the TINY
    * histogram and one aggregate. The 100 TB latency-percentile shape:
    * no sort of the data, no order dependence, merge = count addition.
    *
    * `valueCol` must be integral and non-negative (cents/micros, the
    * integer-exactness house rule) — negatives refuse loudly AT EXECUTION
    * TIME (raise_error rides the bucket projection). Quantiles are
    * permille (500 = median, 990 = p99). Returns one row per
    * (group, q_permille): (group, q_permille, est) — est null only for
    * empty groups, which do not appear. */
  def quantileSketch(
      df: DataFrame, groupCol: String, valueCol: String,
      qsPermille: Seq[Int], mantissaBits: Int = 6): DataFrame =
    quantileSketchOf(
      quantileSketchHistogram(df, groupCol, valueCol, mantissaBits),
      qsPermille)

  private val SketchMetaBits = "graft.qsketch.mantissaBits"

  /** The PERSISTED form of [[quantileSketch]]: the per-group bucket
    * histogram — (group, lo, hi, cnt), the exact sufficient statistic, at
    * most `64·2^mantissaBits` rows per group. Counts are ADDITIVE, so the
    * fold ([[quantileSketchFold]]) is commutative and order-free (late
    * data exact by construction); it is NOT idempotent — replay
    * protection is the ingest's job (the `txnApplied` pattern), exactly
    * like the transition-matrix state. `mantissaBits` is stamped in the
    * `lo` column's metadata so a mismatched fold refuses instead of
    * silently mixing bucket granularities. */
  def quantileSketchHistogram(
      df: DataFrame, groupCol: String, valueCol: String,
      mantissaBits: Int = 6): DataFrame = {
    require(mantissaBits >= 0 && mantissaBits <= 16,
      s"mantissaBits must be in [0, 16], got $mantissaBits")
    val integral: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    require(integral.contains(df.schema(valueCol).dataType),
      s"valueCol $valueCol must be integral (got ${df.schema(valueCol).dataType}) " +
        "— scale to cents/micros first, the integer-exactness house rule")
    val v = when(col(valueCol) < 0, raise_error(concat(
        lit(s"graft quantileSketch: negative value in $valueCol ("),
        col(valueCol).cast("string"),
        lit(") — the binary-bucket rule needs non-negative values; " +
          "shift the domain or split by sign upstream"))))
      .otherwise(col(valueCol).cast("long"))
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(SketchMetaBits, mantissaBits.toLong).build()
    // bitlen via bin(): both Spark and DuckDB render the minimal binary
    // string (bin(0) = "0" -> bitlen 1 -> shift 0 -> exact), so the
    // bucketing replays integer-exactly in an external engine
    df.select(col(groupCol).as("__g"), v.as("__v"))
      .withColumn("__s",
        greatest(length(bin(col("__v"))) - 1 - mantissaBits, lit(0)).cast("int"))
      .withColumn("__bid", expr("shiftright(__v, __s)"))
      .groupBy("__g", "__s", "__bid").agg(count(lit(1)).as("cnt"))
      .select(col("__g").as(groupCol),
        expr("shiftleft(__bid, __s)").as("lo", meta),
        expr("shiftleft(__bid + 1L, __s) - 1L").as("hi"),
        col("cnt"))
  }

  private def requireHistogram(state: DataFrame, op: String): Unit =
    require(state.columns.length == 4 &&
      state.columns.drop(1).toSeq == Seq("lo", "hi", "cnt"),
      s"$op expects a quantileSketchHistogram (group, lo, hi, cnt), " +
        s"got ${state.columns.mkString(", ")}")

  /** Fold a new batch's histogram into a persisted one: counts add per
    * (group, bucket) — one tiny aggregate over histogram-sized data, any
    * batch order, late data exact. Both sides must carry the SAME
    * `mantissaBits` stamp (enforced when both stamps survived storage). */
  def quantileSketchFold(state: DataFrame, batch: DataFrame): DataFrame = {
    requireHistogram(state, "quantileSketchFold")
    requireHistogram(batch, "quantileSketchFold")
    (state.schema("lo").metadata, batch.schema("lo").metadata) match {
      case (a, b) if a.contains(SketchMetaBits) && b.contains(SketchMetaBits) =>
        require(a.getLong(SketchMetaBits) == b.getLong(SketchMetaBits),
          s"histogram mantissaBits differ (${a.getLong(SketchMetaBits)} vs " +
            s"${b.getLong(SketchMetaBits)}) — mixing bucket granularities " +
            "corrupts the sketch")
      case _ => // a side read back from storage that dropped metadata
    }
    val g = state.columns.head
    state.unionByName(batch.withColumnRenamed(batch.columns.head, g))
      .groupBy(col(g), col("lo"), col("hi"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Serving view of a histogram state: the [[quantileSketch]] output —
    * keyed windows + one aggregate over the tiny histogram, no corpus
    * re-scan. */
  def quantileSketchOf(state: DataFrame, qsPermille: Seq[Int]): DataFrame = {
    requireHistogram(state, "quantileSketchOf")
    require(qsPermille.nonEmpty, "need at least one quantile")
    require(qsPermille.forall(q => q >= 1 && q <= 1000),
      s"quantiles are permille in [1, 1000], got $qsPermille")
    require(qsPermille.distinct.size == qsPermille.size,
      s"quantiles must be distinct, got $qsPermille")
    val groupCol = state.columns.head
    // the histogram is tiny (<= 64 * 2^mantissaBits rows per group), so the
    // keyed windows run on metadata-scale data — never the corpus
    val wCum = Window.partitionBy(groupCol).orderBy("lo")
    val wTot = Window.partitionBy(groupCol)
    val ranked = state
      .withColumn("__cum", sum(col("cnt")).over(wCum))
      .withColumn("__tot", sum(col("cnt")).over(wTot))
    val aggs = qsPermille.map(q =>
      min(when(col("__cum") * 1000L >= lit(q.toLong) * col("__tot"),
        col("hi"))).as(s"__q$q"))
    ranked.groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol), explode(array(qsPermille.map(q => struct(
        lit(q.toLong).as("q_permille"), col(s"__q$q").as("est"))): _*)).as("r"))
      .select(col(groupCol), col("r.q_permille").as("q_permille"),
        col("r.est").as("est"))
  }
}
