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
      qsPermille: Seq[Int], mantissaBits: Int = 6): DataFrame = {
    require(qsPermille.nonEmpty, "need at least one quantile")
    require(qsPermille.forall(q => q >= 1 && q <= 1000),
      s"quantiles are permille in [1, 1000], got $qsPermille")
    require(qsPermille.distinct.size == qsPermille.size,
      s"quantiles must be distinct, got $qsPermille")
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
    // bitlen via bin(): both Spark and DuckDB render the minimal binary
    // string (bin(0) = "0" -> bitlen 1 -> shift 0 -> exact), so the
    // bucketing replays integer-exactly in an external engine
    val hist = df.select(col(groupCol).as("__g"), v.as("__v"))
      .withColumn("__s",
        greatest(length(bin(col("__v"))) - 1 - mantissaBits, lit(0)).cast("int"))
      .withColumn("__bid", expr("shiftright(__v, __s)"))
      .groupBy("__g", "__s", "__bid").agg(count(lit(1)).as("__cnt"))
      .select(col("__g"), col("__cnt"),
        expr("shiftleft(__bid, __s)").as("__lo"),
        expr("shiftleft(__bid + 1L, __s) - 1L").as("__hi"))
    // the histogram is tiny (<= 64 * 2^mantissaBits rows per group), so the
    // keyed windows run on metadata-scale data — never the corpus
    val wCum = Window.partitionBy("__g").orderBy("__lo")
    val wTot = Window.partitionBy("__g")
    val ranked = hist
      .withColumn("__cum", sum(col("__cnt")).over(wCum))
      .withColumn("__tot", sum(col("__cnt")).over(wTot))
    val aggs = qsPermille.map(q =>
      min(when(col("__cum") * 1000L >= lit(q.toLong) * col("__tot"),
        col("__hi"))).as(s"__q$q"))
    ranked.groupBy(col("__g").as(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol), explode(array(qsPermille.map(q => struct(
        lit(q.toLong).as("q_permille"), col(s"__q$q").as("est"))): _*)).as("r"))
      .select(col(groupCol), col("r.q_permille").as("q_permille"),
        col("r.est").as("est"))
  }
}
