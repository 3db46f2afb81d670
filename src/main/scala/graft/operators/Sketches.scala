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
    // bucketing replays integer-exactly in an external engine. NULL
    // values carry no rank mass: unfiltered they would form a null
    // bucket that inflates every total (and Spark's nulls-FIRST window
    // order would bias the estimates low where DuckDB sorts nulls last)
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), v.as("__v"))
      .withColumn("__s",
        greatest(length(bin(col("__v"))) - 1 - mantissaBits, lit(0)).cast("int"))
      .withColumn("__bid", expr("shiftright(__v, __s)"))
      .groupBy("__g", "__s", "__bid").agg(count(lit(1)).as("cnt"))
      .select(col("__g").as(groupCol),
        expr("shiftleft(__bid, __s)").as("lo", meta),
        expr("shiftleft(__bid + 1L, __s) - 1L").as("hi"),
        col("cnt"))
  }

  /** WEIGHTED [[quantileSketchHistogram]]: each row contributes
    * `weightCol` units of mass instead of 1 — the token-weighted /
    * byte-weighted percentile shape ("the doc length such that half the
    * TOKENS live in shorter docs"). The histogram schema, folds
    * ([[quantileSketchFold]] — weights add exactly like counts), and the
    * rank-covering serving ([[quantileSketchOf]]) are IDENTICAL, so the
    * whole downstream machinery is shared. `weightCol` must be integral
    * and POSITIVE (zero-mass rows would silently vanish — filter
    * upstream if that is intended; negatives corrupt the cumulative). */
  def quantileSketchHistogramWeighted(
      df: DataFrame, groupCol: String, valueCol: String, weightCol: String,
      mantissaBits: Int = 6): DataFrame = {
    require(mantissaBits >= 0 && mantissaBits <= 16,
      s"mantissaBits must be in [0, 16], got $mantissaBits")
    val integral: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    require(integral.contains(df.schema(valueCol).dataType),
      s"valueCol $valueCol must be integral (got ${df.schema(valueCol).dataType})")
    require(integral.contains(df.schema(weightCol).dataType),
      s"weightCol $weightCol must be integral (got ${df.schema(weightCol).dataType})")
    val v = when(col(valueCol) < 0, raise_error(concat(
        lit(s"graft quantileSketch: negative value in $valueCol ("),
        col(valueCol).cast("string"),
        lit(") — the binary-bucket rule needs non-negative values"))))
      .otherwise(col(valueCol).cast("long"))
    val w = when(col(weightCol) <= 0, raise_error(concat(
        lit(s"graft quantileSketch: non-positive weight in $weightCol ("),
        col(weightCol).cast("string"),
        lit(") — weighted mass must be positive"))))
      .otherwise(col(weightCol).cast("long"))
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(SketchMetaBits, mantissaBits.toLong).build()
    // same null hygiene as the unweighted histogram: null value or null
    // weight carries no mass
    df.filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .select(col(groupCol).as("__g"), v.as("__v"), w.as("__w"))
      .withColumn("__s",
        greatest(length(bin(col("__v"))) - 1 - mantissaBits, lit(0)).cast("int"))
      .withColumn("__bid", expr("shiftright(__v, __s)"))
      .groupBy("__g", "__s", "__bid").agg(sum(col("__w")).as("cnt"))
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

  // ------------------------------------------------------------------- HLL

  private val HllMetaP = "graft.hll.p"
  private val HllMetaBits = "graft.hll.hashBits"

  /** The HLL bias-correction constant α_m scaled to MICROS — an integer
    * single-sourced here and interpolated into both the Spark estimate
    * expression and the DuckDB oracle (the dsirExpTableX1e6 discipline),
    * so the two engines cannot diverge on a floating-point constant. The
    * classic practical values from the HyperLogLog paper (α₁₆ = 0.673,
    * α₃₂ = 0.697, α₆₄ = 0.709, α_m = 0.7213/(1 + 1.079/m) above). */
  def hllAlphaMicro(p: Int): Long = p match {
    case 4 => 673000L
    case 5 => 697000L
    case 6 => 709000L
    case _ => math.floor(721300.0 / (1.0 + 1.079 / (1L << p))).toLong
  }

  /** The raw-HLL integer estimate from a `sum_inv` column:
    * `est = (α_micro · m² · 2^Q) DIV (sum_inv · 10^6)` with
    * `Q = hashBits − p + 1`, evaluated in DECIMAL(38,0) (the factors
    * individually fit a BIGINT but their product does not; the full
    * product tops out near 2^p·2^62·10^6 ≈ 10^31 « 10^38). NO
    * small-range linear-counting correction: ln() is not integer-exactly
    * replayable across engines, so the raw formula (biased high below
    * ~5m/2 true distinct) is the whole contract — `zero_regs` is emitted
    * so callers can see when LC would have applied, and [[TextCorpus
    * .distinctSketch]]'s KMV covers the exact-small regime. */
  private[graft] def hllEstimateFromSumInv(p: Int, hashBits: Int): org.apache.spark.sql.Column = {
    val m = 1L << p
    val q = hashBits - p + 1
    expr(s"CAST((CAST(${hllAlphaMicro(p)} AS DECIMAL(38,0)) * " +
      s"CAST(${m * m} AS DECIMAL(38,0)) * CAST(${1L << q} AS DECIMAL(38,0))) DIV " +
      "(CAST(sum_inv AS DECIMAL(38,0)) * CAST(1000000 AS DECIMAL(38,0))) AS BIGINT)")
  }

  /** (zero_regs, sum_inv) from an HLL register array column: the two
    * integer sufficient statistics of the estimate —
    * `sum_inv = Σ_j 2^(Q − M[j])` (the 2^Q-denominator rational form of
    * Σ 2^−M[j]; an untouched register contributes 2^Q exactly via
    * `Q − 0`). Higher-order array functions, codegen-friendly, no
    * explode. */
  private[graft] def hllStatsCols(p: Int, hashBits: Int,
      regsCol: String): Seq[org.apache.spark.sql.Column] = {
    val q = hashBits - p + 1
    Seq(
      expr(s"CAST(size(filter($regsCol, r -> r = 0)) AS BIGINT)").as("zero_regs"),
      expr(s"aggregate($regsCol, CAST(0 AS BIGINT), " +
        s"(acc, r) -> acc + shiftleft(CAST(1 AS BIGINT), $q - r))").as("sum_inv"))
  }

  /** Per-group HyperLogLog distinct estimate, integer-exact and
    * hash-deterministic: `m = 2^p` register maxima over a caller-supplied
    * non-negative `hashBits`-bit hash column
    * ([[graft.functions.NativeAgg.hllRegisters]]), reduced to
    * (group, zero_regs, sum_inv, est_distinct) — every number replayable
    * bit-for-bit by the DuckDB oracle (register split via shifts, rho via
    * `length(bin(rem))`, the estimate via the single-sourced
    * [[hllAlphaMicro]] in HUGEINT division).
    *
    * vs [[TextCorpus.distinctSketch]]'s KMV: HLL state is FIXED-SIZE
    * (m bytes — no TreeSet churn on hash-ordered inserts) and its merge is
    * element-wise max — idempotent and commutative, the strongest fold
    * class, so the persisted form ([[hllRegisterState]]/[[hllFold]]) is
    * replay-safe with NO txn guard. KMV wins when counts below k must be
    * exact. Relative error ~1.04/√m (~13% at p = 6, ~3% at p = 10).
    * Shape at scale: ONE shuffle keyed by group with O(m) map-side
    * partial states — no corpus-sized distinct, no per-group sort. */
  def hllSketch(
      df: DataFrame, groupCol: String, hashCol: String,
      p: Int, hashBits: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(graft.functions.NativeAgg.hllRegisters(col(hashCol), p, hashBits)
        .as("__regs"))
      .select((col(groupCol) +: hllStatsCols(p, hashBits, "__regs")): _*)
      .withColumn("est_distinct", hllEstimateFromSumInv(p, hashBits))

  /** The PERSISTED form of [[hllSketch]]: the nonzero registers as
    * relational (group, reg, rho) rows — at most m per group, a
    * Delta-friendly state table. `p`/`hashBits` are stamped in the `reg`
    * column's metadata so a mismatched fold refuses instead of silently
    * mixing register geometries. Fold with [[hllFold]] (element-wise max:
    * idempotent AND commutative — late data, replays, and any batch order
    * are exact by construction, no txnApplied guard needed, unlike the
    * count-additive histogram folds); serve with [[hllOf]]. */
  def hllRegisterState(
      df: DataFrame, groupCol: String, hashCol: String,
      p: Int, hashBits: Int): DataFrame = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(HllMetaP, p.toLong).putLong(HllMetaBits, hashBits.toLong).build()
    df.groupBy(col(groupCol))
      .agg(graft.functions.NativeAgg.hllRegisters(col(hashCol), p, hashBits)
        .as("__regs"))
      .select(col(groupCol), posexplode(col("__regs")).as(Seq("reg", "rho")))
      .filter(col("rho") > 0)
      .select(col(groupCol), col("reg").as("reg", meta), col("rho"))
  }

  private def requireHllState(state: DataFrame, op: String): Unit =
    require(state.columns.length == 3 &&
      state.columns.drop(1).toSeq == Seq("reg", "rho"),
      s"$op expects an hllRegisterState (group, reg, rho), " +
        s"got ${state.columns.mkString(", ")}")

  private def hllStamp(df: DataFrame): Option[(Long, Long)] = {
    val m = df.schema("reg").metadata
    if (m.contains(HllMetaP) && m.contains(HllMetaBits))
      Some((m.getLong(HllMetaP), m.getLong(HllMetaBits)))
    else None // read back from storage that dropped metadata
  }

  /** Fold a new batch's register state into a persisted one: per
    * (group, reg) the rho MAXIMUM — one tiny aggregate over
    * register-count-sized data. Max is idempotent, so replaying a batch
    * (or folding overlapping batches) cannot corrupt the state. Both
    * sides must carry the same geometry stamp when stamps survived
    * storage. */
  def hllFold(state: DataFrame, batch: DataFrame): DataFrame = {
    requireHllState(state, "hllFold")
    requireHllState(batch, "hllFold")
    (hllStamp(state), hllStamp(batch)) match {
      case (Some(a), Some(b)) =>
        require(a == b,
          s"hll register geometries differ (p/hashBits $a vs $b) — mixing " +
            "them corrupts the sketch")
      case _ =>
    }
    val g = state.columns.head
    state.unionByName(batch.withColumnRenamed(batch.columns.head, g))
      .groupBy(col(g), col("reg"))
      .agg(max(col("rho")).as("rho"))
  }

  /** Serving view of an [[hllRegisterState]]: the [[hllSketch]] output
    * computed from the stored nonzero registers (absent registers
    * contribute 2^Q each) — one aggregate over the tiny state, no corpus
    * re-scan. A stored rho outside [1, Q] refuses loudly at execution
    * time (a silent negative shift would corrupt the estimate). */
  def hllOf(state: DataFrame, p: Int, hashBits: Int): DataFrame = {
    requireHllState(state, "hllOf")
    hllStamp(state).foreach { case (sp, sb) =>
      require(sp == p.toLong && sb == hashBits.toLong,
        s"state is stamped p=$sp/hashBits=$sb but hllOf was called with " +
          s"p=$p/hashBits=$hashBits")
    }
    val g = state.columns.head
    val m = 1L << p
    val q = hashBits - p + 1
    val term = when(col("rho") < 1 || col("rho") > q, raise_error(concat(
        lit(s"graft hllOf: stored rho outside [1, $q] ("),
        col("rho").cast("string"),
        lit(") — the state does not match this register geometry"))))
      .otherwise(expr(s"shiftleft(CAST(1 AS BIGINT), $q - rho)"))
    state.groupBy(col(g))
      .agg(count(lit(1)).as("__nz"), sum(term).as("__si"))
      .select(col(g),
        (lit(m) - col("__nz")).cast("long").as("zero_regs"),
        (col("__si") + (lit(m) - col("__nz")) * lit(1L << q)).cast("long")
          .as("sum_inv"))
      .withColumn("est_distinct", hllEstimateFromSumInv(p, hashBits))
  }

  // ---------------------------------------------------- PERSISTED KMV STATE

  private val KmvMetaK = "graft.kmv.k"

  /** The PERSISTED form of the KMV distinct sketch
    * ([[TextCorpus.distinctSketch]]): each group's kept set as relational
    * (group, h) rows — at most k per group, a Delta-friendly state table
    * that serves the distinct estimate ([[kmvOf]]) AND the pairwise
    * set-overlap algebra ([[kmvOverlapOf]]) without the corpus. `k` is
    * stamped in the `h` column's metadata; a mismatched fold refuses.
    * The fold ([[kmvFold]]) is distinct-union-then-trim — IDEMPOTENT and
    * commutative like the HLL register max, so replays and late data are
    * exact with no txn guard. */
  def kmvState(
      df: DataFrame, groupCol: String, hashCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(KmvMetaK, k.toLong).build()
    df.groupBy(col(groupCol))
      .agg(graft.functions.NativeAgg.kMinDistinct(col(hashCol), k).as("__mins"))
      .select(col(groupCol), explode(col("__mins")).as("h"))
      .select(col(groupCol), col("h").as("h", meta))
  }

  private def requireKmvState(state: DataFrame, op: String, k: Int): Unit = {
    require(state.columns.length == 2 && state.columns(1) == "h",
      s"$op expects a kmvState (group, h), got ${state.columns.mkString(", ")}")
    val m = state.schema("h").metadata
    if (m.contains(KmvMetaK))
      require(m.getLong(KmvMetaK) == k.toLong,
        s"state is stamped k=${m.getLong(KmvMetaK)} but $op was called " +
          s"with k=$k — mixing capacities corrupts the sketch")
  }

  /** Fold a batch into a persisted KMV kept set: distinct union, trimmed
    * back to the k smallest per group — one aggregate over ≤ 2k rows per
    * group. Idempotent: re-folding a batch (or folding overlapping
    * batches) cannot move the kept set. */
  def kmvFold(state: DataFrame, batch: DataFrame, k: Int): DataFrame = {
    requireKmvState(state, "kmvFold", k)
    requireKmvState(batch, "kmvFold", k)
    val g = state.columns.head
    kmvState(
      state.unionByName(batch.withColumnRenamed(batch.columns.head, g)),
      g, "h", k)
  }

  /** Serving view of a [[kmvState]]: the [[TextCorpus.distinctSketch]]
    * output — (group, n_kept, kth_min, est_distinct) — from the stored
    * kept rows alone (they ARE the sketch: count + max + the integer
    * estimate). */
  def kmvOf(state: DataFrame, k: Int, hashBound: Long): DataFrame = {
    requireKmvState(state, "kmvOf", k)
    require(hashBound > 0, s"hashBound must be positive, got $hashBound")
    val g = state.columns.head
    state.groupBy(col(g))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_min"))
      .select(col(g), col("n_kept"),
        col("kth_min"),
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(
            s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * $hashBound) DIV " +
              "(CAST(kth_min AS DECIMAL(38,0)) + 1) AS BIGINT)"))
          .as("est_distinct"))
  }

  /** Pairwise set-overlap algebra served from a [[kmvState]]: the stored
    * kept rows re-aggregate into exactly the kept sets [[distinctOverlap]]
    * builds from the corpus, so the delegation is literal — audience
    * overlap between any two groups without re-scanning anything. */
  def kmvOverlapOf(state: DataFrame, k: Int, hashBound: Long): DataFrame = {
    requireKmvState(state, "kmvOverlapOf", k)
    distinctOverlap(state, state.columns.head, "h", k, hashBound)
  }

  // ------------------------------------------------------ QUANTILE TRANSFORM

  /** PER-ROW percentile features from the mergeable sketch (the quantile
    * feature transform): each row's value mapped to its estimated rank
    * permille within its group — `est_permille = (cum·1000) DIV total`
    * where `cum` is the cumulative count through the row's OWN covering
    * bucket (the sketch's rank-covering convention: the reported permille
    * is the largest q this bucket's upper edge covers). Integer-exact and
    * replayable: the row recomputes its bucket id with the same
    * `bitlen − mantissaBits` arithmetic the histogram used, so the join
    * key is pure projection arithmetic.
    *
    * Shape at scale: the histogram's one combinable GROUP BY, one keyed
    * cumulative window over the TINY histogram, then a BROADCAST join
    * back over a second pushdown-friendly scan — per-row work is codegen
    * arithmetic, no sort, no corpus window (the naive
    * `percent_rank() OVER (PARTITION BY g ORDER BY v)` sorts every group
    * at corpus scale; this is the 100 TB form, at 2^−mantissaBits rank
    * resolution). Output: the input columns + `est_permille` (null only
    * for null values). Same non-negative-integral contract as
    * [[quantileSketchHistogram]]. */
  def quantileTransform(
      df: DataFrame, groupCol: String, valueCol: String,
      mantissaBits: Int = 6): DataFrame = {
    require(!df.columns.exists(_.startsWith("__")),
      "quantileTransform input must not carry __-prefixed columns")
    val hist = quantileSketchHistogram(df, groupCol, valueCol, mantissaBits)
    val wCum = Window.partitionBy(groupCol).orderBy("lo")
    val wTot = Window.partitionBy(groupCol)
    val cum = hist
      .withColumn("__cum", sum(col("cnt")).over(wCum))
      .withColumn("__tot", sum(col("cnt")).over(wTot))
      .select(col(groupCol), col("lo").as("__lo"), col("__cum"), col("__tot"))
    val vLong = col(valueCol).cast("long")
    val rowLo = expr(
      s"shiftleft(shiftright(CAST(`$valueCol` AS BIGINT), " +
        s"greatest(length(bin(CAST(`$valueCol` AS BIGINT))) - 1 - $mantissaBits, 0)), " +
        s"greatest(length(bin(CAST(`$valueCol` AS BIGINT))) - 1 - $mantissaBits, 0))")
    df.withColumn("__lo", when(vLong.isNotNull, rowLo))
      .join(broadcast(cum), Seq(groupCol, "__lo"), "left")
      .withColumn("est_permille",
        when(vLong.isNotNull, expr("(__cum * 1000) DIV __tot")))
      .drop("__lo", "__cum", "__tot")
  }

  // ---------------------------------------------------- ROBUST OUTLIER FENCES

  /** ROBUST per-group outlier fences (the Tukey box-plot rule on sketch
    * quantiles, integer-exactly): lower/upper quartile estimates from the
    * mergeable [[quantileSketch]], fence = `q_hi + (fencePermille·IQR)
    * DIV 1000` (and the mirrored lower fence), plus the group's count of
    * rows outside the fences — the drift/anomaly census step of a feature
    * pipeline ("how many of today's prices are implausible"), with NO
    * per-group sort and no floating point: the whole statistic is the
    * sketch's (replayable) rank rule plus integer arithmetic, so the
    * oracle replays fences AND counts bit-for-bit.
    *
    * Shape at scale: the sketch histogram's one combinable GROUP BY, the
    * tiny keyed serving windows, then ONE more corpus pass counting
    * against the BROADCAST fences (|groups| rows). Two scans total, both
    * pushdown-friendly. Returns (group, q_low, q_high, fence_low,
    * fence_high, n_below, n_above, n_rows). `valueCol` non-negative
    * integral (the [[quantileSketchHistogram]] contract). */
  def robustOutlierFences(
      df: DataFrame, groupCol: String, valueCol: String,
      lowPermille: Int = 250, highPermille: Int = 750,
      fencePermille: Long = 1500L, mantissaBits: Int = 6): DataFrame = {
    require(lowPermille < highPermille,
      s"lowPermille ($lowPermille) must be < highPermille ($highPermille)")
    require(fencePermille >= 0, s"fencePermille must be >= 0, got $fencePermille")
    val qs = quantileSketch(df, groupCol, valueCol,
        Seq(lowPermille, highPermille), mantissaBits)
    val fences = qs.groupBy(col(groupCol))
      .agg(
        max(when(col("q_permille") === lowPermille, col("est"))).as("q_low"),
        max(when(col("q_permille") === highPermille, col("est"))).as("q_high"))
      .withColumn("__iqr", col("q_high") - col("q_low"))
      .withColumn("fence_low",
        col("q_low") - expr(s"($fencePermille * __iqr) DIV 1000"))
      .withColumn("fence_high",
        col("q_high") + expr(s"($fencePermille * __iqr) DIV 1000"))
      .drop("__iqr")
    df.select(col(groupCol), col(valueCol).cast("bigint").as("__v"))
      .join(broadcast(fences), Seq(groupCol))
      .groupBy(col(groupCol), col("q_low"), col("q_high"),
        col("fence_low"), col("fence_high"))
      .agg(
        sum(when(col("__v") < col("fence_low"), 1L).otherwise(0L)).as("n_below"),
        sum(when(col("__v") > col("fence_high"), 1L).otherwise(0L)).as("n_above"),
        count(lit(1)).as("n_rows"))
  }

  // ------------------------------------------------------- KMV SET OVERLAP

  /** AUDIENCE-OVERLAP sketch: for every PAIR of groups, the estimated
    * distinct UNION, INTERSECTION, and Jaccard of their key sets — from
    * nothing but each group's KMV kept set ([[graft.functions.NativeAgg
    * .kMinDistinct]]), the classic theta-sketch-style set algebra on the
    * deterministic KMV: the k smallest hashes of A∪B are computable from
    * the two kept sets alone, the intersection estimate is the shared
    * fraction of those union minima scaled by the union estimate
    * (`(shared·est_union) DIV k`), and below capacity everything is EXACT
    * (kept sets are complete). All integer, hash-deterministic,
    * oracle-replayable — "what fraction of purchasers also viewed"
    * without ever shuffling the key domain.
    *
    * Shape at scale: ONE corpus shuffle into O(k) partial sketch states
    * per group; the pairing is a tiny |groups|² nested-loop join over
    * k-length arrays (metadata-scale by construction — this operator is
    * for FEW groups with HUGE key sets, the audience shape). Returns
    * (group_a, group_b, n_union_kept, shared, est_union,
    * est_intersection, jaccard_permille) for group_a < group_b;
    * `jaccard_permille = shared·1000 DIV n_union_kept` (the sample
    * Jaccard over the union minima — the standard KMV Jaccard estimator).
    * A group whose hashes are all null keeps an empty set and pairs with
    * zero overlap rather than dividing by zero. */
  def distinctOverlap(
      df: DataFrame, groupCol: String, hashCol: String, k: Int,
      hashBound: Long): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(hashBound > 0, s"hashBound must be positive, got $hashBound")
    val kept = df.groupBy(col(groupCol))
      .agg(graft.functions.NativeAgg.kMinDistinct(col(hashCol), k).as("__mins"))
    val a = kept.select(col(groupCol).as("group_a"), col("__mins").as("__ma"))
    val b = kept.select(col(groupCol).as("group_b"), col("__mins").as("__mb"))
    a.join(b, col("group_a") < col("group_b"))
      .withColumn("__mu", expr(s"slice(array_sort(array_union(__ma, __mb)), 1, $k)"))
      .withColumn("n_union_kept", size(col("__mu")).cast("long"))
      .withColumn("shared", expr(
        "CAST(size(filter(__mu, x -> array_contains(__ma, x) AND " +
          "array_contains(__mb, x))) AS BIGINT)"))
      .withColumn("est_union",
        when(col("n_union_kept") < k, col("n_union_kept"))
          .otherwise(expr(
            s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * $hashBound) DIV " +
              "(CAST(element_at(__mu, -1) AS DECIMAL(38,0)) + 1) AS BIGINT)")))
      .withColumn("est_intersection",
        // the product in DECIMAL: shared·est_union can pass 2^63 long
        // before the DIV k brings it back under
        when(col("n_union_kept") < k, col("shared"))
          .otherwise(expr(
            s"CAST((CAST(shared AS DECIMAL(38,0)) * est_union) DIV $k AS BIGINT)")))
      .withColumn("jaccard_permille",
        when(col("n_union_kept") > 0,
          expr("(shared * 1000) DIV n_union_kept")).otherwise(lit(0L)))
      .select(col("group_a"), col("group_b"), col("n_union_kept"),
        col("shared"), col("est_union"), col("est_intersection"),
        col("jaccard_permille"))
  }

  // ------------------------------------------------------------- COUNT-MIN

  private val CmMetaDepth = "graft.cm.depth"
  private val CmMetaWidth = "graft.cm.width"

  /** The count-min row-hash family: `cell_i = ((h·A_i + B_i) mod P) mod w`
    * over the Mersenne prime P = 2^61 − 1 — pairwise-independent affine
    * mixing of a caller-supplied non-negative < 2^60 hash, evaluated in
    * DECIMAL(38,0) on the Spark side and HUGEINT in the DuckDB oracle
    * (h·A < 2^122 < 10^38, exact in both). The constants are fixed odd
    * literals single-sourced here ([[countMinHashRows]] renders them as a
    * SQL VALUES list for the oracle, the dsirExpTableX1e6 discipline). */
  val CountMinPrime: Long = (1L << 61) - 1

  private val CmA: Seq[Long] = Seq(
    1442695040888963407L, 2135587861249771037L, 1865811235122147685L,
    1500450271778919287L, 2267938413291871493L, 1172496131513750981L,
    2017843553382926341L, 1646781227196597011L)

  private val CmB: Seq[Long] = Seq(
    1013904223L, 1779033703L, 2600822924L, 374761393L,
    3144134277L, 1359893119L, 2773480762L, 1160927853L)

  /** The (i, a, b) rows of the hash family as a SQL VALUES body, for
    * interpolation into DuckDB oracles: "(0, A0, B0), (1, A1, B1), …". */
  def countMinHashRows(depth: Int): String =
    (0 until depth).map(i => s"($i, ${CmA(i)}, ${CmB(i)})").mkString(", ")

  private def cmCell(i: Int, hashCol: String, width: Int): org.apache.spark.sql.Column =
    expr(s"CAST(CAST((CAST($hashCol AS DECIMAL(38,0)) * ${CmA(i)} + ${CmB(i)}) " +
      s"% $CountMinPrime AS BIGINT) % $width AS BIGINT)")

  private def requireCmGeometry(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= CmA.size,
      s"depth must be in [1, ${CmA.size}], got $depth")
    require(width >= 16 && width <= (1 << 20),
      s"width must be in [16, 2^20], got $width")
  }

  /** COUNT-MIN frequency sketch state: the d×w cell counts as relational
    * (row, cell, cnt) rows — at most depth·width of them, whatever the
    * corpus size. Counts are ADDITIVE (fold = [[countMinFold]], same
    * replay rules as the quantile histogram: commutative and order-free
    * but NOT idempotent — replay protection is the ingest's job), and the
    * whole sketch is hash-deterministic, so an external engine replays
    * every cell and every point estimate bit-for-bit.
    *
    * vs [[graft.functions.NativeAgg.misraGries]]: MG answers "which items
    * are frequent" (a candidate set, needs a second exact pass); count-min
    * answers "how frequent is THIS item, later, without the corpus" —
    * the persisted point-query form. Estimates overcount only
    * (`est ≥ true`, within `2n/w` at probability `1 − 2^−d`).
    *
    * Shape at scale: one narrow projection computing the d cells per row
    * (codegen arithmetic, no string hashing beyond the caller's one md5),
    * a bounded posexplode (d copies), and ONE combinable groupBy of
    * ≤ d·w cells — map-side partials collapse the corpus before the
    * shuffle. `hashCol` must be a non-negative < 2^60 BIGINT (out-of-range
    * refuses loudly at execution time); nulls are skipped. */
  def countMinState(
      df: DataFrame, hashCol: String, depth: Int, width: Int): DataFrame = {
    requireCmGeometry(depth, width)
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(CmMetaDepth, depth.toLong).putLong(CmMetaWidth, width.toLong)
      .build()
    val guarded = when(col(hashCol) < 0 || col(hashCol) >= (1L << 60),
        raise_error(concat(lit("graft countMin: hash outside [0, 2^60) ("),
          col(hashCol).cast("string"),
          lit(") — fix the hash projection upstream"))))
      .otherwise(col(hashCol))
    df.filter(col(hashCol).isNotNull)
      .select(guarded.as("__h"))
      .select(posexplode(array((0 until depth).map(i => cmCell(i, "__h", width)): _*))
        .as(Seq("row", "cell")))
      .groupBy(col("row"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("row").cast("int").as("row", meta), col("cell"), col("cnt"))
  }

  private def requireCmState(state: DataFrame, op: String): Unit =
    require(state.columns.toSeq == Seq("row", "cell", "cnt"),
      s"$op expects a countMinState (row, cell, cnt), " +
        s"got ${state.columns.mkString(", ")}")

  private def cmStamp(df: DataFrame): Option[(Long, Long)] = {
    val m = df.schema("row").metadata
    if (m.contains(CmMetaDepth) && m.contains(CmMetaWidth))
      Some((m.getLong(CmMetaDepth), m.getLong(CmMetaWidth)))
    else None
  }

  /** Fold a new batch's cell counts into a persisted state: counts add per
    * (row, cell) — one tiny aggregate over ≤ 2·d·w rows. Geometry stamps
    * must match when both survived storage (mixing widths corrupts every
    * estimate). */
  def countMinFold(state: DataFrame, batch: DataFrame): DataFrame = {
    requireCmState(state, "countMinFold")
    requireCmState(batch, "countMinFold")
    (cmStamp(state), cmStamp(batch)) match {
      case (Some(a), Some(b)) =>
        require(a == b, s"count-min geometries differ (depth/width $a vs $b)")
      case _ =>
    }
    state.unionByName(batch)
      .groupBy(col("row"), col("cell"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Point-query a [[countMinState]]: for each probe row, the MINIMUM of
    * its d cell counts — `est_count ≥ true count` always (collisions only
    * add). The state is ≤ d·w rows and is joined BROADCAST; each probe
    * fans out d-fold through the same bounded posexplode, so the whole
    * lookup is one map-side join + one combinable min — no corpus, no
    * shuffle of the probe set beyond its own aggregate. Probe columns pass
    * through; a probe hash absent from every cell reads 0. */
  def countMinLookup(
      state: DataFrame, probes: DataFrame, hashCol: String,
      depth: Int, width: Int): DataFrame = {
    requireCmGeometry(depth, width)
    requireCmState(state, "countMinLookup")
    cmStamp(state).foreach { case (sd, sw) =>
      require(sd == depth.toLong && sw == width.toLong,
        s"state is stamped depth=$sd/width=$sw but countMinLookup was " +
          s"called with depth=$depth/width=$width")
    }
    require(!probes.columns.exists(_.startsWith("__")),
      "countMinLookup probes must not carry __-prefixed columns")
    // same domain guard as the state builder: an out-of-range probe hash
    // would otherwise map to cells no state row can occupy and silently
    // read 0 — a lookup that can only be wrong should refuse instead
    val guarded = probes.withColumn(hashCol,
      when(col(hashCol) < 0 || col(hashCol) >= (1L << 60),
        raise_error(concat(lit("graft countMin: probe hash outside [0, 2^60) ("),
          col(hashCol).cast("string"),
          lit(") — fix the hash projection upstream"))))
        .otherwise(col(hashCol)))
    val cells = guarded
      .select(probes.columns.map(col) :+
        posexplode(array((0 until depth).map(i => cmCell(i, hashCol, width)): _*))
          .as(Seq("row", "cell")): _*)
      .withColumn("row", col("row").cast("int"))
    cells.join(broadcast(state), Seq("row", "cell"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  /** WINSORIZE (clip) values at sketch-quantile fences — the outlier
    * clamp a feature pipeline applies before training: per group, values
    * below the `loPermille` estimate rise to it and values above the
    * `hiPermille` estimate drop to it; everything between passes through,
    * and NULLs stay NULL (Spark's `greatest` ignores nulls, which would
    * silently turn a null into the lo fence — guarded explicitly).
    * Fences are the [[quantileSketch]] estimates (bucket upper edges, ≤
    * 2^−mantissaBits above the true quantiles), so the whole transform is
    * integer-exact and engine-replayable — no per-group sort, ever.
    *
    * Shape at scale: one combinable histogram pass + the tiny-histogram
    * quantile serving, then the |groups|-row fence relation broadcast
    * back over a second pushdown-friendly scan (the
    * [[robustOutlierFences]] two-scan shape). Returns every input column
    * plus `<valueCol>_clipped`. */
  def winsorize(
      df: DataFrame, groupCol: String, valueCol: String,
      loPermille: Int, hiPermille: Int, mantissaBits: Int = 6): DataFrame = {
    require(loPermille >= 1 && hiPermille <= 1000 && loPermille < hiPermille,
      s"need 1 <= lo < hi <= 1000, got $loPermille/$hiPermille")
    require(!df.columns.exists(_.startsWith("__")),
      "winsorize reserves __-prefixed column names")
    val hist = quantileSketchHistogram(df, groupCol, valueCol, mantissaBits)
    val qs = quantileSketchOf(hist, Seq(loPermille, hiPermille))
    val fences = qs.groupBy(col(groupCol))
      .agg(max(when(col("q_permille") === loPermille, col("est"))).as("__lo"),
        max(when(col("q_permille") === hiPermille, col("est"))).as("__hi"))
      .withColumnRenamed(groupCol, "__fg")
    // null-SAFE join back: a NULL group is a group like any other (its
    // fences were computed above) — a plain equi-join would silently drop
    // every null-group row
    df.join(broadcast(fences), col(groupCol) <=> col("__fg"), "left")
      .withColumn(s"${valueCol}_clipped",
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(greatest(col(valueCol), col("__lo")), col("__hi"))))
      .drop("__fg", "__lo", "__hi")
  }

  /** Robust spread census — median and MAD (median absolute deviation)
    * per group, BOTH from the mergeable quantile sketch: pass 1 estimates
    * the median, pass 2 sketches `|x − median_est|` with the estimate
    * broadcast back. No per-group sort anywhere; every number is a bucket
    * upper edge, integer-exact and engine-replayable. The robust-stats
    * complement to [[robustOutlierFences]] (quartile fences): MAD is the
    * spread statistic a single 10^9-cent outlier cannot move. Returns
    * (group, median_est, mad_est). */
  def robustMad(
      df: DataFrame, groupCol: String, valueCol: String,
      mantissaBits: Int = 6): DataFrame = {
    val med = quantileSketch(df, groupCol, valueCol, Seq(500), mantissaBits)
      .select(col(groupCol).as("__mg"), col("est").as("median_est"))
    val dev = df.join(broadcast(med), col(groupCol) <=> col("__mg"), "left")
      .select(col(groupCol),
        abs(col(valueCol) - col("median_est")).as("__dev"))
    quantileSketch(dev, groupCol, "__dev", Seq(500), mantissaBits)
      .select(col(groupCol).as("__dg"), col("est").as("mad_est"))
      .join(broadcast(med), col("__dg") <=> col("__mg"))
      .select(col("__dg").as(groupCol), col("median_est"), col("mad_est"))
  }

  /** MIN-MAX feature scaling to permille: per group,
    * `(v − min)·1000 DIV (max − min)` — 0 at the group minimum, 1000 at
    * the maximum, truncating DIV so both engines agree; a constant group
    * (max = min) scales to 0, nulls stay null. One combinable min/max
    * pass + the |groups|-row stats broadcast back over a second
    * pushdown-friendly scan (the [[winsorize]] shape, exact instead of
    * sketched — use winsorize when outliers would crush the range).
    * Returns every input column plus `<valueCol>_permille`. */
  def minMaxScale(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    require(!df.columns.exists(_.startsWith("__")),
      "minMaxScale reserves __-prefixed column names")
    val stats = df.groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("__mn"), max(col(valueCol)).as("__mx"))
      .withColumnRenamed(groupCol, "__sg")
    // null-SAFE join back — the winsorize rule: null-group rows keep
    // their own group's stats instead of silently vanishing
    df.join(broadcast(stats), col(groupCol) <=> col("__sg"), "left")
      .withColumn(s"${valueCol}_permille",
        when(col(valueCol).isNull, lit(null))
          .when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(expr(s"(($valueCol - __mn) * 1000) DIV (__mx - __mn)")))
      .drop("__sg", "__mn", "__mx")
  }

  // ----------------------------------------------------------------- BLOOM

  private val BloomMetaHashes = "graft.bloom.hashes"
  private val BloomMetaBits = "graft.bloom.bits"

  /** Bits per state word. 60 (not 64) so every shift stays strictly below
    * the sign bit: `1 << 59` is a positive BIGINT in both Spark and DuckDB,
    * whereas `1 << 63` is negative in one engine and an overflow error in
    * the other — the same portability rule that caps the hash domain at
    * 2^60 everywhere else in this file. */
  val BloomBitsPerWord: Int = 60

  private def requireBloomGeometry(numHashes: Int, numBits: Int): Unit = {
    require(numHashes >= 1 && numHashes <= CmA.size,
      s"numHashes must be in [1, ${CmA.size}], got $numHashes")
    require(numBits >= 64 && numBits <= (1 << 26),
      s"numBits must be in [64, 2^26], got $numBits")
  }

  private def requireBloomState(state: DataFrame, op: String): Unit =
    require(state.columns.toSeq == Seq("word", "bits"),
      s"$op expects a bloomState (word, bits), got ${state.columns.mkString(", ")}")

  private def bloomStamp(df: DataFrame): Option[(Long, Long)] = {
    val m = df.schema("word").metadata
    if (m.contains(BloomMetaHashes) && m.contains(BloomMetaBits))
      Some((m.getLong(BloomMetaHashes), m.getLong(BloomMetaBits)))
    else None
  }

  /** The k bit indices of one hash: `bit_i = ((h·A_i + B_i) mod P) mod m`
    * — the [[countMinState]] affine-mod-Mersenne family with the SAME
    * single-sourced constants ([[countMinHashRows]] renders them for
    * oracles), so membership replays bit-for-bit in any engine with exact
    * 128-bit arithmetic. */
  private def bloomBit(i: Int, hashCol: String, numBits: Int) =
    expr(s"CAST(CAST((CAST($hashCol AS DECIMAL(38,0)) * ${CmA(i)} + ${CmB(i)}) " +
      s"% $CountMinPrime AS BIGINT) % $numBits AS BIGINT)")

  /** BLOOM membership filter state: `numBits` bits packed 60-per-word into
    * relational (word, bits) rows — at most `ceil(m/60)` of them, whatever
    * the corpus size. The fold is bitwise OR ([[bloomFold]]): idempotent
    * AND commutative, the strongest fold class ([[hllFold]]'s) — replays
    * and late data are exact with NO txn guard, which is why a Bloom
    * filter is the membership state to maintain from an at-least-once
    * stream. Probes ([[bloomProbe]]) never false-negative: an inserted
    * hash always reads `might_contain = true`; an absent one reads false
    * except with probability ≈ `(1 − e^(−kn/m))^k`, so `false` is a
    * PROOF of absence — the 100 TB "definitely new" pre-filter that
    * spares the exact dedup join for rows that cannot possibly be dupes.
    *
    * vs the sibling sketches: KMV/HLL answer "how many distinct", count-min
    * answers "how often was THIS seen", Bloom answers "was THIS seen AT
    * ALL" — in `m/8` bytes total with zero per-item state.
    *
    * Shape at scale: one narrow projection computing the k bit positions
    * per row (codegen arithmetic), a bounded posexplode (k copies), ONE
    * combinable `bit_or` groupBy of ≤ ceil(m/60) words — map-side partials
    * collapse the corpus before the shuffle. `hashCol` must be a
    * non-negative < 2^60 BIGINT (out-of-range refuses loudly at execution
    * time, the [[countMinState]] contract); nulls are skipped. Geometry is
    * stamped in the `word` column's metadata so mismatched folds/probes
    * refuse instead of silently corrupting membership. */
  def bloomState(
      df: DataFrame, hashCol: String, numHashes: Int, numBits: Int): DataFrame = {
    requireBloomGeometry(numHashes, numBits)
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(BloomMetaHashes, numHashes.toLong)
      .putLong(BloomMetaBits, numBits.toLong)
      .build()
    val guarded = when(col(hashCol) < 0 || col(hashCol) >= (1L << 60),
        raise_error(concat(lit("graft bloom: hash outside [0, 2^60) ("),
          col(hashCol).cast("string"),
          lit(") — fix the hash projection upstream"))))
      .otherwise(col(hashCol))
    df.filter(col(hashCol).isNotNull)
      .select(guarded.as("__h"))
      .select(explode(array(
        (0 until numHashes).map(i => bloomBit(i, "__h", numBits)): _*)).as("__bit"))
      .groupBy(expr(s"__bit DIV $BloomBitsPerWord").as("word"))
      .agg(expr(s"bit_or(shiftleft(CAST(1 AS BIGINT), " +
        s"CAST(__bit % $BloomBitsPerWord AS INT)))").as("bits"))
      .select(col("word").as("word", meta), col("bits"))
  }

  /** Fold a batch's words into a persisted state: bitwise OR per word —
    * one tiny aggregate over ≤ 2·ceil(m/60) rows, idempotent and
    * commutative (fold(s, s) ≡ s), so the maintainer needs no replay
    * guard. Geometry stamps must match when both survived storage (mixing
    * bit widths turns every probe into noise). */
  def bloomFold(state: DataFrame, batch: DataFrame): DataFrame = {
    requireBloomState(state, "bloomFold")
    requireBloomState(batch, "bloomFold")
    (bloomStamp(state), bloomStamp(batch)) match {
      case (Some(a), Some(b)) =>
        require(a == b, s"bloom geometries differ (hashes/bits $a vs $b)")
      case _ =>
    }
    state.unionByName(batch)
      .groupBy(col("word"))
      .agg(expr("bit_or(bits)").as("bits"))
  }

  /** Membership-probe a [[bloomState]]: for each probe row, whether ALL k
    * of its bits are set — `might_contain` true for every inserted hash
    * (never a false negative), false ⇒ provably absent. The state is
    * ≤ ceil(m/60) rows and is joined BROADCAST; each probe fans out k-fold
    * through the same bounded explode, so the lookup is one map-side join
    * + one combinable min — no shuffle of the probe set beyond its own
    * aggregate. Probe columns pass through; a word no state row occupies
    * reads as all-zero bits. */
  def bloomProbe(
      state: DataFrame, probes: DataFrame, hashCol: String,
      numHashes: Int, numBits: Int): DataFrame = {
    requireBloomGeometry(numHashes, numBits)
    requireBloomState(state, "bloomProbe")
    bloomStamp(state).foreach { case (sh, sb) =>
      require(sh == numHashes.toLong && sb == numBits.toLong,
        s"state is stamped hashes=$sh/bits=$sb but bloomProbe was " +
          s"called with hashes=$numHashes/bits=$numBits")
    }
    require(!probes.columns.exists(_.startsWith("__")),
      "bloomProbe probes must not carry __-prefixed columns")
    require(!probes.columns.contains("word") && !probes.columns.contains("bits"),
      "bloomProbe probes must not carry columns named 'word'/'bits' — " +
        "they collide with the state relation in the probe join")
    // the countMinLookup domain rule: an out-of-range probe hash maps to
    // bits no insert can have set and would silently read "absent" — a
    // lookup that can only be wrong refuses instead
    val guarded = probes.withColumn(hashCol,
      when(col(hashCol) < 0 || col(hashCol) >= (1L << 60),
        raise_error(concat(lit("graft bloom: probe hash outside [0, 2^60) ("),
          col(hashCol).cast("string"),
          lit(") — fix the hash projection upstream"))))
        .otherwise(col(hashCol)))
    val bits = guarded
      .select(probes.columns.map(col) :+
        explode(array((0 until numHashes)
          .map(i => bloomBit(i, hashCol, numBits)): _*)).as("__bit"): _*)
      .withColumn("__word", expr(s"__bit DIV $BloomBitsPerWord"))
    bits.join(broadcast(state), col("__word") === col("word"), "left")
      .withColumn("__set", expr(
        s"CAST(shiftright(coalesce(bits, CAST(0 AS BIGINT)), " +
          s"CAST(__bit % $BloomBitsPerWord AS INT)) % 2 AS INT)"))
      .groupBy(probes.columns.map(col): _*)
      .agg((min(col("__set")) === 1).as("might_contain"))
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
