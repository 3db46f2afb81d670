package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic experiment assignment and lift reporting — the A/B
  * analytics shape a training/product pipeline runs at 100 TB: arm
  * membership is a PURE FUNCTION of the unit's hash (no stored assignment
  * table, no randomness — any engine replays it), and the lift report is
  * one combinable aggregate per arm plus a broadcast of the control row.
  *
  * The integer-exactness house rules apply throughout: buckets are
  * permille of the 60-bit hash, rates are truncating-DIV permille, and
  * the relative-lift ratio is evaluated in DECIMAL(38,0) so conversions ×
  * units × 1000 cannot overflow a BIGINT at any realistic scale. */
object Experiment {

  /** Assign each row to an experiment arm from its hash: bucket
    * `h % 1000` (permille), arm i covering the half-open cumulative range
    * `[Σ permille_<i, Σ permille_≤i)`. Arms are ordered (name, permille)
    * and must sum to exactly 1000 — a mis-sized split silently skews
    * every downstream metric, so it refuses here. `hashCol` must be a
    * non-negative < 2^60 BIGINT (the house hash domain — out-of-range
    * refuses at execution time); deterministic: the same unit lands in
    * the same arm forever, on any engine that can compute `% 1000`.
    *
    * Salting is the CALLER's job, in the hash projection (e.g.
    * `md5(concat(unit, ':', experiment_name))`): two experiments salted
    * differently get independent splits from the same unit population. */
  def assign(df: DataFrame, hashCol: String,
      arms: Seq[(String, Int)]): DataFrame = {
    require(arms.nonEmpty, "need at least one arm")
    require(arms.map(_._1).distinct.size == arms.size,
      s"arm names must be distinct, got ${arms.map(_._1).mkString(", ")}")
    require(arms.forall(_._2 > 0),
      s"arm permilles must be positive, got ${arms.mkString(", ")}")
    require(arms.map(_._2).sum == 1000,
      s"arm permilles must sum to 1000, got ${arms.map(_._2).sum}")
    // NULL is in the guard too: a null hash would otherwise flow through
    // as arm = NULL — a silent unassigned bucket no report would surface
    val guarded = when(col(hashCol).isNull ||
        col(hashCol) < 0 || col(hashCol) >= (1L << 60),
        raise_error(concat(lit("graft experiment: hash outside [0, 2^60) ("),
          coalesce(col(hashCol).cast("string"), lit("NULL")),
          lit(") — fix the hash projection upstream"))))
      .otherwise(col(hashCol))
    val bucket = guarded % 1000
    val cums = arms.map(_._2).scanLeft(0)(_ + _).tail
    val arm = arms.zip(cums).tail.foldLeft(
      when(bucket < cums.head, lit(arms.head._1))) {
        case (acc, ((name, _), cum)) => acc.when(bucket < cum, lit(name))
      }
    df.withColumn("arm", arm)
  }

  /** Sample-ratio-mismatch check — the experiment-safety gate every lift
    * report should be conditioned on: a split whose OBSERVED arm shares
    * drift from the configured permilles means assignment or logging is
    * broken (bot filtering one arm, a redirect dropping traffic, a
    * client-side bug), and any lift computed on it is noise. Per arm:
    * observed units, expected vs observed permille (truncating DIV — both
    * engines agree), the signed deviation, and `srm_flag` when |deviation|
    * exceeds `thresholdPermille`. Arms with ZERO observed units still
    * report (their absence is exactly the signal — they ride in via the
    * arms spec, not the data). One combinable count per arm + a broadcast
    * of the |arms|-row spec; integer-exact throughout. */
  def srmCheck(assigned: DataFrame, armCol: String,
      arms: Seq[(String, Int)], thresholdPermille: Int = 50): DataFrame = {
    require(arms.nonEmpty, "need at least one arm")
    require(arms.map(_._1).distinct.size == arms.size,
      s"arm names must be distinct, got ${arms.map(_._1).mkString(", ")}")
    require(arms.forall(_._2 > 0),
      s"arm permilles must be positive, got ${arms.mkString(", ")}")
    require(arms.map(_._2).sum == 1000,
      s"arm permilles must sum to 1000, got ${arms.map(_._2).sum}")
    require(thresholdPermille >= 1 && thresholdPermille <= 1000,
      s"thresholdPermille must be in [1, 1000], got $thresholdPermille")
    val spark = assigned.sparkSession
    import scala.jdk.CollectionConverters._
    val spec = spark.createDataFrame(
      arms.map { case (n, p) =>
        org.apache.spark.sql.Row(n, p.toLong) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("arm",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("expected_permille",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val observed = assigned.groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("units"))
    // an arm name outside the spec means the assignment and the check
    // disagree about the experiment — refuse rather than silently
    // dropping its units from the ratio
    val joined = observed.join(broadcast(spec), Seq("arm"), "full")
      .withColumn("arm",
        when(col("expected_permille").isNull,
          raise_error(concat(lit("graft experiment: arm '"), col("arm"),
            lit("' in the data but not in the srmCheck spec — " +
              "the split being checked is not the split that ran"))))
          .otherwise(col("arm")))
      .withColumn("units", coalesce(col("units"), lit(0L)))
    val total = observed.agg(sum(col("units")).as("__tot"))
    joined.crossJoin(broadcast(total))
      .withColumn("observed_permille",
        when(col("__tot").isNull || col("__tot") === 0, lit(0L))
          .otherwise(expr("units * 1000 DIV __tot")))
      .withColumn("deviation_permille",
        col("observed_permille") - col("expected_permille"))
      .withColumn("srm_flag",
        abs(col("deviation_permille")) > thresholdPermille)
      .select("arm", "units", "expected_permille", "observed_permille",
        "deviation_permille", "srm_flag")
  }

  /** Per-arm conversion/value report with relative lift vs the named
    * control arm. `units` must be ONE ROW PER UNIT (pre-aggregate events
    * first — a per-event feed would double-count multi-event units, so a
    * non-0/1 `convCol` refuses at execution time):
    *
    *  - units, conversions, value_sum: combinable per-arm sums
    *  - conv_permille = conversions·1000 DIV units
    *  - lift_permille = (conv_a·units_c·1000) DIV (conv_c·units_a) − 1000
    *    — the relative conversion-rate lift in permille of the control
    *    rate, integer-exact in DECIMAL(38,0); 0 for the control row
    *    itself, NULL when the control never converted (no rate to be
    *    relative to)
    *
    * Shape at scale: one map-side-combinable groupBy over the unit
    * relation, then the single control row joined back BROADCAST — the
    * per-arm table is |arms| rows whatever the population. */
  def lift(units: DataFrame, armCol: String, convCol: String,
      valueCol: Option[String], controlArm: String): DataFrame = {
    val conv = when(col(convCol) === 0 || col(convCol) === 1, col(convCol))
      .otherwise(raise_error(concat(
        lit(s"graft experiment: $convCol must be 0/1 per unit ("),
        col(convCol).cast("string"),
        lit(") — pre-aggregate events to one row per unit"))))
    val aggs = Seq(
      count(lit(1)).as("units"),
      sum(conv).cast("long").as("conversions")) ++
      valueCol.map(v => sum(col(v)).cast("long").as("value_sum")).toSeq
    val perArm = units.groupBy(col(armCol).as("arm")).agg(aggs.head, aggs.tail: _*)
    // exactly ONE control row even when the arm is absent — in which case
    // the report refuses loudly instead of silently vanishing (a cross
    // join against an empty filter would return zero rows)
    val control = perArm.agg(
      max(when(col("arm") === controlArm, col("units"))).as("__uc"),
      max(when(col("arm") === controlArm, col("conversions"))).as("__cc"))
    perArm.crossJoin(broadcast(control))
      // the guard rides the always-projected `units` column (NOT the
      // arithmetic below): a null operand inside the decimal ratio
      // short-circuits before a nested raise_error can fire, so a missing
      // control would otherwise read as silent NULL lift
      .withColumn("units",
        when(col("__uc").isNull,
          raise_error(lit(s"graft experiment: control arm '$controlArm' has " +
            "no units — lift is relative to the control rate")))
          .otherwise(col("units")))
      .withColumn("conv_permille", expr("conversions * 1000 DIV units"))
      .withColumn("lift_permille",
        when(col("arm") === controlArm, lit(0L))
          .when(col("__cc") === 0, lit(null).cast("long"))
          .otherwise(expr("CAST((CAST(conversions AS DECIMAL(38,0)) * __uc * 1000) " +
            "DIV (CAST(__cc AS DECIMAL(38,0)) * units) - 1000 AS BIGINT)")))
      .drop("__uc", "__cc")
  }
}
