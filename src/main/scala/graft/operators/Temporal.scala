package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for each left row, the most recent right
  * row with the same key and `rightTs <= leftTs` (backward direction).
  * Spark has no built-in as-of join; the naive formulation
  * (`join(key) && rightTs <= leftTs` + argmax) explodes to |L_k|×|R_k|
  * pairs per key before pruning.
  *
  * This implementation is the sort-based one-shuffle form: union both
  * sides tagged, window-partition by key ordered by (ts, side), and carry
  * the last-seen right payload forward with `last(..., ignoreNulls)` over
  * an unbounded-preceding frame. Cost is one shuffle of L+R rows and a
  * per-key sort — the same shape as a streaming merge join, and the right
  * payload rides as ONE struct column.
  *
  * Tie rule: a right row at exactly leftTs matches (right sorts before
  * left at equal ts); among right rows with equal ts the highest
  * `tieBreak` wins. All ordering is fully specified — deterministic. */
object Temporal {

  /** Exact FLOOR division for integral epoch columns (`w > 0`): SQL `DIV`
    * (IntegralDivide) truncates toward zero, so a pre-epoch (negative)
    * timestamp would land one bucket HIGH — and diverge from oracles
    * whose `//` floors (DuckDB, Python). Pure codegen arithmetic
    * (`x DIV w` minus one when the remainder is negative); identical to
    * `DIV` on the non-negative domain, exact on all of it. */
  private[graft] def floorDiv(c: String, w: Long): Column =
    expr(s"(`$c` DIV ${w}L) - (CASE WHEN `$c` % ${w}L < 0 THEN 1 ELSE 0 END)")

  private val IntegralTypes: Set[org.apache.spark.sql.types.DataType] = Set(
    org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
    org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)

  /** The as-of joins cast the LEFT timestamp to the RIGHT side's type so
    * the union's __ts column unifies; a NARROWING cast (long left against
    * int right) would silently truncate and mis-match rows. Allowed:
    * identical types, or integral widening (left's byte width ≤ right's).
    * Anything else refuses loudly — align the two (cast both to BIGINT
    * epoch) before joining. */
  private def requireLosslessTsCast(
      left: DataFrame, leftTs: String, right: DataFrame, rightTs: String,
      op: String): Unit = {
    import org.apache.spark.sql.types._
    val lt = left.schema(leftTs).dataType
    val rt = right.schema(rightTs).dataType
    def width(t: DataType): Option[Int] = t match {
      case ByteType => Some(1); case ShortType => Some(2)
      case IntegerType => Some(4); case LongType => Some(8)
      case _ => None
    }
    val ok = lt == rt || ((width(lt), width(rt)) match {
      case (Some(a), Some(b)) => a <= b
      case _ => false
    })
    require(ok, s"$op: left ts column $leftTs is $lt but right ts column " +
      s"$rightTs is $rt — casting the left side to the right's type would " +
      "narrow (silent truncation mis-matches rows); cast both sides to " +
      "BIGINT epoch before joining")
  }

  /** Bounded bucket replication for the bucketized joins: an interval is
    * copied to each `bucketWidth`-wide bucket it overlaps, so a mis-chosen
    * width (1 ms buckets against a year-long interval) would fan ONE row
    * out to billions — at best an opaque sequence-length error, at worst
    * an executor OOM. This projection refuses loudly AT EXECUTION TIME
    * (raise_error rides the explode — no extra pass, the [[funnelFold]]
    * pattern) when any single interval would replicate past
    * `maxBucketsPerInterval`, and on inverted intervals (end < start),
    * whose sequence would otherwise DESCEND and silently replicate
    * non-matching buckets. */
  private def boundedBuckets(
      startCol: String, endCol: String, bucketWidth: Long,
      maxBucketsPerInterval: Long, op: String): Column = {
    val lo = floorDiv(startCol, bucketWidth)
    val hi = floorDiv(endCol, bucketWidth)
    val n = hi - lo + lit(1L)
    explode(sequence(lo,
      when(n >= 1L && n <= maxBucketsPerInterval, hi)
        .otherwise(raise_error(concat(
          lit(s"graft $op: interval ["), col(startCol).cast("string"),
          lit(", "), col(endCol).cast("string"), lit("] spans "),
          n.cast("string"),
          lit(s" buckets at bucketWidth $bucketWidth — outside the " +
            s"[1, $maxBucketsPerInterval] maxBucketsPerInterval budget; " +
            "pick bucketWidth near the typical interval length (the " +
            "replication dial) or raise the budget explicitly, instead of " +
            "fanning one row out this wide"))))))
  }

  /** Bucketized RANGE (point-in-interval) join: every left point joins
    * every right interval containing it (`start <= point <= end`,
    * inclusive). Spark plans a bare inequality join as a broadcast
    * nested loop / cartesian — quadratic. Here both sides map onto
    * `bucketWidth`-wide buckets: an interval is replicated to each
    * bucket it overlaps, a point to exactly ONE (its own), so every
    * qualifying (point, interval) pair meets in exactly one bucket — an
    * equi-join with no dedup pass. Bucket columns are integer DIV (not
    * double `/`), so epoch-nano magnitudes keep exact arithmetic.
    *
    * `bucketWidth` is the replication dial: intervals are copied
    * ~(duration / bucketWidth + 1) times; pick it near the typical
    * interval length so replication stays O(1) per interval while
    * buckets stay selective — and `maxBucketsPerInterval` bounds it: any
    * single interval that would replicate wider (or an inverted interval,
    * end < start) refuses loudly at execution time instead of fanning one
    * row out to billions (see [[boundedBuckets]]). Both named columns must
    * be integral (epoch nanos/micros, versions, offsets…); bucket mapping
    * is FLOOR division, so pre-epoch (negative) values bucket exactly like
    * any other — no non-negativity contract. Column names must not
    * collide across the two sides (select/rename before joining). */
  def rangeJoin(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, maxBucketsPerInterval: Long = 65536L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval >= 1, "maxBucketsPerInterval must be >= 1")
    require(points.columns.intersect(intervals.columns).isEmpty,
      "rangeJoin requires disjoint column names across sides")
    require(!points.columns.contains("__b") && !intervals.columns.contains("__b"),
      "rangeJoin reserves the __b column name")
    val iv = intervals.withColumn("__b", boundedBuckets(
      startCol, endCol, bucketWidth, maxBucketsPerInterval, "rangeJoin"))
    val pt = points.withColumn("__b", floorDiv(pointCol, bucketWidth))
    pt.join(iv, "__b")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__b")
  }

  /** Bucketized INTERVAL-OVERLAP join: every left interval joins every
    * right interval it overlaps (`aStart ≤ bEnd AND bStart ≤ aEnd`,
    * inclusive on both ends) — the interval×interval sibling of
    * [[rangeJoin]]'s point-in-interval, and the batch analogue of the
    * streaming interval join. A bare overlap predicate plans as a
    * nested-loop cartesian; here BOTH sides replicate onto
    * `bucketWidth`-wide buckets and each qualifying pair meets in exactly
    * ONE: the bucket of `max(aStart, bStart)` (every overlapping pair
    * shares that bucket — the later-starting interval starts there and
    * the other spans it — and the equality filter dedupes the rest), so
    * the result needs no distinct pass. Floor-division bucketing — exact
    * pre-epoch. Column names must not collide across the two sides. */
  def intervalJoin(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketWidth: Long, maxBucketsPerInterval: Long = 65536L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxBucketsPerInterval >= 1, "maxBucketsPerInterval must be >= 1")
    require(left.columns.intersect(right.columns).isEmpty,
      "intervalJoin requires disjoint column names across sides")
    require(!left.columns.contains("__b") && !right.columns.contains("__b"),
      "intervalJoin reserves the __b column name")
    val l = left.withColumn("__b", boundedBuckets(
      lStart, lEnd, bucketWidth, maxBucketsPerInterval, "intervalJoin"))
    val r = right.withColumn("__b", boundedBuckets(
      rStart, rEnd, bucketWidth, maxBucketsPerInterval, "intervalJoin"))
    l.join(r, "__b")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__b") ===
        greatest(floorDiv(lStart, bucketWidth), floorDiv(rStart, bucketWidth)))
      .drop("__b")
  }

  /** Event sessionization — the gaps-and-islands assignment: per `keyCol`,
    * a NEW session opens when the gap from the previous event (by `tsCol`,
    * an integral epoch column — nanos/micros/versions) exceeds `maxGap`.
    * Adds `session_idx` (0-based per key, in time order). The canonical
    * pre-aggregation for behavioral features and session-level corpus
    * packing.
    *
    * Shape: ONE shuffle by key; the lag pass and the running-sum pass
    * share the same window sort (identical partitioning + ordering — a
    * single WindowExec after planning). Per-key ordering is totalized by
    * `tieBreak` (a unique column), so the assignment is deterministic;
    * equal-ts events have gap 0 and never split. 100 TB note: partitions
    * scale with distinct keys, and a key's whole history landing in one
    * task is inherent to the semantics (same as any per-entity window);
    * a pathological single-entity firehose should be pre-split upstream.
    *
    * The exact same two windows are expressible in ANSI SQL (lag +
    * running SUM over (PARTITION BY key ORDER BY ts, tie)), so an
    * external oracle can replicate the assignment bit-for-bit. */
  def sessionize(
      df: DataFrame, keyCol: String, tsCol: String, maxGap: Long,
      tieBreak: String): DataFrame = {
    require(maxGap >= 0, "maxGap must be non-negative")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieBreak))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__gap_prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new_sess",
        when(col("__gap_prev").isNull || col(tsCol) - col("__gap_prev") > maxGap, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("__new_sess")).over(run) - 1L)
      .drop("__gap_prev", "__new_sess")
  }

  /** The tagged two-sided union all three as-of directions sort: left rows
    * carry their columns plus null bookkeeping, right rows carry the
    * payload struct; identical expressions keep the single-direction
    * plans byte-identical to their pre-refactor form. */
  private def asofUnion(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[String], tieBreak: String, op: String): DataFrame = {
    require(!left.columns.exists(_.startsWith("__")),
      s"$op reserves __-prefixed column names on the left side")
    require(rightPayload.nonEmpty && rightPayload.forall(right.columns.contains),
      s"rightPayload must name existing right columns, got $rightPayload")
    requireLosslessTsCast(left, leftTs, right, rightTs, op)
    val payloadStruct = struct(
      (col(rightTs).as("__ts") +: col(tieBreak).as("__tb") +:
        rightPayload.map(col)): _*)
    val r = right.select(
      col(rightKey).as("__k"), col(rightTs).as("__ts"),
      lit(0).as("__side"), col(tieBreak).as("__tb"),
      payloadStruct.as("__payload"))
    val l = left.select(
      (left.columns.map(col) :+
        col(leftKey).as("__k") :+ col(leftTs).cast(r.schema("__ts").dataType).as("__ts") :+
        lit(1).as("__side") :+ lit(null).cast(r.schema("__tb").dataType).as("__tb") :+
        lit(null).cast(r.schema("__payload").dataType).as("__payload")): _*)
    l.unionByName(r.select(l.columns.map {
      case c @ ("__k" | "__ts" | "__side" | "__tb" | "__payload") => col(c)
      case c => lit(null).cast(l.schema(c).dataType).as(c)
    }: _*))
  }

  /** Persisted-state form of [[sessionize]]: returns (assigned, frontier)
    * where `assigned` is the full sessionize output and `frontier` is each
    * key's LAST event — (key, __last_ts, __last_tie, __last_sess) — the
    * sufficient statistic for continuing session assignment into the next
    * batch with [[sessionizeFold]] (a rolling-log pipeline sessionizes
    * each day against yesterday's frontier instead of re-sorting
    * history). */
  def sessionizeState(
      df: DataFrame, keyCol: String, tsCol: String, maxGap: Long,
      tieBreak: String): (DataFrame, DataFrame) = {
    val assigned = sessionize(df, keyCol, tsCol, maxGap, tieBreak)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).desc, col(tieBreak).desc)
    val frontier = assigned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col(tsCol).as("__last_ts"),
        col(tieBreak).as("__last_tie"), col("session_idx").as("__last_sess"))
    (assigned, frontier)
  }

  /** Fold a new event batch against a [[sessionizeState]] frontier: the
    * batch sessionizes with its own keyed windows (batch-sized — history
    * is never re-sorted), and each key's FIRST batch event either
    * continues the frontier session (gap ≤ maxGap) or opens the next one;
    * session indices stay globally consecutive per key. Keys new to the
    * frontier start at 0.
    *
    * Contract (enforced like [[transitionFold]]): batch events for a key
    * with a frontier must be STRICTLY later than `(last_ts, last_tie)` —
    * an interleaved event would rewrite assignments already served — and
    * the fold refuses loudly at execution time. Returns
    * (assignedBatch — the sessionize output shape, new frontier). The
    * frontier (|keys|-sized) is probed via broadcast joins and never
    * shuffles. */
  def sessionizeFold(
      frontier: DataFrame, batch: DataFrame, keyCol: String, tsCol: String,
      maxGap: Long, tieBreak: String): (DataFrame, DataFrame) = {
    require(maxGap >= 0, "maxGap must be non-negative")
    require(frontier.columns.toSeq ==
      Seq(keyCol, "__last_ts", "__last_tie", "__last_sess"),
      s"frontier must be a sessionizeState frontier, got ${frontier.columns.mkString(", ")}")
    require(!batch.columns.exists(_.startsWith("__")),
      "sessionizeFold reserves __-prefixed column names in the batch")
    // the guard join keys on keyCol with NO broadcast hint: the frontier
    // is |all keys ever seen| — forcing it into a broadcast would ship the
    // whole state to every task (the transitionFold rule); the planner
    // broadcasts it only while it is genuinely small. The anti-join below
    // broadcasts the BATCH's key set instead, so the kept-frontier side
    // still never shuffles.
    val guarded = batch.join(frontier, Seq(keyCol), "left")
      .withColumn(tsCol,
        when(col("__last_ts").isNotNull &&
          (col(tsCol) < col("__last_ts") ||
            (col(tsCol) === col("__last_ts") && col(tieBreak) <= col("__last_tie"))),
          raise_error(concat(lit("graft sessionizeFold: event for key "),
            col(keyCol).cast("string"), lit(" at ("), col(tsCol).cast("string"),
            lit(", "), col(tieBreak).cast("string"),
            lit(") is not after the folded frontier ("),
            col("__last_ts").cast("string"), lit(", "),
            col("__last_tie").cast("string"),
            lit(") — session assignment requires strictly later batches; " +
              "rebuild the state from the full history instead"))))
          .otherwise(col(tsCol)))
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieBreak))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val assigned = guarded
      .withColumn("__gap_prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new_sess",
        when(col("__gap_prev").isNull,
          // the key's first batch event: continue the frontier session on
          // a small-enough gap, else open the next; keys new to the
          // frontier "open" session 0 (base -1 below)
          when(col("__last_ts").isNotNull &&
            col(tsCol) - col("__last_ts") <= maxGap, 0L).otherwise(1L))
          .otherwise(
            when(col(tsCol) - col("__gap_prev") > maxGap, 1L).otherwise(0L)))
      .withColumn("session_idx",
        coalesce(col("__last_sess"), lit(-1L)) + sum(col("__new_sess")).over(run))
      .drop("__gap_prev", "__new_sess", "__last_ts", "__last_tie", "__last_sess")
    val wLast = Window.partitionBy(keyCol).orderBy(col(tsCol).desc, col(tieBreak).desc)
    val batchLast = assigned
      .withColumn("__rl", row_number().over(wLast))
      .filter(col("__rl") === 1)
      .select(col(keyCol), col(tsCol).as("__last_ts"),
        col(tieBreak).as("__last_tie"), col("session_idx").as("__last_sess"))
    val keptFrontier = frontier
      .join(broadcast(batchLast.select(col(keyCol))), Seq(keyCol), "left_anti")
    (assigned, keptFrontier.unionByName(batchLast))
  }

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      tieBreak: String): DataFrame = {
    // right rows sort before left at equal ts (side 0 < 1); among right
    // rows with equal ts, ascending tieBreak means the LAST seen (highest)
    // wins the carry-forward
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"), col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    asofUnion(left, right, leftKey, rightKey, leftTs, rightTs,
        rightPayload, tieBreak, "asofJoin")
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__k", "__ts", "__side", "__tb", "__payload")
  }

  /** Ordered FUNNEL analysis: per key, the earliest completion chain of
    * `steps` — t₁ = min ts of the first step; tᵢ = min ts of step i
    * STRICTLY after tᵢ₋₁ (the standard "earliest qualifying chain"
    * funnel semantics: greedy-earliest is optimal, so a key completes k
    * steps under this rule iff ANY ordered chain of k steps exists).
    * Only keys that enter the funnel (have step 1 at all) appear.
    * Returns (keyCol, step_1_ts … step_n_ts — null from the first
    * unreached step on, the nulls are monotone by construction —
    * steps_completed).
    *
    * Shape at scale: one map-side-combinable MIN aggregation per step (a
    * small constant), each keyed on `keyCol`, plus a keyed join against
    * the shrinking survivor set — no windows, no per-key event sort, no
    * collect. Ties inside a step collapse in the MIN; equal timestamps
    * ACROSS steps do not chain (strict >), the deterministic reading of
    * "after". */
  def funnel(
      df: DataFrame, keyCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got ${steps.mkString(", ")}")
    var acc: DataFrame = df.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("step_1_ts"))
    var i = 2
    steps.tail.foreach { step =>
      val prev = s"step_${i - 1}_ts"
      val cur = s"step_${i}_ts"
      val nxt = df.filter(col(typeCol) === step)
        .select(col(keyCol), col(tsCol).as("__t"))
        .join(acc.select(col(keyCol), col(prev).as("__p")), keyCol)
        .filter(col("__t") > col("__p"))
        .groupBy(col(keyCol)).agg(min(col("__t")).as(cur))
      acc = acc.join(nxt, Seq(keyCol), "left")
      i += 1
    }
    acc.withColumn("steps_completed",
      steps.indices.map(j => when(col(s"step_${j + 1}_ts").isNotNull, 1L)
        .otherwise(0L)).reduce(_ + _))
  }

  /** Cohort RETENTION matrix: each key's cohort is the integer time
    * bucket (FLOOR of `ts / bucketWidth` — exact on negative, pre-epoch
    * timestamps too, matching SQL `//` oracles; no non-negativity
    * contract) of its FIRST activity; cell (cohort, day_offset)
    * counts keys active in bucket cohort + day_offset. The classic
    * product-analytics triangle, integer-exact.
    *
    * Shape at scale: one distinct over (key, bucket) — the only
    * corpus-sized shuffle, map-side combinable — then a
    * min-per-key aggregate and a keyed join back; the result is
    * |buckets|² cells at most. No windows, no sessionization state.
    * Returns (cohort, day_offset, active_keys). */
  def retentionCohorts(
      df: DataFrame, keyCol: String, tsCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val act = df.select(col(keyCol).as("__k"),
      floorDiv(tsCol, bucketWidth).cast("bigint").as("__b")).distinct()
    val cohort = act.groupBy("__k").agg(min("__b").as("__c"))
    act.join(cohort, "__k")
      .groupBy(col("__c").as("cohort"), (col("__b") - col("__c")).as("day_offset"))
      .agg(count(lit(1)).as("active_keys"))
  }

  /** User-journey TRANSITION matrix (Markov flows): counts of
    * (event type → the type `step` events later) transitions across each
    * key's time-ordered stream. `step = 1` is the classic 1-step flow
    * matrix; higher `step` gives the k-step Markov counts (what a chain's
    * k-th power estimates, counted exactly instead).
    *
    * Shape at scale: the ONLY window is keyed on `keyCol` — bounded by
    * one key's events (the [[sessionize]] contract; a pathological
    * single-key firehose should be pre-split upstream) — and the count
    * is map-side combinable, so the result is |types|² cells. Per-key
    * order is totalized by `tieBreak` (a unique column), so the counts
    * are deterministic and an external SQL oracle replays them exactly.
    * Returns (from_type, to_type, n_steps). */
  def transitionMatrix(
      df: DataFrame, keyCol: String, typeCol: String, tsCol: String,
      tieBreak: String, step: Int = 1): DataFrame = {
    require(step >= 1, s"step must be >= 1, got $step")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieBreak))
    df.withColumn("__next", lead(col(typeCol), step).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n_steps"))
  }

  /** Persisted-state form of [[funnel]]: the state table an operational
    * pipeline stores between ingests and folds new event batches into
    * with [[funnelFold]] — the round-14 persisted-census pattern applied
    * to funnels. One row per key with ANY step-typed event (not just
    * entered keys): the funnel chain columns (`step_i_ts`, null until
    * reached), `steps_completed`, and `__max_ts` — the maximum step-typed
    * event timestamp ever folded for the key. `__max_ts` is what makes
    * folding SOUND: the earliest-chain semantics depends on events the
    * chain did not use (an earlier step-1 arrival can re-route the chain
    * through a previously-ignored step-2 event), so a fold is exact only
    * when batch events are strictly later than everything already folded
    * for that key — and storing the per-key max is what lets
    * [[funnelFold]] REFUSE loudly when the contract is violated instead
    * of silently under-counting. Project the serving view with
    * [[funnelOf]]. Invariant (spec-pinned):
    * `funnelOf(funnelFold(funnelState(b1), b2)) == funnel(b1 ∪ b2)`
    * whenever every key's b2 events are strictly later than its b1
    * events. */
  def funnelState(
      df: DataFrame, keyCol: String, typeCol: String, tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(!df.columns.exists(_.startsWith("__")),
      "funnelState reserves __-prefixed column names")
    val se = df.filter(col(typeCol).isInCollection(steps))
    val maxTs = se.groupBy(col(keyCol)).agg(max(col(tsCol)).as("__max_ts"))
    funnel(df, keyCol, typeCol, tsCol, steps)
      .join(maxTs, Seq(keyCol), "right")
      .withColumn("steps_completed", coalesce(col("steps_completed"), lit(0L)))
  }

  /** Fold a new event batch into a [[funnelState]] table — the
    * incremental funnel. Per step, one map-side-combinable MIN over the
    * batch plus a keyed join against the state (no windows, no per-key
    * sort — the [[funnel]] shape, with the state standing in for the
    * survivor set); cost scales with the BATCH, never the history.
    *
    * Contract (enforced, not documented-only): every batch event for a
    * key already in the state must be STRICTLY later than that key's
    * stored `__max_ts`. A late event invalidates earliest-chain folding
    * (see [[funnelState]]), so the fold REFUSES loudly at execution time
    * (`raise_error` inside the batch-state join — no extra pass) rather
    * than silently reporting a wrong funnel. Keys new to the state enter
    * unconditioned. Returns the updated state (same schema). */
  def funnelFold(
      state: DataFrame, batch: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelFold needs at least one step")
    require(state.columns.contains("__max_ts") &&
      steps.indices.forall(i => state.columns.contains(s"step_${i + 1}_ts")),
      s"state must be a funnelState table for ${steps.size} steps, " +
        s"got columns ${state.columns.mkString(", ")}")
    val se = batch.filter(col(typeCol).isInCollection(steps))
      .select(col(keyCol), col(typeCol).as("__etype"), col(tsCol).as("__ets"))
    // the late-data refusal rides the join the fold needs anyway: a batch
    // event at or before the key's stored __max_ts poisons __ets with
    // raise_error, so the first action over the fold refuses loudly
    val guarded = se.join(state.select(col(keyCol), col("__max_ts").as("__smax")),
        Seq(keyCol), "left")
      .withColumn("__ets",
        when(col("__smax").isNotNull && col("__ets") <= col("__smax"),
          raise_error(concat(lit("graft funnelFold: late event for key "),
            col(keyCol).cast("string"), lit(" at ts "), col("__ets").cast("string"),
            lit(" <= folded max "), col("__smax").cast("string"),
            lit(" — earliest-chain folding requires strictly later batches; " +
              "rebuild the state from the full history instead"))))
          .otherwise(col("__ets")))
      .drop("__smax")
    // state keys ∪ batch step-event keys; missing state rows enter with a
    // null chain (steps_completed 0) and null __max_ts
    var acc = state.join(guarded.select(col(keyCol)).distinct(), Seq(keyCol), "full")
    steps.indices.foreach { j =>
      val cur = s"step_${j + 1}_ts"
      val cand =
        if (j == 0) guarded.filter(col("__etype") === steps.head)
          .groupBy(col(keyCol)).agg(min(col("__ets")).as("__c"))
        else guarded.filter(col("__etype") === steps(j))
          .select(col(keyCol), col("__ets"))
          .join(acc.select(col(keyCol), col(s"step_${j}_ts").as("__p")), keyCol)
          .filter(col("__ets") > col("__p"))
          .groupBy(col(keyCol)).agg(min(col("__ets")).as("__c"))
      acc = acc.join(cand, Seq(keyCol), "left")
        .withColumn(cur, coalesce(col(cur), col("__c"))).drop("__c")
    }
    val bmax = guarded.groupBy(col(keyCol)).agg(max(col("__ets")).as("__bmax"))
    acc.join(bmax, Seq(keyCol), "left")
      .withColumn("__max_ts",
        greatest(coalesce(col("__max_ts"), col("__bmax")),
          coalesce(col("__bmax"), col("__max_ts"))))
      .drop("__bmax")
      .withColumn("steps_completed",
        steps.indices.map(j => when(col(s"step_${j + 1}_ts").isNotNull, 1L)
          .otherwise(0L)).reduce(_ + _))
  }

  /** Serving view of a [[funnelState]] table: exactly the [[funnel]]
    * output shape — entered keys only, bookkeeping dropped. */
  def funnelOf(state: DataFrame): DataFrame =
    state.filter(col("step_1_ts").isNotNull).drop("__max_ts")

  /** The step-conversion SUMMARY of a [[funnel]] (or [[funnelOf]],
    * [[funnelWithin]]) result: one row per step with the count of keys
    * that reached it and the integer-exact conversion permille relative
    * to step 1 (entrants). One tiny aggregate over the already-computed
    * funnel — |steps| rows out; `reached` is monotone non-increasing and
    * step 1 reads 1000‰ by construction. */
  def funnelRates(funnelDf: DataFrame, steps: Int): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val agg = funnelDf.agg(
      count(lit(1)).as("__n1"),
      (2 to steps).map(i =>
        // coalesce: SUM over an empty funnel is null, not 0
        coalesce(sum(when(col("steps_completed") >= i, 1L).otherwise(0L)), lit(0L))
          .as(s"__n$i")): _*)
    val rows = (1 to steps).map(i => struct(
      lit(i.toLong).as("step"), col(s"__n$i").as("reached")))
    agg.select(explode(array(rows: _*)).as("r"), col("__n1"))
      .select(col("r.step").as("step"), col("r.reached").as("reached"),
        when(col("__n1") === 0L, lit(0L))
          .otherwise(expr("(r.reached * 1000) DIV __n1")).as("permille_of_entered"))
  }

  /** CONVERSION-WINDOW funnel: [[funnel]] with every step additionally
    * required to land within `within` of the key's ANCHOR — its earliest
    * step-1 event (`tᵢ ≤ t₁ + within`). This is the product-analytics
    * convention (convert within N days of entering): the anchor is the
    * FIRST entry, deterministically, not "any entry whose window would
    * have converted" — a later re-entry converting inside its own window
    * does not count, which keeps the statistic monotone in `within` and
    * replayable in plain SQL. Within the anchored window, greedy-earliest
    * chaining is optimal exactly as in [[funnel]]. Same output shape;
    * same no-window/no-sort scale story (the anchor rides the survivor
    * set as one more join column). */
  def funnelWithin(
      df: DataFrame, keyCol: String, typeCol: String, tsCol: String,
      steps: Seq[String], within: Long): DataFrame = {
    require(within >= 0, s"within must be non-negative, got $within")
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got ${steps.mkString(", ")}")
    var acc: DataFrame = df.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("step_1_ts"))
    var i = 2
    steps.tail.foreach { step =>
      val prev = s"step_${i - 1}_ts"
      val cur = s"step_${i}_ts"
      val nxt = df.filter(col(typeCol) === step)
        .select(col(keyCol), col(tsCol).as("__t"))
        .join(acc.select(col(keyCol), col(prev).as("__p"),
          col("step_1_ts").as("__a")), keyCol)
        .filter(col("__t") > col("__p") && col("__t") <= col("__a") + within)
        .groupBy(col(keyCol)).agg(min(col("__t")).as(cur))
      acc = acc.join(nxt, Seq(keyCol), "left")
      i += 1
    }
    acc.withColumn("steps_completed",
      steps.indices.map(j => when(col(s"step_${j + 1}_ts").isNotNull, 1L)
        .otherwise(0L)).reduce(_ + _))
  }

  private val RetentionMetaWidth = "graft.retention.bucketWidth"

  /** Persisted-state form of [[retentionCohorts]]: the distinct
    * (key, bucket) activity relation — the EXACT sufficient statistic of
    * the retention triangle, so unlike [[funnelFold]] the fold needs NO
    * ordering contract: distinct-union is idempotent and commutative, and
    * late or replayed data folds in exactly. `bucketWidth` is stamped in
    * the bucket column's metadata so a mismatched fold refuses instead of
    * silently mixing granularities. One row per (key, active bucket);
    * serve with [[retentionOf]]. */
  def retentionState(
      df: DataFrame, keyCol: String, tsCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(RetentionMetaWidth, bucketWidth).build()
    df.select(col(keyCol),
        floorDiv(tsCol, bucketWidth).cast("bigint").as("bucket", meta))
      .distinct()
  }

  /** Fold a new event batch into a [[retentionState]]: the state NEVER
    * shuffles — the batch's distinct activity probes it via a broadcast
    * semi-join (the exact-dedup probe strategy) and only genuinely new
    * (key, bucket) rows append. Any batch order, late data, and replays
    * are all exact (see [[retentionState]]); the only contract is the
    * stamped bucketWidth, enforced here. */
  def retentionFold(
      state: DataFrame, batch: DataFrame, keyCol: String, tsCol: String,
      bucketWidth: Long): DataFrame = {
    require(state.columns.toSeq == Seq(keyCol, "bucket"),
      s"state must be a retentionState table (${Seq(keyCol, "bucket")}), " +
        s"got ${state.columns.mkString(", ")}")
    state.schema("bucket").metadata match {
      case m if m.contains(RetentionMetaWidth) =>
        require(m.getLong(RetentionMetaWidth) == bucketWidth,
          s"retention state was bucketed at width ${m.getLong(RetentionMetaWidth)}, " +
            s"caller passed $bucketWidth — mixing granularities corrupts cohorts")
      case _ => // a state read back from storage that dropped metadata: trust the caller
    }
    state.unionByName(retentionFresh(state, batch, keyCol, tsCol, bucketWidth))
  }

  /** The APPEND DELTA of a [[retentionFold]]: only the batch's genuinely
    * new (key, bucket) rows — what an append-only state store (a
    * VersionedTable the streaming ingest maintains) should commit per
    * batch, instead of rewriting the whole |keys × buckets| state. Same
    * probe shape: the state never shuffles. */
  def retentionFresh(
      state: DataFrame, batch: DataFrame, keyCol: String, tsCol: String,
      bucketWidth: Long): DataFrame = {
    require(state.columns.toSeq == Seq(keyCol, "bucket"),
      s"state must be a retentionState table (${Seq(keyCol, "bucket")}), " +
        s"got ${state.columns.mkString(", ")}")
    state.schema("bucket").metadata match {
      case m if m.contains(RetentionMetaWidth) =>
        require(m.getLong(RetentionMetaWidth) == bucketWidth,
          s"retention state was bucketed at width ${m.getLong(RetentionMetaWidth)}, " +
            s"caller passed $bucketWidth — mixing granularities corrupts cohorts")
      case _ => // a state read back from storage that dropped metadata: trust the caller
    }
    val batchAct = retentionState(batch, keyCol, tsCol, bucketWidth)
    // state rows the batch already has — probed map-side, state unshuffled
    val dup = state.join(broadcast(batchAct), Seq(keyCol, "bucket"), "left_semi")
    batchAct.join(dup, Seq(keyCol, "bucket"), "left_anti")
  }

  /** Serving view of a [[retentionState]]: the [[retentionCohorts]]
    * triangle, computed from the stored activity relation (cohort = min
    * bucket per key; one aggregate + keyed join — no corpus re-scan). */
  def retentionOf(state: DataFrame): DataFrame = {
    val k = state.columns.head
    val cohort = state.groupBy(col(k)).agg(min("bucket").as("__c"))
    state.join(cohort, k)
      .groupBy(col("__c").as("cohort"), (col("bucket") - col("__c")).as("day_offset"))
      .agg(count(lit(1)).as("active_keys"))
  }

  /** The normalized retention TRIANGLE: each [[retentionCohorts]] cell as
    * an integer-exact permille of its cohort's size (= the cell at offset
    * 0, which always exists — every key is active in its own first
    * bucket, so offset 0 reads 1000‰ by construction). One broadcastable
    * self-join on cohort (|buckets| rows); accepts the output of
    * [[retentionCohorts]] or [[retentionOf]]. */
  def retentionRates(cohorts: DataFrame): DataFrame = {
    require(Seq("cohort", "day_offset", "active_keys")
      .forall(cohorts.columns.contains),
      s"expected retentionCohorts output, got ${cohorts.columns.mkString(", ")}")
    val sizes = cohorts.filter(col("day_offset") === 0L)
      .select(col("cohort"), col("active_keys").as("__size"))
    cohorts.join(broadcast(sizes), "cohort")
      .select(col("cohort"), col("day_offset"), col("active_keys"),
        expr("(active_keys * 1000) DIV __size").as("permille_of_cohort"))
  }

  /** ROLLING-ACTIVITY counts (DAU/WAU/MAU): for every time bucket and
    * every window width `w` (in buckets), the number of DISTINCT keys
    * active in the trailing `w` buckets `(bucket − w, bucket]` — the
    * standard product-analytics actives family (w = 1 day / 7 / 30 on
    * daily buckets). Buckets are FLOOR division of the integral `tsCol`
    * (exact pre-epoch, the [[retentionCohorts]] convention); output
    * buckets stop at the last OBSERVED bucket (no trailing "future"
    * rows). Returns (bucket, win, active_keys); a (bucket, win) cell with
    * no active key in its lookback is simply absent (count 0).
    *
    * Shape at scale: ONE corpus-sized shuffle — the distinct over
    * (key, bucket), map-side combinable — after which each activity row
    * replicates to the ≤ w output buckets it covers per window (bounded
    * fan-out: Σ windows copies of the already-tiny activity relation,
    * refused loudly past [[ActiveUsersMaxFanout]]), one more distinct
    * (combinable: a key active twice inside a window collapses), and a
    * combinable count. NO window functions, no per-key sort; the result
    * is ≤ |buckets|·|windows| rows. The per-key activity relation is the
    * SAME sufficient statistic [[retentionState]] stores, so the
    * persisted/incremental form is free: maintain one activity state with
    * [[retentionState]]/[[retentionFold]] and serve this view from it
    * with [[activeUsersOf]]. */
  def activeUsers(
      df: DataFrame, keyCol: String, tsCol: String,
      bucketWidth: Long, windows: Seq[Long]): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val act = df.select(col(keyCol).as("__k"),
      floorDiv(tsCol, bucketWidth).cast("bigint").as("__b")).distinct()
    activeFromActivity(act, windows)
  }

  /** The bounded replication budget of [[activeUsers]]: Σ windows — each
    * (key, bucket) activity row is copied once per covered output bucket.
    * 4096 buckets of total lookback (a decade of daily windows) is far
    * past any analytics shape; wider requests refuse loudly, the
    * house rule for fan-outs. */
  val ActiveUsersMaxFanout: Long = 4096L

  /** Serving view of a [[retentionState]] activity relation as the
    * rolling-activity counts: [[activeUsers]] computed from the stored
    * (key, bucket) rows — no corpus re-scan, fold new batches with
    * [[retentionFold]] (distinct-union is idempotent, so late data and
    * replays are exact; one persisted state serves BOTH the retention
    * triangle and this view). */
  def activeUsersOf(state: DataFrame, windows: Seq[Long]): DataFrame = {
    require(state.columns.length == 2 && state.columns(1) == "bucket",
      s"state must be a retentionState table (key, bucket), " +
        s"got ${state.columns.mkString(", ")}")
    val k = state.columns.head
    activeFromActivity(
      state.select(col(k).as("__k"), col("bucket").as("__b")), windows)
  }

  private def activeFromActivity(
      act: DataFrame, windows: Seq[Long]): DataFrame = {
    require(windows.nonEmpty, "activeUsers needs at least one window")
    require(windows.forall(_ >= 1), s"windows must be >= 1, got $windows")
    require(windows.distinct.size == windows.size,
      s"windows must be distinct, got $windows")
    require(windows.sum <= ActiveUsersMaxFanout,
      s"total window lookback ${windows.sum} buckets exceeds the " +
        s"$ActiveUsersMaxFanout replication budget (each activity row is " +
        "copied once per covered bucket) — widen bucketWidth instead")
    val a = Caching.spillPersistEager(act)
    // the observed frontier: coverage stops here so no "future" buckets
    // appear. One metadata-scale scalar to the driver (the BM25/N pattern).
    val mxRow = a.agg(max("__b")).head()
    if (mxRow.isNullAt(0))
      return a.select(col("__b").as("bucket"), lit(0L).as("win"),
        lit(0L).as("active_keys")).limit(0)
    val mx = mxRow.getLong(0)
    windows.map { w =>
      a.select(lit(w).as("win"), col("__k"),
        explode(sequence(col("__b"),
          least(col("__b") + (w - 1L), lit(mx)))).as("bucket"))
    }.reduce(_.unionByName(_))
      .distinct()
      .groupBy(col("bucket"), col("win"))
      .agg(count(lit(1)).as("active_keys"))
  }

  /** SKETCHED rolling activity — [[activeUsers]] with the per-cell
    * distinct count replaced by a deterministic KMV sketch
    * ([[graft.functions.NativeAgg.kMinDistinct]] over a caller-supplied
    * non-negative hash column, the [[TextCorpus.distinctSketch]]
    * convention): with fewer than k distinct hashes in a cell the count is
    * EXACT; at k the estimate is `(k−1)·hashBound DIV (kth_min + 1)`
    * (~1/√k relative error) — and the whole statistic is integer-exact
    * and hash-deterministic, so an external engine replays it bit-for-bit.
    *
    * The scale story goes one step beyond the exact form: KMV is
    * duplicate-insensitive and map-side combinable, so this variant needs
    * NO corpus-sized distinct at all — raw events flow through the
    * bounded coverage fan-out straight into partial O(k) sketch states,
    * and the only shuffle is the ≤ |buckets|·|windows| keyed sketch
    * merge. The billion-key DAU/MAU shape. Returns
    * (bucket, win, n_kept, kth_min, est_active); a cell whose hashes are
    * all null keeps n_kept 0 / null kth_min / est 0 (the
    * [[TextCorpus.distinctSketch]] ANSI guard). */
  def activeUsersSketch(
      df: DataFrame, hashCol: String, tsCol: String,
      bucketWidth: Long, windows: Seq[Long], k: Int,
      hashBound: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(k >= 2, s"k must be >= 2, got $k")
    require(hashBound > 0, s"hashBound must be positive, got $hashBound")
    require(windows.nonEmpty && windows.forall(_ >= 1) &&
      windows.distinct.size == windows.size,
      s"windows must be distinct and >= 1, got $windows")
    require(windows.sum <= ActiveUsersMaxFanout,
      s"total window lookback ${windows.sum} buckets exceeds the " +
        s"$ActiveUsersMaxFanout replication budget — widen bucketWidth instead")
    // NOT persisted: the projection is corpus-sized (unlike the exact
    // form's post-distinct activity relation), so the frontier scalar
    // comes from its own pushdown-friendly source scan and the coverage
    // pass streams the source a second time — two scans beat materializing
    // 100 TB of (hash, bucket) rows
    val a = df.select(col(hashCol).as("__h"),
      floorDiv(tsCol, bucketWidth).cast("bigint").as("__b"))
    val mxRow = a.agg(max("__b")).head()
    if (mxRow.isNullAt(0))
      return a.select(col("__b").as("bucket"), lit(0L).as("win"),
        lit(0L).as("n_kept"), lit(null).cast("bigint").as("kth_min"),
        lit(0L).as("est_active")).limit(0)
    val mx = mxRow.getLong(0)
    windows.map { w =>
      a.select(lit(w).as("win"), col("__h"),
        explode(sequence(col("__b"),
          least(col("__b") + (w - 1L), lit(mx)))).as("bucket"))
    }.reduce(_.unionByName(_))
      .groupBy(col("bucket"), col("win"))
      .agg(graft.functions.NativeAgg.kMinDistinct(col("__h"), k).as("__mins"))
      .select(col("bucket"), col("win"),
        size(col("__mins")).cast("long").as("n_kept"),
        when(size(col("__mins")) > 0, element_at(col("__mins"), -1)).as("kth_min"),
        when(size(col("__mins")) < k, size(col("__mins")).cast("long"))
          .otherwise(expr(
            s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * $hashBound) DIV " +
              "(CAST(element_at(__mins, -1) AS DECIMAL(38,0)) + 1) AS BIGINT)"))
          .as("est_active"))
  }

  /** HLL-sketched rolling activity — [[activeUsersSketch]] with the KMV
    * replaced by HyperLogLog register maxima
    * ([[graft.operators.Sketches.hllSketch]] semantics per (bucket, win)
    * cell): fixed m = 2^p bytes of state per cell whatever the traffic,
    * and a max-mergeable (idempotent) partial state — the variant to
    * reach for when cells are huge and the maintainer must tolerate
    * replays. Same bounded coverage fan-out, same single keyed shuffle,
    * NO corpus-sized distinct. Returns
    * (bucket, win, zero_regs, sum_inv, est_active) — integer-exact and
    * hash-deterministic, replayed bit-for-bit by the DuckDB oracle. */
  def activeUsersHll(
      df: DataFrame, hashCol: String, tsCol: String,
      bucketWidth: Long, windows: Seq[Long], p: Int, hashBits: Int): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(windows.nonEmpty && windows.forall(_ >= 1) &&
      windows.distinct.size == windows.size,
      s"windows must be distinct and >= 1, got $windows")
    require(windows.sum <= ActiveUsersMaxFanout,
      s"total window lookback ${windows.sum} buckets exceeds the " +
        s"$ActiveUsersMaxFanout replication budget — widen bucketWidth instead")
    // same two-scan shape as the KMV form: the corpus-sized (hash, bucket)
    // projection is NOT persisted — the frontier scalar gets its own
    // pushdown-friendly scan
    val a = df.select(col(hashCol).as("__h"),
      floorDiv(tsCol, bucketWidth).cast("bigint").as("__b"))
    val mxRow = a.agg(max("__b")).head()
    if (mxRow.isNullAt(0))
      return a.select(col("__b").as("bucket"), lit(0L).as("win"),
        lit(0L).as("zero_regs"), lit(0L).as("sum_inv"),
        lit(0L).as("est_active")).limit(0)
    val mx = mxRow.getLong(0)
    windows.map { w =>
      a.select(lit(w).as("win"), col("__h"),
        explode(sequence(col("__b"),
          least(col("__b") + (w - 1L), lit(mx)))).as("bucket"))
    }.reduce(_.unionByName(_))
      .groupBy(col("bucket"), col("win"))
      .agg(graft.functions.NativeAgg.hllRegisters(col("__h"), p, hashBits)
        .as("__regs"))
      .select((col("bucket") +: col("win") +:
        graft.operators.Sketches.hllStatsCols(p, hashBits, "__regs")): _*)
      .withColumn("est_active",
        graft.operators.Sketches.hllEstimateFromSumInv(p, hashBits))
  }

  /** STICKINESS (the DAU/MAU ratio): joins two window widths of an
    * [[activeUsers]] result per bucket and reports the short window's
    * actives as an integer-exact permille of the long window's — the
    * classic engagement ratio (how much of the monthly audience shows up
    * daily). One broadcastable self-join over the ≤ |buckets|·2 rows;
    * buckets present in only one of the two windows (none, by
    * construction — a key active in the short lookback is active in the
    * long one) drop out of the inner join. Returns
    * (bucket, short_active, long_active, permille_of_long). */
  def stickiness(
      active: DataFrame, shortWin: Long, longWin: Long): DataFrame = {
    require(Seq("bucket", "win", "active_keys").forall(active.columns.contains),
      s"expected activeUsers output, got ${active.columns.mkString(", ")}")
    require(shortWin < longWin,
      s"shortWin ($shortWin) must be < longWin ($longWin)")
    val s = active.filter(col("win") === shortWin)
      .select(col("bucket"), col("active_keys").as("short_active"))
    val l = active.filter(col("win") === longWin)
      .select(col("bucket"), col("active_keys").as("long_active"))
    s.join(broadcast(l), "bucket")
      .select(col("bucket"), col("short_active"), col("long_active"),
        expr("(short_active * 1000) DIV long_active").as("permille_of_long"))
  }

  /** Row-normalized [[transitionMatrix]]: each (from, to) count as an
    * integer-exact permille of its FROM-row total — the empirical Markov
    * transition probabilities (×1000, truncating). One broadcastable
    * self-aggregation over the |types|² matrix; accepts the output of
    * [[transitionMatrix]] or a served [[transitionFold]] matrix. */
  def transitionRates(matrix: DataFrame): DataFrame = {
    require(Seq("from_type", "to_type", "n_steps").forall(matrix.columns.contains),
      s"expected transitionMatrix output, got ${matrix.columns.mkString(", ")}")
    val totals = matrix.groupBy(col("from_type"))
      .agg(sum(col("n_steps")).as("__tot"))
    matrix.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n_steps"),
        expr("(n_steps * 1000) DIV __tot").as("permille_of_from"))
  }

  /** Persisted-state form of [[transitionMatrix]] (1-step): the pair
    * (matrix, frontier) where `matrix` is the (from_type, to_type,
    * n_steps) counts so far and `frontier` is each key's LAST event
    * (type + timestamp + tie-break) — the sufficient statistic for
    * bridging the next batch's first event onto this one's last. Fold
    * with [[transitionFold]]; `matrix` is the serving view directly. */
  def transitionState(
      df: DataFrame, keyCol: String, typeCol: String, tsCol: String,
      tieBreak: String): (DataFrame, DataFrame) = {
    val matrix = transitionMatrix(df, keyCol, typeCol, tsCol, tieBreak)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).desc, col(tieBreak).desc)
    val frontier = df
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col(typeCol).as("__last_type"),
        col(tsCol).as("__last_ts"), col(tieBreak).as("__last_tie"))
    (matrix, frontier)
  }

  /** Fold a new event batch into a [[transitionState]]: within-batch
    * transitions come from the batch's own keyed lead window (batch-sized),
    * plus one BRIDGE transition per key whose frontier event precedes the
    * batch's first event for that key. Counts are additive, so the matrix
    * merge is a |types|²-sized aggregate.
    *
    * Contract (enforced like [[funnelFold]]): batch events for a key with
    * a frontier must be STRICTLY later than `(last_ts, last_tie)` — an
    * interleaving event would rewrite adjacencies already counted, so the
    * fold refuses loudly at execution time rather than under- or
    * double-counting. Returns the updated (matrix, frontier). */
  def transitionFold(
      matrix: DataFrame, frontier: DataFrame, batch: DataFrame,
      keyCol: String, typeCol: String, tsCol: String,
      tieBreak: String): (DataFrame, DataFrame) = {
    require(frontier.columns.toSeq ==
      Seq(keyCol, "__last_type", "__last_ts", "__last_tie"),
      s"frontier must be a transitionState frontier, got ${frontier.columns.mkString(", ")}")
    // the frontier join brings __last_* columns onto the batch — a batch
    // already carrying __-prefixed columns would collide (ambiguity or
    // silently wrong bridge counts), the same reservation funnelState makes
    require(!batch.columns.exists(_.startsWith("__")),
      "transitionFold reserves __-prefixed column names in the batch")
    val guarded = batch.join(frontier, Seq(keyCol), "left")
      .withColumn(tsCol,
        when(col("__last_ts").isNotNull &&
          (col(tsCol) < col("__last_ts") ||
            (col(tsCol) === col("__last_ts") && col(tieBreak) <= col("__last_tie"))),
          raise_error(concat(lit("graft transitionFold: event for key "),
            col(keyCol).cast("string"), lit(" at ("), col(tsCol).cast("string"),
            lit(", "), col(tieBreak).cast("string"),
            lit(") is not after the folded frontier ("),
            col("__last_ts").cast("string"), lit(", "),
            col("__last_tie").cast("string"),
            lit(") — adjacency counting requires strictly later batches; " +
              "rebuild the state from the full history instead"))))
          .otherwise(col(tsCol)))
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieBreak))
    val within = guarded
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
    val inner = within.filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n_steps"))
    val bridge = within.filter(col("__rn") === 1 && col("__last_type").isNotNull)
      .groupBy(col("__last_type").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n_steps"))
    val mergedMatrix = matrix.unionByName(inner).unionByName(bridge)
      .groupBy("from_type", "to_type").agg(sum("n_steps").as("n_steps"))
    val wLast = Window.partitionBy(keyCol).orderBy(col(tsCol).desc, col(tieBreak).desc)
    val batchLast = guarded
      .withColumn("__rl", row_number().over(wLast))
      .filter(col("__rl") === 1)
      .select(col(keyCol), col(typeCol).as("__last_type"),
        col(tsCol).as("__last_ts"), col(tieBreak).as("__last_tie"))
    // the frontier (|keys|-sized state) never shuffles: the batch's key
    // set probes it via a broadcast anti-join
    val keptFrontier = frontier
      .join(broadcast(batchLast.select(col(keyCol))), Seq(keyCol), "left_anti")
    (mergedMatrix, keptFrontier.unionByName(batchLast))
  }

  /** TRAILING-WINDOW activity features (rate features): for every event,
    * the count — and, with `valueCol`, the sum — of the key's events in
    * the trailing `window` (inclusive: `ts − window ≤ t ≤ ts`). The
    * standard feature-engineering primitive (events-per-key-per-day,
    * spend-in-last-hour) and the batch analogue of a sliding-window
    * stream aggregate.
    *
    * The frame is a RANGE frame over the integral `tsCol`, so events
    * sharing a timestamp see each other symmetrically — no tie-break is
    * needed for determinism (frames are by VALUE, not row position).
    * `valueCol`, when given, must be integral (cents, counts — the
    * integer-exactness house rule). Shape at scale: ONE keyed window
    * (bounded by a key's events, the [[sessionize]] contract); appends
    * `trail_count` (+ `trail_sum`). */
  def trailingFeatures(
      df: DataFrame, keyCol: String, tsCol: String, window: Long,
      valueCol: Option[String] = None): DataFrame = {
    require(window >= 0, s"window must be non-negative, got $window")
    // a non-integral ts would make the RANGE frame fail later with an
    // opaque AnalysisException — refuse up front, the house rule
    require(IntegralTypes.contains(df.schema(tsCol).dataType),
      s"tsCol $tsCol must be integral (got ${df.schema(tsCol).dataType}) — " +
        "use epoch micros/nanos, the integer-exactness house rule")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol))
      .rangeBetween(-window, 0)
    val counted = df.withColumn("trail_count", count(lit(1)).over(w))
    valueCol.fold(counted) { v =>
      require(IntegralTypes.contains(df.schema(v).dataType),
        s"valueCol $v must be integral (got ${df.schema(v).dataType}) — " +
          "scale currency to cents first, the integer-exactness house rule")
      counted.withColumn("trail_sum", sum(col(v)).over(w))
    }
  }

  /** FORWARD as-of join — for each left row, the EARLIEST right row with
    * the same key and `rightTs >= leftTs` (pandas `merge_asof
    * direction='forward'`; the [[asofJoin]] complement — "next event at or
    * after", e.g. the next purchase after each view). Same one-shuffle
    * union-sort shape, with the per-key sort DESCENDING: carrying the
    * last-seen right forward down a descending stream yields, at each
    * left row, the smallest right timestamp still ≥ it.
    *
    * Tie rule (fully specified — deterministic): a right row at exactly
    * leftTs matches; among right rows with equal ts the LOWEST `tieBreak`
    * wins (the natural mirror of backward's highest-wins: both pick the
    * row adjacent to the left row in the sorted stream). */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      tieBreak: String): DataFrame = {
    // DESCENDING ts: right rows still sort before left at equal ts
    // (side 0 < 1); among right rows with equal ts, descending tieBreak
    // means the LAST seen (lowest) wins the carry-forward
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts").desc, col("__side"), col("__tb").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    asofUnion(left, right, leftKey, rightKey, leftTs, rightTs,
        rightPayload, tieBreak, "asofJoinForward")
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__k", "__ts", "__side", "__tb", "__payload")
  }

  /** NEAREST as-of join — for each left row, the right row with the same
    * key minimizing `|rightTs − leftTs|` (pandas `merge_asof
    * direction='nearest'`), completing the backward/forward/nearest
    * direction family. Both integral timestamps are required (distance
    * arithmetic). Deterministic tie order, fully specified: equal
    * distance before/after breaks BACKWARD (the pandas convention);
    * within a side, the side's own rule applies (backward: highest
    * `tieBreak` at equal ts; forward: lowest).
    *
    * `tolerance`, when set, drops matches farther than it (inclusive:
    * distance ≤ tolerance matches) — the left row keeps a null match,
    * exactly pandas' `tolerance=`.
    *
    * Shape at scale: the SAME one-shuffle union as the single-direction
    * joins, with TWO keyed window passes over it (ascending and
    * descending — one exchange, two sorts) and a pure pick projection;
    * never an |L|×|R| pairing. */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      tieBreak: String,
      tolerance: Option[Long] = None): DataFrame = {
    require(IntegralTypes.contains(right.schema(rightTs).dataType),
      s"asofJoinNearest needs an integral right ts column (distance " +
        s"arithmetic), got ${right.schema(rightTs).dataType}")
    require(tolerance.forall(_ >= 0),
      s"tolerance must be non-negative, got $tolerance")
    val wB = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"), col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("__k")
      .orderBy(col("__ts").desc, col("__side"), col("__tb").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u = asofUnion(left, right, leftKey, rightKey, leftTs, rightTs,
        rightPayload, tieBreak, "asofJoinNearest")
      .withColumn("__mb", last(col("__payload"), ignoreNulls = true).over(wB))
      .withColumn("__mf", last(col("__payload"), ignoreNulls = true).over(wF))
      .filter(col("__side") === 1)
    val db = col("__ts") - col("__mb").getField("__ts")
    val df = col("__mf").getField("__ts") - col("__ts")
    val picked = u.withColumn("__match",
      when(col("__mb").isNull, col("__mf"))
        .when(col("__mf").isNull, col("__mb"))
        .when(df < db, col("__mf"))
        .otherwise(col("__mb"))) // equal distance -> backward
    val bounded = tolerance.fold(picked) { tol =>
      picked.withColumn("__match",
        when(abs(col("__match").getField("__ts") - col("__ts")) <= tol,
          col("__match")))
    }
    bounded.drop("__k", "__ts", "__side", "__tb", "__payload", "__mb", "__mf")
  }

  /** [[asofJoinSelect]] for the nearest direction. */
  def asofJoinNearestSelect(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[String], tieBreak: String,
      tolerance: Option[Long] = None): DataFrame = {
    val joined = asofJoinNearest(left, right, leftKey, rightKey, leftTs,
      rightTs, rightPayload, tieBreak, tolerance)
    val unpacked = rightPayload.map(p => col("__match").getField(p).as(s"asof_$p"))
    joined.select((left.columns.map(col) ++ unpacked): _*)
  }

  /** [[asofJoinSelect]] for the forward direction. */
  def asofJoinForwardSelect(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[String], tieBreak: String): DataFrame = {
    val joined = asofJoinForward(left, right, leftKey, rightKey, leftTs, rightTs,
      rightPayload, tieBreak)
    val unpacked = rightPayload.map(p => col("__match").getField(p).as(s"asof_$p"))
    joined.select((left.columns.map(col) ++ unpacked): _*)
  }

  /** Convenience: unpack the matched struct's payload fields as columns
    * named `asof_<field>` (null when no right row preceded the left row). */
  def asofJoinSelect(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[String], tieBreak: String): DataFrame = {
    val joined = asofJoin(left, right, leftKey, rightKey, leftTs, rightTs,
      rightPayload, tieBreak)
    val unpacked = rightPayload.map(p => col("__match").getField(p).as(s"asof_$p"))
    joined.select((left.columns.map(col) ++ unpacked): _*)
  }

  /** POINT-IN-TIME dimension join — the leak-free feature join a training
    * pipeline needs against an SCD2 history: each fact row joins the
    * dimension VERSION that was current at the fact's timestamp (the
    * latest `versionTs` ≤ `factTs` per key), and a matched TOMBSTONE
    * (`deletedCol` true) yields NULL payload — a deleted dimension row
    * must not leak its pre-delete attributes into later facts, exactly as
    * a fact before the key's first version sees nulls because the
    * dimension did not exist yet. Training-data hygiene in one operator:
    * joining the CURRENT dimension state instead (the classic mistake)
    * leaks future attribute values into past examples.
    *
    * Shape at scale: [[asofJoin]]'s one-shuffle tagged union + keyed
    * windows — never an |facts| × |versions| pairing, no join node at
    * all. `tieBreak` orders same-timestamp versions (highest wins — pass
    * the version counter); equal `versionTs` and `factTs` match (a
    * version effective AT the fact instant is visible to it).
    *
    * Output: every fact column + `pit_<payload>` columns (null when no
    * version existed or the covering version is a tombstone). */
  def pointInTimeJoin(
      facts: DataFrame, dimHistory: DataFrame,
      factKey: String, dimKey: String,
      factTs: String, versionTs: String,
      dimPayload: Seq[String], tieBreak: String,
      deletedCol: Option[String] = None): DataFrame = {
    deletedCol.foreach { dc =>
      require(dimHistory.columns.contains(dc),
        s"deletedCol '$dc' is not a dimension history column")
      require(!dimPayload.contains(dc),
        s"deletedCol '$dc' must not also be in dimPayload")
    }
    val payload = dimPayload ++ deletedCol.toSeq
    val joined = asofJoin(facts, dimHistory, factKey, dimKey, factTs,
      versionTs, payload, tieBreak)
    val dead = deletedCol
      .map(dc => coalesce(col("__match").getField(dc), lit(false)))
      .getOrElse(lit(false))
    val unpacked = dimPayload.map(p =>
      when(dead, lit(null)).otherwise(col("__match").getField(p)).as(s"pit_$p"))
    joined.select((facts.columns.map(col) ++ unpacked): _*)
  }

  /** Exponentially-DECAYED event counts — the freshness-weighted feature
    * ("recent activity counts more") in EXACT integer arithmetic: per key,
    * bucket counts fold through the recurrence
    *
    *   s_b = (s_{b−1} · decayNum) DIV decayDen + count_b
    *
    * iterated over EVERY bucket from the key's first active one to the
    * common `frontier` — empty buckets contribute 0 but still decay, and
    * every key is decayed to the SAME frontier so scores are comparable.
    * Truncating DIV each step is the portability contract: any engine
    * replays the identical integers (floats would drift; λ^gap as one
    * multiply would skip the per-step truncation and diverge from the
    * streaming fold).
    *
    * Shape at scale: one combinable (key, bucket) count collapses the
    * corpus; each key then folds its OWN dense bucket sequence inside a
    * single codegen'd higher-order `aggregate` expression — no window, no
    * explode, no shuffle beyond the one groupBy. The dense span
    * (frontier − first bucket) is capped at `maxSpan` with a loud
    * in-projection refusal (the gapFill budget rule: a mis-sized
    * bucketWidth would otherwise iterate millions of empty buckets per
    * key). Returns (key, first_bucket, n_active_buckets, decayed_x —
    * the score AT the frontier). */
  def decayedCounts(
      df: DataFrame, keyCol: String, tsCol: String, bucketWidth: Long,
      decayNum: Int, decayDen: Int, frontier: Long,
      maxSpan: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(decayNum >= 0 && decayDen > 0 && decayNum < decayDen,
      s"decay must be a rational in [0, 1), got $decayNum/$decayDen")
    require(maxSpan >= 1 && maxSpan <= (1 << 20),
      s"maxSpan must be in [1, 2^20], got $maxSpan")
    require(IntegralTypes.contains(df.schema(tsCol).dataType),
      s"decayedCounts needs an integral ts column, got ${df.schema(tsCol).dataType}")
    val counts = df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), floorDiv(tsCol, bucketWidth).as("__bkt"))
      // the refuse-loudly rule, symmetric with the fold's late-data guard:
      // an event PAST the frontier silently dropped would make the served
      // scores quietly exclude the newest activity
      .withColumn("__bkt",
        when(col("__bkt") > frontier,
          raise_error(concat(lit("graft decayedCounts: event for key "),
            col(keyCol).cast("string"), lit(" in bucket "),
            col("__bkt").cast("string"),
            lit(s" is past the frontier ($frontier) — advance the frontier " +
              "or filter the feed"))))
          .otherwise(col("__bkt")))
      .groupBy(col(keyCol), col("__bkt"))
      .agg(count(lit(1)).as("__cnt"))
    val perKey = counts.groupBy(col(keyCol))
      .agg(min(col("__bkt")).as("first_bucket"),
        count(lit(1)).as("n_active_buckets"),
        map_from_entries(collect_list(struct(col("__bkt"), col("__cnt"))))
          .as("__m"))
    perKey
      .withColumn("first_bucket",
        when(lit(frontier) - col("first_bucket") >= maxSpan,
          raise_error(concat(lit("graft decayedCounts: key "),
            col(keyCol).cast("string"), lit(" spans "),
            (lit(frontier) - col("first_bucket") + 1).cast("string"),
            lit(s" buckets (cap $maxSpan) — a mis-sized bucketWidth would " +
              "iterate the dense span per key; widen the bucket or raise " +
              "maxSpan"))))
          .otherwise(col("first_bucket")))
      .withColumn("decayed_x", expr(
        s"aggregate(sequence(first_bucket, ${frontier}L), CAST(0 AS BIGINT), " +
          s"(acc, b) -> (acc * $decayNum) DIV $decayDen + " +
          "coalesce(element_at(__m, b), CAST(0 AS BIGINT)))"))
      .select(col(keyCol), col("first_bucket"), col("n_active_buckets"),
        col("decayed_x").as("decayed_x",
          new org.apache.spark.sql.types.MetadataBuilder()
            .putLong(DecayMetaWidth, bucketWidth)
            .putLong(DecayMetaNum, decayNum.toLong)
            .putLong(DecayMetaDen, decayDen.toLong)
            .putLong(DecayMetaFrontier, frontier).build()))
  }

  private[graft] val DecayMetaWidth = "graft.decay.bucketWidth"
  private[graft] val DecayMetaNum = "graft.decay.num"
  private[graft] val DecayMetaDen = "graft.decay.den"
  private[graft] val DecayMetaFrontier = "graft.decay.frontier"

  /** Fold a NEW batch of raw events into a persisted [[decayedCounts]]
    * state, advancing every key to `newFrontier`: each key's score
    * continues the recurrence stepwise from the state's stamped frontier
    * (pure decay over its empty buckets, counts added where the batch is
    * active), keys new to the state start from zero, and keys absent from
    * the batch still decay — the score is comparable across keys at every
    * fold. Batch events at or before the stamped frontier refuse loudly
    * (a decayed score cannot absorb late data — the already-applied decay
    * steps would be wrong; rebuild from history instead), as does a
    * geometry/decay-parameter mismatch. The span advanced per fold
    * (newFrontier − stamped frontier) is driver-checked against
    * `maxSpan`. */
  def decayedCountsFold(
      state: DataFrame, batch: DataFrame, keyCol: String, tsCol: String,
      newFrontier: Long, maxSpan: Int = 4096): DataFrame = {
    require(state.columns.toSeq ==
      Seq(keyCol, "first_bucket", "n_active_buckets", "decayed_x"),
      s"state must be a decayedCounts state, got ${state.columns.mkString(", ")}")
    val m = state.schema("decayed_x").metadata
    require(m.contains(DecayMetaFrontier),
      "state is missing its decay stamps — was it built by decayedCounts?")
    val width = m.getLong(DecayMetaWidth)
    val num = m.getLong(DecayMetaNum)
    val den = m.getLong(DecayMetaDen)
    val oldFrontier = m.getLong(DecayMetaFrontier)
    require(newFrontier > oldFrontier,
      s"newFrontier ($newFrontier) must be after the stamped frontier ($oldFrontier)")
    require(newFrontier - oldFrontier <= maxSpan,
      s"fold advances ${newFrontier - oldFrontier} buckets (cap $maxSpan) — " +
        "fold more often or widen the bucket")
    require(IntegralTypes.contains(batch.schema(tsCol).dataType),
      s"decayedCountsFold needs an integral ts column, got ${batch.schema(tsCol).dataType}")
    val counts = batch.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), floorDiv(tsCol, width).as("__bkt"))
      .withColumn("__bkt",
        when(col("__bkt") <= oldFrontier || col("__bkt") > newFrontier,
          raise_error(concat(lit("graft decayedCountsFold: batch event for key "),
            col(keyCol).cast("string"), lit(" in bucket "),
            col("__bkt").cast("string"),
            lit(s" is outside ($oldFrontier, $newFrontier] — a decayed " +
              "score cannot absorb late data; rebuild from history"))))
          .otherwise(col("__bkt")))
      .groupBy(col(keyCol), col("__bkt"))
      .agg(count(lit(1)).as("__cnt"))
    val perKey = counts.groupBy(col(keyCol))
      .agg(min(col("__bkt")).as("__bfirst"),
        count(lit(1)).as("__bn"),
        map_from_entries(collect_list(struct(col("__bkt"), col("__cnt"))))
          .as("__m"))
    state.join(perKey, Seq(keyCol), "full")
      .select(col(keyCol),
        least(col("first_bucket"), col("__bfirst")).as("first_bucket"),
        (coalesce(col("n_active_buckets"), lit(0L)) +
          coalesce(col("__bn"), lit(0L))).as("n_active_buckets"),
        expr(s"aggregate(sequence(${oldFrontier + 1}L, ${newFrontier}L), " +
          "coalesce(decayed_x, CAST(0 AS BIGINT)), " +
          s"(acc, b) -> (acc * $num) DIV $den + " +
          "coalesce(element_at(__m, b), CAST(0 AS BIGINT)))").as("decayed_x"))
      .select(col(keyCol), col("first_bucket"), col("n_active_buckets"),
        col("decayed_x").as("decayed_x",
          new org.apache.spark.sql.types.MetadataBuilder()
            .putLong(DecayMetaWidth, width)
            .putLong(DecayMetaNum, num)
            .putLong(DecayMetaDen, den)
            .putLong(DecayMetaFrontier, newFrontier).build()))
  }

  /** CONCENTRATION index (Herfindahl–Hirschman over permille shares):
    * per group, how concentrated its activity is across `keyCol` values —
    * `hhi = Σ share_permille²` with `share_permille = cnt·1000 DIV total`
    * (truncating, so both engines agree): 1,000,000 = everything on one
    * key, → 1,000,000/n for a uniform spread over n keys. The "is this
    * user a one-trick bot / is this market a monopoly" census, integer-
    * exact. Returns (group, n_keys, total_cnt, hhi_x1e6).
    *
    * Shape at scale: one combinable (group, key) count, then one
    * combinable per-group aggregate over the key-domain-sized relation —
    * two keyed shuffles, no window, no broadcast needed. */
  def concentration(
      df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val counts = df.filter(col(groupCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(groupCol), col(keyCol))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(groupCol)
    counts
      .withColumn("__tot", sum(col("__cnt")).over(w))
      .withColumn("__share", expr("__cnt * 1000 DIV __tot"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_keys"),
        max(col("__tot")).as("total_cnt"),
        sum(expr("__share * __share")).as("hhi_x1e6"))
  }

  /** GINI inequality index over per-key counts — [[concentration]]'s
    * companion census (HHI weighs the HEAD; Gini measures the whole
    * distribution's inequality): with a group's key counts c₁ ≤ … ≤ c_k
    * (ties ranked by key for determinism),
    *
    *   gini_x1e6 = ((2·Σ i·cᵢ − (k+1)·S) · 10^6) DIV (k·S),  S = Σ cᵢ
    *
    * — 0 for a uniform spread, → 10^6·(k−1)/k when one key holds
    * everything. Integer-exact: the numerator is non-negative by the
    * sorted-rank construction and the products run in DECIMAL(38,0).
    * Returns (group, n_keys, total_cnt, gini_x1e6).
    *
    * Shape at scale: one combinable (group, key) count, ONE group-keyed
    * rank window over the key-domain-sized relation (never the raw rows),
    * one combinable aggregate. */
  def inequality(
      df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val counts = df.filter(col(groupCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(groupCol), col(keyCol))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(groupCol)
      .orderBy(col("__cnt").asc, col(keyCol).asc)
    counts
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("__cnt")).as("total_cnt"),
        sum(expr("CAST(__i AS DECIMAL(38,0)) * __cnt")).as("__ic"))
      .withColumn("gini_x1e6", expr(
        "CAST(((2 * __ic - CAST(n_keys + 1 AS DECIMAL(38,0)) * total_cnt) " +
          "* 1000000) DIV (CAST(n_keys AS DECIMAL(38,0)) * total_cnt) AS BIGINT)"))
      .select(col(groupCol), col("n_keys"), col("total_cnt"), col("gini_x1e6"))
  }

  /** TOP-K event PATHS — "what are the most common 3-step user
    * journeys": per key, every window of `length` consecutive events (by
    * ts, tie-broken) becomes a path string, counted corpus-wide, top-k
    * by (count desc, path asc). One keyed window (lead × length−1, the
    * per-key event sort the sessionizer already pays), one combinable
    * count, a TakeOrdered — never a global sort. Returns
    * (rank, path, cnt). */
  def topPaths(
      df: DataFrame, keyCol: String, typeCol: String, tsCol: String,
      tieBreak: String, length: Int, k: Int): DataFrame = {
    require(length >= 2 && length <= 8, s"length must be in [2, 8], got $length")
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieBreak))
    val leads = (1 until length).map(i =>
      lead(col(typeCol), i).over(w).as(s"__t$i"))
    val withLeads = df.select(
      (Seq(col(keyCol), col(typeCol).as("__t0")) ++ leads): _*)
    val full = (1 until length).map(i => col(s"__t$i").isNotNull)
      .reduce(_ && _)
    withLeads.filter(full)
      .select(concat_ws(">",
        (0 until length).map(i => col(s"__t$i")): _*).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path").asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("path").asc)).cast("long"))
      .select(col("rank"), col("path"), col("cnt"))
  }

  /** Per-key activity STREAKS (islands-and-gaps): for each key, its
    * consecutive-bucket runs of activity — total active buckets, number
    * of streaks, the longest streak, and the CURRENT streak (the one
    * containing the key's last active bucket) with that last bucket. The
    * engagement shape next to DAU/MAU ("7-day streak!"), and a data-
    * freshness census when keyed by source/table.
    *
    * Shape at scale: ONE map-side-combinable distinct collapses the
    * corpus to the (key, bucket) activity relation — the SAME sufficient
    * statistic [[retentionCohorts]]/[[activeUsers]] ride — then the
    * island window (bucket − row_number, the classic gaps-and-islands
    * identity: consecutive buckets share the difference) runs keyed by
    * key over that TINY relation, never the raw events. Pre-epoch
    * timestamps floor correctly (negative-safe bucket arithmetic). */
  def streaks(
      df: DataFrame, keyCol: String, tsCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(IntegralTypes.contains(df.schema(tsCol).dataType),
      s"streaks needs an integral ts column, got ${df.schema(tsCol).dataType}")
    val act = df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), floorDiv(tsCol, bucketWidth).as("__bkt"))
      .distinct()
    val w = Window.partitionBy(keyCol).orderBy(col("__bkt"))
    val islands = act
      .withColumn("__isl", col("__bkt") - row_number().over(w))
      .groupBy(col(keyCol), col("__isl"))
      .agg(count(lit(1)).as("__len"), max(col("__bkt")).as("__end"))
    islands.groupBy(col(keyCol))
      .agg(sum(col("__len")).as("n_active_buckets"),
        count(lit(1)).as("n_streaks"),
        max(col("__len")).as("longest_streak"),
        max(struct(col("__end"), col("__len"))).as("__last"))
      .select(col(keyCol), col("n_active_buckets"), col("n_streaks"),
        col("longest_streak"), col("__last.__len").as("current_streak"),
        col("__last.__end").as("last_bucket"))
  }

  private val GapFillMetaWidth = "graft.gapfill.bucketWidth"

  /** The PERSISTED frontier of a gap-fill stream: each key's LAST
    * observation — (key, bucket, ts_last, tie_last, v_last), the exact
    * sufficient statistic for continuing the dense grid into the next
    * batch without re-scanning history (LOCF carries v_last forward;
    * linear interpolates from it). `bucketWidth` is stamped in the
    * `bucket` column's metadata so a mismatched continuation refuses.
    * Fold new batches with [[gapFillFrontierFold]] (struct-max —
    * idempotent, replay-safe); serve each batch period's fill rows with
    * [[gapFillContinue]]. */
  def gapFillFrontier(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      tieBreak: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(GapFillMetaWidth, bucketWidth).build()
    df.select(col(keyCol),
        col(tsCol).cast("bigint").as("__ts"),
        col(tieBreak).cast("bigint").as("__tie"),
        col(valueCol).cast("bigint").as("__v"))
      .groupBy(col(keyCol))
      .agg(max(struct(col("__ts"), col("__tie"), col("__v"))).as("__top"))
      .select(col(keyCol), col("__top.__ts").as("__lts"),
        col("__top.__tie").as("tie_last"), col("__top.__v").as("v_last"))
      .select(col(keyCol),
        floorDiv("__lts", bucketWidth).cast("bigint").as("bucket", meta),
        col("__lts").as("ts_last"), col("tie_last"), col("v_last"))
  }

  private def requireGapFrontier(f: DataFrame, op: String, width: Long): Unit = {
    require(f.columns.length == 5 &&
      f.columns.drop(1).toSeq == Seq("bucket", "ts_last", "tie_last", "v_last"),
      s"$op expects a gapFillFrontier (key, bucket, ts_last, tie_last, " +
        s"v_last), got ${f.columns.mkString(", ")}")
    val m = f.schema("bucket").metadata
    if (m.contains(GapFillMetaWidth))
      require(m.getLong(GapFillMetaWidth) == width,
        s"frontier is stamped bucketWidth=${m.getLong(GapFillMetaWidth)} " +
          s"but $op was called with $width — mixing grids corrupts the fill")
  }

  /** Fold a batch into a persisted gap-fill frontier: per key the LATER
    * observation wins (struct-max over (ts, tie, v) — idempotent and
    * commutative, so replays are exact; the ORDERING contract lives in
    * [[gapFillContinue]], which refuses late batches loudly). */
  def gapFillFrontierFold(
      frontier: DataFrame, batch: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieBreak: String, bucketWidth: Long): DataFrame = {
    requireGapFrontier(frontier, "gapFillFrontierFold", bucketWidth)
    val b = gapFillFrontier(batch, keyCol, tsCol, valueCol, tieBreak, bucketWidth)
    frontier.unionByName(b)
      .groupBy(col(keyCol))
      .agg(max(struct(col("ts_last"), col("tie_last"), col("v_last"),
        col("bucket"))).as("__top"))
      .select(col(keyCol),
        col("__top.bucket").as("bucket",
          frontier.schema("bucket").metadata),
        col("__top.ts_last").as("ts_last"), col("__top.tie_last").as("tie_last"),
        col("__top.v_last").as("v_last"))
  }

  /** Continue a gap-fill stream from a persisted frontier: the dense fill
    * rows for THE BATCH PERIOD ONLY — per key, buckets strictly after its
    * frontier bucket up to its last batch observation, LOCF'd (or linearly
    * interpolated) across the state/batch boundary exactly as the one-shot
    * [[gapFill]] over all history would produce them. History is never
    * re-scanned: the frontier row is the only state-side input, unioned
    * into the batch before one [[gapFill]] pass (one keyed join to clip at
    * the frontier bucket).
    *
    * ORDERING contract (the [[transitionFold]] rule, at BUCKET
    * granularity): every batch observation must land in a bucket STRICTLY
    * AFTER its key's frontier bucket — the grid through the frontier
    * bucket has already been served as final (its bucket representative
    * included), so an observation landing in or before it would rewrite
    * served rows; it refuses loudly at execution time. Batches that
    * arrive on bucket boundaries (the daily-drop shape) satisfy this by
    * construction. Keys absent from the frontier fill their whole
    * observed span. */
  def gapFillContinue(
      frontier: DataFrame, batch: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieBreak: String, bucketWidth: Long,
      mode: String = "locf"): DataFrame = {
    requireGapFrontier(frontier, "gapFillContinue", bucketWidth)
    require(!batch.columns.exists(_.startsWith("__")),
      "gapFillContinue batch must not carry __-prefixed columns")
    val f = frontier.select(col(keyCol), col("bucket").as("__fb"),
      col("ts_last").as("__fts"), col("tie_last").as("__ftie"),
      col("v_last").as("__fv"))
    // strictly-later guard rides the join projection (left join: new keys
    // pass with a null frontier)
    val guarded = batch
      .select(col(keyCol), col(tsCol).cast("bigint").as("__bts"),
        col(tieBreak).cast("bigint").as("__btie"),
        col(valueCol).cast("bigint").as("__bv"))
      .withColumn("__bb", floorDiv("__bts", bucketWidth).cast("bigint"))
      .join(f, Seq(keyCol), "left")
      .withColumn("__chk",
        when(col("__fb").isNotNull && col("__bb") <= col("__fb"),
          raise_error(concat(
            lit("graft gapFillContinue: batch observation in bucket "),
            col("__bb").cast("string"),
            lit(" is not strictly after its key's served frontier bucket "),
            col("__fb").cast("string"),
            lit(" — late or replayed data would rewrite fill rows already "
              + "served; deliver batches on bucket boundaries"))))
          .otherwise(lit(1)))
      .filter(col("__chk") === 1)
    // the frontier row joins the batch as one more observation, so the
    // boundary fill (LOCF carry, linear slope) is computed by the SAME
    // gapFill kernel as the one-shot — then clipped to the batch period
    val asObs = guarded
      .select(col(keyCol), col("__bts").as("ts"), col("__btie").as("tie"),
        col("__bv").as("v"))
      .unionByName(f.select(col(keyCol), col("__fts").as("ts"),
        col("__ftie").as("tie"), col("__fv").as("v")))
    val filled = gapFill(asObs, keyCol, "ts", "v", "tie", bucketWidth, mode)
    filled.join(f.select(col(keyCol), col("__fb")), Seq(keyCol), "left")
      .filter(col("__fb").isNull || col("bucket") > col("__fb"))
      .drop("__fb")
      .withColumnRenamed("v", valueCol)
  }

  /** LINEAR MULTI-TOUCH ATTRIBUTION: each conversion's credit split in
    * integer-exact permille across its key's touches in the trailing
    * `lookback` window (`cts − lookback ≤ tts ≤ cts`) — the
    * marketing-analytics step between last-touch ([[asofJoin]] IS
    * last-touch) and data-driven models. Every touch gets
    * `1000 DIV n`; the LAST touch (latest ts, ties to the larger id)
    * absorbs the truncation remainder so each conversion's weights sum
    * to exactly 1000. Conversions with no in-window touch are absent
    * (left-join against conversions to see them).
    *
    * Shape at scale: the [[rangeJoin]] machinery keyed BY USER — each
    * conversion replicates to its ≤ lookback/bucketWidth+1 covered
    * buckets (loud refusal past `maxBucketsPerInterval`), touches land in
    * exactly ONE bucket, so every qualifying pair meets once on the
    * (key, bucket) equi-join — no cartesian, no dedup pass; the weight
    * windows ride the output-bound pair set keyed by conversion. Returns
    * (key, conv_id, touch_id, touch_ts, weight_permille). */
  def attributionLinear(
      df: DataFrame, keyCol: String, typeCol: String, tsCol: String,
      idCol: String, convType: String, touchType: String,
      lookback: Long, bucketWidth: Long,
      maxBucketsPerInterval: Long = 65536L): DataFrame = {
    require(lookback >= 0, s"lookback must be >= 0, got $lookback")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(convType != touchType,
      "convType and touchType must differ — self-attribution is degenerate")
    require(IntegralTypes.contains(df.schema(tsCol).dataType),
      s"tsCol $tsCol must be integral, got ${df.schema(tsCol).dataType}")
    val conv = df.filter(col(typeCol) === convType)
      .select(col(keyCol).as("__k"), col(idCol).cast("bigint").as("conv_id"),
        col(tsCol).cast("bigint").as("__cts"))
      .withColumn("__s", col("__cts") - lookback)
      .withColumn("__b", boundedBuckets("__s", "__cts", bucketWidth,
        maxBucketsPerInterval, "attributionLinear"))
    val touch = df.filter(col(typeCol) === touchType)
      .select(col(keyCol).as("__k"), col(idCol).cast("bigint").as("touch_id"),
        col(tsCol).cast("bigint").as("touch_ts"))
      .withColumn("__b", floorDiv("touch_ts", bucketWidth))
    val pairs = touch.join(conv, Seq("__k", "__b"))
      .filter(col("touch_ts") >= col("__s") && col("touch_ts") <= col("__cts"))
    val wAll = Window.partitionBy("conv_id")
    val wLast = Window.partitionBy("conv_id")
      .orderBy(col("touch_ts").desc, col("touch_id").desc)
    pairs
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__rn", row_number().over(wLast))
      .select(col("__k").as(keyCol), col("conv_id"), col("touch_id"),
        col("touch_ts"),
        when(col("__rn") === 1,
          lit(1000L) - (col("__n") - 1L) * expr("1000 DIV __n"))
          .otherwise(expr("1000 DIV __n"))
          .as("weight_permille"))
  }

  /** TWO-WINDOW CHANGE RATIO (drift/changepoint census): per key and
    * bucket, the sum of the NEXT `window` buckets as an integer-exact
    * permille of the PREVIOUS `window` buckets' sum — the CUSUM-lite
    * level-shift detector feature pipelines run per metric series ("did
    * this segment's daily spend step up this week"). Ratio is null when
    * the trailing window is empty or sums to 0 (division semantics
    * diverge across engines there; callers filter or coalesce).
    *
    * Shape at scale: ONE combinable per-(key, bucket) pre-aggregate (the
    * only corpus shuffle) — the windows then ride the ≤ |keys|·|buckets|
    * bucketed series with RANGE frames on the bucket VALUE, so gaps in
    * the series are handled by arithmetic, not by row counting. `valueCol`
    * must be integral and non-negative (the ratio's truncating division
    * is only engine-portable on non-negative sums). Returns
    * (key, bucket, bucket_sum, trail_sum, lead_sum, ratio_permille). */
  def changeRatio(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      bucketWidth: Long, window: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(window >= 1, s"window must be >= 1 bucket, got $window")
    require(IntegralTypes.contains(df.schema(tsCol).dataType),
      s"tsCol $tsCol must be integral, got ${df.schema(tsCol).dataType}")
    require(IntegralTypes.contains(df.schema(valueCol).dataType),
      s"valueCol $valueCol must be integral (got " +
        s"${df.schema(valueCol).dataType}) — scale to cents first")
    val v = when(col(valueCol) < 0, raise_error(concat(
        lit(s"graft changeRatio: negative value in $valueCol ("),
        col(valueCol).cast("string"),
        lit(") — the permille ratio needs non-negative sums; split by " +
          "sign upstream"))))
      .otherwise(col(valueCol).cast("long"))
    val series = df
      .select(col(keyCol), floorDiv(tsCol, bucketWidth).cast("bigint").as("bucket"),
        v.as("__v"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(sum(col("__v")).as("bucket_sum"))
    val trail = Window.partitionBy(keyCol).orderBy(col("bucket"))
      .rangeBetween(-window, -1)
    val lead = Window.partitionBy(keyCol).orderBy(col("bucket"))
      .rangeBetween(0, window - 1)
    series
      .withColumn("trail_sum", sum(col("bucket_sum")).over(trail))
      .withColumn("lead_sum", sum(col("bucket_sum")).over(lead))
      .withColumn("ratio_permille",
        when(col("trail_sum") > 0,
          expr("(lead_sum * 1000) DIV trail_sum")))
  }

  /** COHORT VALUE CURVES (the LTV triangle): per acquisition cohort
    * (= each key's FIRST bucket, the [[retentionCohorts]] convention) and
    * cohort age, the events and value contributed at that age plus the
    * RUNNING totals — the "cumulative revenue per cohort member by day N"
    * curve product analytics reads next to the retention triangle.
    * `cum_value_per_key` is the integer-exact per-member LTV:
    * `cum_value DIV cohort size` (size = keys acquired in the cohort,
    * constant down the column — retention decay does not shrink the
    * denominator, the standard LTV convention).
    *
    * `valueCol` must be integral (cents) and NON-NEGATIVE — a negative
    * value refuses loudly at execution time, because the truncating
    * per-key division is only engine-portable on non-negative numerators
    * (Spark DIV truncates toward zero, DuckDB // floors); net out refunds
    * upstream or shift the domain.
    *
    * Shape at scale: one per-key MIN (combinable), one keyed join of the
    * events against their key's cohort, one combinable (cohort, age)
    * aggregate — then the running sums ride a window over the TINY
    * |buckets|² triangle and the sizes join back broadcast. Returns
    * (cohort, day_offset, n_events, value_sum, cum_value,
    * cum_value_per_key). */
  def cohortValue(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(IntegralTypes.contains(df.schema(tsCol).dataType),
      s"tsCol $tsCol must be integral, got ${df.schema(tsCol).dataType}")
    require(IntegralTypes.contains(df.schema(valueCol).dataType),
      s"valueCol $valueCol must be integral (got " +
        s"${df.schema(valueCol).dataType}) — scale to cents first")
    val v = when(col(valueCol) < 0, raise_error(concat(
        lit(s"graft cohortValue: negative value in $valueCol ("),
        col(valueCol).cast("string"),
        lit(") — the truncating per-key division needs non-negative " +
          "values; net out refunds upstream"))))
      .otherwise(col(valueCol).cast("long"))
    val e = df.select(col(keyCol).as("__k"),
      floorDiv(tsCol, bucketWidth).cast("bigint").as("__b"), v.as("__v"))
    val cohort = e.groupBy(col("__k")).agg(min("__b").as("__c"))
    val sized = cohort.groupBy(col("__c")).agg(count(lit(1)).as("__size"))
    val cells = e.join(cohort, "__k")
      .groupBy(col("__c").as("cohort"), (col("__b") - col("__c")).as("day_offset"))
      .agg(count(lit(1)).as("n_events"), sum(col("__v")).as("value_sum"))
    val w = Window.partitionBy("cohort").orderBy("day_offset")
    cells
      .withColumn("cum_value", sum(col("value_sum")).over(w))
      .join(broadcast(sized.withColumnRenamed("__c", "cohort")), "cohort")
      .select(col("cohort"), col("day_offset"), col("n_events"),
        col("value_sum"), col("cum_value"),
        expr("cum_value DIV __size").as("cum_value_per_key"))
  }

  /** The bounded per-gap replication budget of [[gapFill]]: a single gap
    * wider than this many buckets refuses loudly at EXECUTION time (a
    * mis-sized `bucketWidth` against sparse keys would otherwise explode
    * one row into millions — the intervalJoin fan-out rule). */
  val GapFillMaxGap: Long = 4096L

  /** TIME-SERIES GAP-FILL / resample: per key, a DENSE bucket grid from
    * that key's first to last observation, each missing bucket filled from
    * its neighbors — the classic feature-pipeline regularization step
    * (sensor/metric series → fixed-cadence model inputs).
    *
    * `mode`:
    *  - `"locf"` — last observation carried forward.
    *  - `"linear"` — integer-exact interpolation toward the next
    *    observation: `v + sign(nv − v) · (|nv − v| · (out − b)) DIV (nb − b)`
    *    — the sign factored out so the truncating division is always
    *    non-negative and replays identically in engines whose integer
    *    division rounds differently (Spark `DIV` truncates toward zero,
    *    DuckDB `//` floors).
    *
    *  Buckets are floor division of the integral `tsCol`; within a
    * (key, bucket) the LATEST observation wins, deterministically —
    * ties on `tsCol` break to the larger (`tieBreak`, `valueCol`)
    * (struct-max, total order). `valueCol` must be integral (the
    * integer-exactness house rule for `linear`; enforced for both modes
    * for output-type stability).
    *
    * Shape at scale: one combinable per-(key, bucket) aggregate (the only
    * corpus shuffle), ONE keyed window for the next-observation lookahead
    * (no grid join, no global sort), then a bounded `sequence` explode
    * that writes each gap's fill rows directly — gaps wider than
    * [[GapFillMaxGap]] buckets refuse loudly at execution time via the
    * raise_error-in-projection house pattern. Output:
    * (key, bucket, <valueCol>, is_observed), one row per key per bucket in
    * the key's observed span. */
  def gapFill(
      df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      tieBreak: String, bucketWidth: Long, mode: String = "locf"): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(mode == "locf" || mode == "linear",
      s"mode must be 'locf' or 'linear', got '$mode'")
    require(IntegralTypes.contains(df.schema(tsCol).dataType),
      s"tsCol $tsCol must be integral, got ${df.schema(tsCol).dataType}")
    require(IntegralTypes.contains(df.schema(valueCol).dataType),
      s"valueCol $valueCol must be integral (got " +
        s"${df.schema(valueCol).dataType}) — scale to cents/micros first, " +
        "the integer-exactness house rule")
    require(!df.columns.exists(_.startsWith("__")),
      s"gapFill input must not carry __-prefixed columns, got " +
        df.columns.filter(_.startsWith("__")).mkString(", "))
    // latest observation per (key, bucket): struct-max is deterministic
    // under the (ts, tieBreak, value) total order and map-side combinable
    val obs = df
      .select(col(keyCol), floorDiv(tsCol, bucketWidth).cast("bigint").as("__b"),
        col(tsCol).cast("bigint").as("__ts"),
        col(tieBreak).cast("bigint").as("__tie"),
        col(valueCol).cast("bigint").as("__v"))
      .groupBy(col(keyCol), col("__b"))
      .agg(max(struct(col("__ts"), col("__tie"), col("__v"))).as("__top"))
      .select(col(keyCol), col("__b"), col("__top.__v").as("__v"))
    val w = Window.partitionBy(keyCol).orderBy(col("__b"))
    val withNext = obs
      .withColumn("__nb", lead(col("__b"), 1).over(w))
      .withColumn("__nv", lead(col("__v"), 1).over(w))
    val gapGuarded = withNext.withColumn("__end",
      when(col("__nb").isNotNull && col("__nb") - col("__b") > GapFillMaxGap,
        raise_error(concat(
          lit(s"graft gapFill: a gap of "), (col("__nb") - col("__b")).cast("string"),
          lit(s" buckets exceeds the $GapFillMaxGap replication budget — " +
            "widen bucketWidth or split the series upstream"))))
        .otherwise(coalesce(col("__nb") - 1L, col("__b"))))
    val filled = gapGuarded
      .select(col(keyCol), col("__b"), col("__v"), col("__nv"), col("__end"),
        explode(sequence(col("__b"), col("__end"))).as("bucket"))
    val value = mode match {
      case "locf" => col("__v")
      case "linear" =>
        when(col("bucket") === col("__b") || col("__nv").isNull, col("__v"))
          .otherwise(col("__v") +
            signum(col("__nv") - col("__v")).cast("bigint") *
              expr("(abs(__nv - __v) * (bucket - __b)) DIV (__end + 1 - __b)"))
    }
    filled.select(col(keyCol), col("bucket"), value.as(valueCol),
      (col("bucket") === col("__b")).as("is_observed"))
  }
}
