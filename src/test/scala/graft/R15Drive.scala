package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 end-to-end drive of the new public surface: transitionMatrix,
  * funnelState/funnelFold/funnelOf over real event parquet, pre-epoch
  * retention/rangeJoin floor semantics, and the tfidf single-pass build. */
object R15Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("ets"))

    // 1. transition matrix through the library operator, 1- and 3-step
    val t1 = graft.operators.Temporal.transitionMatrix(
      ev, "user_id", "event_type", "ets", "event_id")
    val t3 = graft.operators.Temporal.transitionMatrix(
      ev, "user_id", "event_type", "ets", "event_id", step = 3)
    val n1 = t1.agg(sum("n_steps")).head().getLong(0)
    val n3 = t3.agg(sum("n_steps")).head().getLong(0)
    assert(n1 > 0 && n3 > 0 && n3 < n1, s"transition totals n1=$n1 n3=$n3")
    println(s"OK transitionMatrix: 1-step total $n1, 3-step total $n3")

    // 2. incremental funnel over a THREE-way fold matches one-shot
    val steps = Seq("view", "click", "purchase")
    val mm = ev.agg(min("ets"), max("ets")).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val c1 = lo + (hi - lo) / 3
    val c2 = lo + 2 * (hi - lo) / 3
    val T = graft.operators.Temporal
    var st = T.funnelState(ev.filter(col("ets") <= c1),
      "user_id", "event_type", "ets", steps)
    st = T.funnelFold(st, ev.filter(col("ets") > c1 && col("ets") <= c2),
      "user_id", "event_type", "ets", steps)
    st = T.funnelFold(st, ev.filter(col("ets") > c2),
      "user_id", "event_type", "ets", steps)
    val inc = T.funnelOf(st).orderBy("user_id").collect().map(_.toSeq).toSeq
    val one = T.funnel(ev, "user_id", "event_type", "ets", steps)
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(inc == one, s"3-way fold diverged: ${inc.size} vs ${one.size} rows")
    println(s"OK funnel 3-way fold == one-shot (${one.size} users)")

    // 3. pre-epoch retention: shift all timestamps so half go negative;
    //    floor semantics must keep every (cohort, offset) cell identical
    //    to the unshifted run (offsets are shift-invariant under FLOOR)
    val w = 86400000000L
    val mid = (lo + hi) / 2
    val shiftBuckets = mid / w // whole buckets so cells translate exactly
    val r0 = T.retentionCohorts(ev, "user_id", "ets", w)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rs = T.retentionCohorts(
        ev.withColumn("ets", col("ets") - lit(shiftBuckets * w)), "user_id", "ets", w)
      .collect().map(r => (r.getLong(0) + shiftBuckets, r.getLong(1)) -> r.getLong(2)).toMap
    assert(r0 == rs, "pre-epoch retention cells diverged from shifted run")
    assert(rs.nonEmpty)
    println(s"OK retention shift-invariance across the epoch (${r0.size} cells)")

    // 4. tfidf pairs on a composed (filtered) input — the single-pass path
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val pairs = graft.operators.Dedup.tfidfCosinePairs(
      docs.filter(col("doc_id") % 3 =!= 1), "doc_id", "text")
    val np = pairs.count()
    println(s"OK tfidfCosinePairs on composed input: $np pairs")
    graft.operators.Dedup.releaseIntermediates()
    spark.stop()
    println("R15Drive: ALL OK")
  }
}
