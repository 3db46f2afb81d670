package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Graph, Similarity, TextCorpus}

import Catalog.Q
import GateSupport._

/** Event-analytics and temporal-join gates: funnel / retention / transitions / rolling-activity families (one-shot, windowed, rates, persisted folds, streaming maintainers) plus as-of / range / interval / sessionize / skew joins.
  *
  * Split from the monolithic Catalog (round 16) — same `Q` registrations,
  * re-aggregated by [[Catalog.all]]; shared fixture readers and oracle
  * fragments live in [[GateSupport]]. */
private[queries] object CatalogEvents {
  val gates: Seq[Q] = Seq(
    // as-of (point-in-time) join: each event matched to the user's most
    // recent order at event time — all orders predate all events in this
    // data, so the oracle reduces to latest-order-per-customer, while the
    // Spark side runs the general one-shuffle union+window implementation
    // bucketized range join (no equi key — the case Spark would plan as a
    // cartesian): purchases within the 10 minutes following each error
    // event. Micros on both sides (`ts div 1000` ≡ DuckDB epoch_us)
    Q("range_join",
      (s, d) => {
        val ev = t(s, d, "events")
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("error_id"),
            expr("ts div 1000").as("err_start"),
            (expr("ts div 1000") + 600000000L).as("err_end"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), expr("ts div 1000").as("pts"))
        graft.operators.Temporal.rangeJoin(
            purchases, "pts", errors, "err_start", "err_end",
            bucketWidth = 600000000L)
          .select("error_id", "purchase_id")
      },
      Some("""SELECT e.event_id AS error_id, p.event_id AS purchase_id
        FROM events e JOIN events p
          ON e.event_type = 'error' AND p.event_type = 'purchase'
          AND epoch_us(p.ts) BETWEEN epoch_us(e.ts) AND epoch_us(e.ts) + 600000000""")),

    // gaps-and-islands sessionization: 12h max gap over each user's event
    // stream, aggregated to one row per session. The oracle replicates the
    // two-window assignment (lag + running sum) in ANSI SQL verbatim —
    // the assignment itself is compared, not just session counts.
    Q("sessionize",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ets"))
        graft.operators.Temporal.sessionize(ev, "user_id", "ets",
            maxGap = 43200000000L, tieBreak = "event_id")
          .groupBy("user_id", "session_idx")
          .agg(count(lit(1)).as("n_events"),
            min("ets").as("start_us"), max("ets").as("end_us"))
      },
      Some("""WITH g AS (SELECT user_id, event_id, epoch_us(ts) AS ets,
          epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
        FROM events),
        s AS (SELECT user_id, ets,
          SUM(CASE WHEN gap IS NULL OR gap > 43200000000 THEN 1 ELSE 0 END) OVER
            (PARTITION BY user_id ORDER BY ets, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS session_idx
        FROM g)
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
          count(*) AS n_events, min(ets) AS start_us, max(ets) AS end_us
        FROM s GROUP BY 1, 2""")),

    // INCREMENTAL sessionization: yesterday's per-key frontier (last event
    // ts/tie/session_idx) continues assignment into today's batch — batch
    // windows only, history never re-sorted; sessions spanning the cut
    // must merge and indices stay globally consecutive per key, so the
    // oracle is the ONE-SHOT assignment over everything
    Q("event_sessionize_incremental",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ets"))
        val mm = ev.agg(min("ets").as("lo"), max("ets").as("hi")).head()
        val cut = (mm.getLong(0) + mm.getLong(1)) / 2
        val T = graft.operators.Temporal
        val (assigned1, f1) = T.sessionizeState(ev.filter(col("ets") <= cut),
          "user_id", "ets", maxGap = 43200000000L, tieBreak = "event_id")
        val (assigned2, _) = T.sessionizeFold(f1, ev.filter(col("ets") > cut),
          "user_id", "ets", maxGap = 43200000000L, tieBreak = "event_id")
        assigned1.unionByName(assigned2)
          .groupBy("user_id", "session_idx")
          .agg(count(lit(1)).as("n_events"),
            min("ets").as("start_us"), max("ets").as("end_us"))
      },
      Some("""WITH g AS (SELECT user_id, event_id, epoch_us(ts) AS ets,
          epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
        FROM events),
        s AS (SELECT user_id, ets,
          SUM(CASE WHEN gap IS NULL OR gap > 43200000000 THEN 1 ELSE 0 END) OVER
            (PARTITION BY user_id ORDER BY ets, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS session_idx
        FROM g)
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
          count(*) AS n_events, min(ets) AS start_us, max(ets) AS end_us
        FROM s GROUP BY 1, 2""")),

    // ordered funnel (view → click → purchase): earliest qualifying chain
    // per user — one map-side-combinable MIN per step, keyed joins, no
    // windows; completes the event-analytics family next to sessionize
    Q("event_funnel",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ets"))
        graft.operators.Temporal.funnel(ev, "user_id", "event_type", "ets",
          Seq("view", "click", "purchase"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ets FROM events),
        s1 AS (SELECT user_id, min(ets) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(ets) AS t2 FROM e JOIN s1 USING (user_id)
          WHERE event_type = 'click' AND ets > t1 GROUP BY 1),
        s3 AS (SELECT e.user_id, min(ets) AS t3 FROM e JOIN s2 USING (user_id)
          WHERE event_type = 'purchase' AND ets > t2 GROUP BY 1)
        SELECT s1.user_id, t1 AS step_1_ts, t2 AS step_2_ts, t3 AS step_3_ts,
          CAST(1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
            + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS steps_completed
        FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""")),

    // FUNNEL LATENCY percentiles — operator algebra: completed funnels
    // (view→click→purchase) feed their end-to-end duration into the
    // mergeable quantile sketch, keyed by the conversion's cohort day.
    // "How long does conversion take, p50/p95/p99, per day" with NO
    // per-group sort — the funnel is combinable MINs and the sketch is a
    // combinable histogram; the oracle replays the chain AND the bucket
    // arithmetic bit-for-bit
    Q("event_funnel_latency",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ets"))
        val f = graft.operators.Temporal.funnel(ev, "user_id", "event_type",
            "ets", Seq("view", "click", "purchase"))
          .filter(col("steps_completed") === 3)
        val dur = f.select(expr("step_1_ts div 86400000000").as("cohort_day"),
          (col("step_3_ts") - col("step_1_ts")).as("latency_us"))
        graft.operators.Sketches.quantileSketch(dur, "cohort_day",
          "latency_us", Seq(500, 950, 990), mantissaBits = 6)
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ets FROM events),
        s1 AS (SELECT user_id, min(ets) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(ets) AS t2 FROM e JOIN s1 USING (user_id)
          WHERE event_type = 'click' AND ets > t1 GROUP BY 1),
        s3 AS (SELECT e.user_id, min(ets) AS t3 FROM e JOIN s2 USING (user_id)
          WHERE event_type = 'purchase' AND ets > t2 GROUP BY 1),
        v AS (SELECT t1 // 86400000000 AS g, t3 - t1 AS val
          FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)),
        b AS (SELECT g, greatest(length(bin(val)) - 1 - 6, 0) AS shift,
            val >> greatest(length(bin(val)) - 1 - 6, 0) AS bid, count(*) AS cnt
          FROM v GROUP BY 1, 2, 3),
        ed AS (SELECT g, cnt, (bid << shift) AS lo,
            (((bid + 1) << shift) - 1) AS hi FROM b),
        c AS (SELECT g, hi, sum(cnt) OVER (PARTITION BY g ORDER BY lo) AS cum,
            sum(cnt) OVER (PARTITION BY g) AS tot FROM ed)
        SELECT g AS cohort_day, CAST(q.q AS BIGINT) AS q_permille,
          CAST(min(CASE WHEN cum * 1000 >= q.q * tot THEN hi END) AS BIGINT) AS est
        FROM c, (VALUES (500), (950), (990)) AS q(q) GROUP BY 1, 2""")),

    // INCREMENTAL funnel (the round-14 persisted-state pattern): build the
    // per-key funnel state on the first half of the time range, fold the
    // second half in with funnelFold (cost scales with the batch, never
    // the history; late data refuses loudly), serve with funnelOf — the
    // oracle is the ONE-SHOT funnel over the union, so the fold identity
    // is what the gate certifies
    Q("event_funnel_incremental",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ets"))
        val mm = ev.agg(min("ets").as("lo"), max("ets").as("hi")).head()
        val cut = (mm.getLong(0) + mm.getLong(1)) / 2
        val steps = Seq("view", "click", "purchase")
        val st = graft.operators.Temporal.funnelState(
          ev.filter(col("ets") <= cut), "user_id", "event_type", "ets", steps)
        val folded = graft.operators.Temporal.funnelFold(
          st, ev.filter(col("ets") > cut), "user_id", "event_type", "ets", steps)
        graft.operators.Temporal.funnelOf(folded)
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ets FROM events),
        s1 AS (SELECT user_id, min(ets) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(ets) AS t2 FROM e JOIN s1 USING (user_id)
          WHERE event_type = 'click' AND ets > t1 GROUP BY 1),
        s3 AS (SELECT e.user_id, min(ets) AS t3 FROM e JOIN s2 USING (user_id)
          WHERE event_type = 'purchase' AND ets > t2 GROUP BY 1)
        SELECT s1.user_id, t1 AS step_1_ts, t2 AS step_2_ts, t3 AS step_3_ts,
          CAST(1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
            + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS steps_completed
        FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""")),

    // user-journey transition matrix (Markov flows): count of (event_type
    // → next event_type) steps across each user's time-ordered stream —
    // the per-user window is keyed (bounded by one user's events, the
    // sessionize contract), the count map-side-combinable; ties broken on
    // event_id so the order is total and the oracle replays it exactly
    Q("event_transitions",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("ts div 1000").as("ets"))
        graft.operators.Temporal.transitionMatrix(
          ev, "user_id", "event_type", "ets", "event_id")
      },
      Some("""WITH o AS (SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts), event_id) AS next_type
        FROM events)
        SELECT event_type AS from_type, next_type AS to_type,
          CAST(count(*) AS BIGINT) AS n_steps
        FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2""")),

    // funnel step-conversion summary: |steps| rows of (reached,
    // conversion permille vs entrants) — the serving rollup of the
    // funnel family, integer-exact
    Q("event_funnel_rates",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ets"))
        val f = graft.operators.Temporal.funnel(ev, "user_id", "event_type", "ets",
          Seq("view", "click", "purchase"))
        graft.operators.Temporal.funnelRates(f, steps = 3)
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ets FROM events),
        s1 AS (SELECT user_id, min(ets) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(ets) AS t2 FROM e JOIN s1 USING (user_id)
          WHERE event_type = 'click' AND ets > t1 GROUP BY 1),
        s3 AS (SELECT e.user_id, min(ets) AS t3 FROM e JOIN s2 USING (user_id)
          WHERE event_type = 'purchase' AND ets > t2 GROUP BY 1),
        n AS (SELECT (SELECT count(*) FROM s1) AS n1,
          (SELECT count(*) FROM s2) AS n2, (SELECT count(*) FROM s3) AS n3)
        SELECT CAST(s.step AS BIGINT) AS step, CAST(s.r AS BIGINT) AS reached,
          CAST(CASE WHEN n1 = 0 THEN 0 ELSE s.r * 1000 // n1 END AS BIGINT)
            AS permille_of_entered
        FROM n, (SELECT 1 AS step, (SELECT n1 FROM n) AS r
          UNION ALL SELECT 2, (SELECT n2 FROM n)
          UNION ALL SELECT 3, (SELECT n3 FROM n)) s""")),

    // CONVERSION-WINDOW funnel: every step must land within 2 days of the
    // user's anchor (earliest view) — the product-analytics convention;
    // same no-window MIN+join shape, the anchor rides the survivor set
    Q("event_funnel_window",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ets"))
        graft.operators.Temporal.funnelWithin(ev, "user_id", "event_type", "ets",
          Seq("view", "click", "purchase"), within = 172800000000L)
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ets FROM events),
        s1 AS (SELECT user_id, min(ets) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(ets) AS t2 FROM e JOIN s1 USING (user_id)
          WHERE event_type = 'click' AND ets > t1
            AND ets <= t1 + 172800000000 GROUP BY 1),
        s3 AS (SELECT e.user_id, min(ets) AS t3
          FROM e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
          WHERE event_type = 'purchase' AND ets > t2
            AND ets <= t1 + 172800000000 GROUP BY 1)
        SELECT s1.user_id, t1 AS step_1_ts, t2 AS step_2_ts, t3 AS step_3_ts,
          CAST(1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
            + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS steps_completed
        FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""")),

    // INCREMENTAL retention: the distinct (key, bucket) activity relation
    // IS the exact sufficient statistic, so the fold needs NO ordering
    // contract — the gate splits by event_id PARITY (interleaved in time,
    // late data everywhere) and must still equal the one-shot triangle;
    // the state side never shuffles (broadcast probe, pinned)
    Q("event_retention_incremental",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ets"))
        val w = 86400000000L
        val T = graft.operators.Temporal
        val st = T.retentionState(
          ev.filter(col("event_id") % 2 === 0), "user_id", "ets", w)
        val folded = T.retentionFold(
          st, ev.filter(col("event_id") % 2 === 1), "user_id", "ets", w)
        T.retentionOf(folded)
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS b FROM events),
        a AS (SELECT DISTINCT user_id, b FROM e),
        c AS (SELECT user_id, min(b) AS c FROM a GROUP BY 1)
        SELECT CAST(c AS BIGINT) AS cohort, CAST(b - c AS BIGINT) AS day_offset,
          CAST(count(*) AS BIGINT) AS active_keys
        FROM a JOIN c USING (user_id) GROUP BY 1, 2""")),

    // INCREMENTAL transition matrix: counts are additive, so the state is
    // (matrix, per-key frontier) and a fold adds the batch's own leads
    // plus one BRIDGE step per key from its frontier event; time-split
    // batches (the strictly-later contract, refused loudly when violated)
    // must reproduce the one-shot matrix exactly
    Q("event_transitions_incremental",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("ts div 1000").as("ets"))
        val mm = ev.agg(min("ets").as("lo"), max("ets").as("hi")).head()
        val cut = (mm.getLong(0) + mm.getLong(1)) / 2
        val T = graft.operators.Temporal
        val (m0, f0) = T.transitionState(ev.filter(col("ets") <= cut),
          "user_id", "event_type", "ets", "event_id")
        val (m1, _) = T.transitionFold(m0, f0, ev.filter(col("ets") > cut),
          "user_id", "event_type", "ets", "event_id")
        m1
      },
      Some("""WITH o AS (SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts), event_id) AS next_type
        FROM events)
        SELECT event_type AS from_type, next_type AS to_type,
          CAST(count(*) AS BIGINT) AS n_steps
        FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2""")),

    // STREAMING funnel maintenance: two AvailableNow drops against one
    // checkpoint fold into a persisted funnelState VersionedTable
    // (overwriteIdempotent — a replayed batch is a no-op, never a
    // double-fold); the oracle is the ONE-SHOT funnel over all events,
    // so the gate certifies the batch-boundary folds AND the store
    // round-trip together
    Q("streaming_funnel_ingest",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ets"))
        val mm = ev.agg(min("ets").as("lo"), max("ets").as("hi")).head()
        val cut = (mm.getLong(0) + mm.getLong(1)) / 2
        val src = java.nio.file.Files.createTempDirectory("graft-sfi-src")
        val state = java.nio.file.Files.createTempDirectory("graft-sfi-state")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-sfi-ck")
        java.nio.file.Files.delete(state)
        val steps = Seq("view", "click", "purchase")
        ev.filter(col("ets") <= cut)
          .write.mode("append").parquet(src.toString)
        val schema = s.read.parquet(src.toString).schema
        graft.streaming.StreamingIngest.funnelIngest(s, src.toString, schema,
          "user_id", "event_type", "ets", steps, state.toString, ckpt.toString)
        ev.filter(col("ets") > cut)
          .write.mode("append").parquet(src.toString)
        graft.streaming.StreamingIngest.funnelIngest(s, src.toString, schema,
          "user_id", "event_type", "ets", steps, state.toString, ckpt.toString)
        val out = graft.operators.Temporal.funnelOf(
          new graft.store.VersionedTable(s, state.toString).read())
          .localCheckpoint(true)
        Seq(src, state, ckpt).foreach(p => deleteDir(p.toFile))
        out
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ets FROM events),
        s1 AS (SELECT user_id, min(ets) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(ets) AS t2 FROM e JOIN s1 USING (user_id)
          WHERE event_type = 'click' AND ets > t1 GROUP BY 1),
        s3 AS (SELECT e.user_id, min(ets) AS t3 FROM e JOIN s2 USING (user_id)
          WHERE event_type = 'purchase' AND ets > t2 GROUP BY 1)
        SELECT s1.user_id, t1 AS step_1_ts, t2 AS step_2_ts, t3 AS step_3_ts,
          CAST(1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
            + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS steps_completed
        FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""")),

    // STREAMING sessionization maintenance (the fourth maintainer): two
    // time-cut drops on one checkpoint — drop 2 sessionizes against the
    // persisted frontier only (history never re-sorted), cross-drop
    // sessions merge, indices stay consecutive; the appended assignments
    // table aggregated per session must equal the one-shot oracle
    Q("streaming_sessions_ingest",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ets"))
        val mm = ev.agg(min("ets").as("lo"), max("ets").as("hi")).head()
        val cut = (mm.getLong(0) + mm.getLong(1)) / 2
        val src = java.nio.file.Files.createTempDirectory("graft-ssi-src")
        val assign = java.nio.file.Files.createTempDirectory("graft-ssi-assign")
        val frontier = java.nio.file.Files.createTempDirectory("graft-ssi-frontier")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-ssi-ck")
        java.nio.file.Files.delete(assign)
        java.nio.file.Files.delete(frontier)
        ev.filter(col("ets") <= cut)
          .write.mode("append").parquet(src.toString)
        val schema = s.read.parquet(src.toString).schema
        graft.streaming.StreamingIngest.sessionsIngest(s, src.toString, schema,
          "user_id", "ets", 43200000000L, "event_id",
          assign.toString, frontier.toString, ckpt.toString)
        ev.filter(col("ets") > cut)
          .write.mode("append").parquet(src.toString)
        graft.streaming.StreamingIngest.sessionsIngest(s, src.toString, schema,
          "user_id", "ets", 43200000000L, "event_id",
          assign.toString, frontier.toString, ckpt.toString)
        val out = new graft.store.VersionedTable(s, assign.toString).read()
          .groupBy("user_id", "session_idx")
          .agg(count(lit(1)).as("n_events"),
            min("ets").as("start_us"), max("ets").as("end_us"))
          .localCheckpoint(true)
        Seq(src, assign, frontier, ckpt).foreach(p => deleteDir(p.toFile))
        out
      },
      Some("""WITH g AS (SELECT user_id, event_id, epoch_us(ts) AS ets,
          epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
        FROM events),
        s AS (SELECT user_id, ets,
          SUM(CASE WHEN gap IS NULL OR gap > 43200000000 THEN 1 ELSE 0 END) OVER
            (PARTITION BY user_id ORDER BY ets, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS session_idx
        FROM g)
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
          count(*) AS n_events, min(ets) AS start_us, max(ets) AS end_us
        FROM s GROUP BY 1, 2""")),

    // STREAMING quantile-sketch maintenance (the fifth maintainer): two
    // PARITY drops on one checkpoint — histogram folds are additive and
    // order-free, so late data across the drop boundary is exact — then
    // the served per-type value quantiles must equal the one-shot sketch
    Q("streaming_quantiles_ingest",
      (s, d) => {
        val ev = t(s, d, "events").select(col("event_id"), col("event_type"),
          expr("CAST(round(value*100) AS BIGINT)").as("value_cents"))
        val src = java.nio.file.Files.createTempDirectory("graft-sqi-src")
        val hist = java.nio.file.Files.createTempDirectory("graft-sqi-hist")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-sqi-ck")
        java.nio.file.Files.delete(hist)
        ev.filter(col("event_id") % 2 === 0).drop("event_id")
          .write.mode("append").parquet(src.toString)
        val schema = s.read.parquet(src.toString).schema
        graft.streaming.StreamingIngest.quantilesIngest(s, src.toString, schema,
          "event_type", "value_cents", 6, hist.toString, ckpt.toString)
        ev.filter(col("event_id") % 2 === 1).drop("event_id")
          .write.mode("append").parquet(src.toString)
        graft.streaming.StreamingIngest.quantilesIngest(s, src.toString, schema,
          "event_type", "value_cents", 6, hist.toString, ckpt.toString)
        val out = graft.operators.Sketches.quantileSketchOf(
          new graft.store.VersionedTable(s, hist.toString).read(),
          Seq(500, 950, 990)).localCheckpoint(true)
        Seq(src, hist, ckpt).foreach(p => deleteDir(p.toFile))
        out
      },
      Some("""WITH v AS (SELECT event_type AS g,
            CAST(round(value*100) AS BIGINT) AS val FROM events),
        b AS (SELECT g, greatest(length(bin(val)) - 1 - 6, 0) AS shift,
            val >> greatest(length(bin(val)) - 1 - 6, 0) AS bid, count(*) AS cnt
          FROM v GROUP BY 1, 2, 3),
        e AS (SELECT g, cnt, (bid << shift) AS lo,
            (((bid + 1) << shift) - 1) AS hi FROM b),
        c AS (SELECT g, hi, sum(cnt) OVER (PARTITION BY g ORDER BY lo) AS cum,
            sum(cnt) OVER (PARTITION BY g) AS tot FROM e)
        SELECT g AS event_type, CAST(q.q AS BIGINT) AS q_permille,
          CAST(min(CASE WHEN cum * 1000 >= q.q * tot THEN hi END) AS BIGINT) AS est
        FROM c, (VALUES (500), (950), (990)) AS q(q) GROUP BY 1, 2""")),

    // STREAMING HLL maintenance: distinct users per event type maintained
    // across two micro-batch polls — the only maintainer whose fold needs
    // no replay guard (register max is idempotent); the served estimate
    // must equal the one-shot HLL over everything, replayed bit-for-bit by
    // the oracle
    Q("streaming_hll_ingest",
      (s, d) => {
        val ev = t(s, d, "events").select(col("event_id"), col("event_type"),
          expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
            .as("h"))
        val src = java.nio.file.Files.createTempDirectory("graft-shll-src")
        val st = java.nio.file.Files.createTempDirectory("graft-shll-state")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-shll-ck")
        java.nio.file.Files.delete(st)
        ev.filter(col("event_id") % 2 === 0).drop("event_id")
          .write.mode("append").parquet(src.toString)
        val schema = s.read.parquet(src.toString).schema
        graft.streaming.StreamingIngest.hllIngest(s, src.toString, schema,
          "event_type", "h", 6, 60, st.toString, ckpt.toString)
        ev.filter(col("event_id") % 2 === 1).drop("event_id")
          .write.mode("append").parquet(src.toString)
        graft.streaming.StreamingIngest.hllIngest(s, src.toString, schema,
          "event_type", "h", 6, 60, st.toString, ckpt.toString)
        val out = graft.operators.Sketches.hllOf(
          new graft.store.VersionedTable(s, st.toString).read(), 6, 60)
          .localCheckpoint(true)
        Seq(src, st, ckpt).foreach(p => deleteDir(p.toFile))
        out
      },
      Some(s"""WITH e AS (SELECT event_type AS g,
            CAST(list_sum(list_transform(range(1, 16),
              i -> CAST(strpos('0123456789abcdef',
                  substr(md5(CAST(user_id AS VARCHAR)), i, 1)) - 1
                AS HUGEINT) << (4 * (15 - i)))) AS BIGINT) AS h
          FROM events),
        r AS (SELECT g, h >> 54 AS reg,
            CASE WHEN (h & ((1::BIGINT << 54) - 1)) = 0 THEN 55
              ELSE 55 - length(bin(h & ((1::BIGINT << 54) - 1))) END AS rho
          FROM e),
        mx AS (SELECT g, reg, max(rho) AS rho FROM r GROUP BY 1, 2),
        st AS (SELECT g, count(*) AS nz,
            sum(1::HUGEINT << (55 - rho)) AS si FROM mx GROUP BY 1),
        tt AS (SELECT g, CAST(64 - nz AS BIGINT) AS zero_regs,
            si + (64 - nz)::HUGEINT * (1::HUGEINT << 55) AS siall FROM st)
        SELECT g AS event_type, zero_regs, CAST(siall AS BIGINT) AS sum_inv,
          CAST((${graft.operators.Sketches.hllAlphaMicro(6)}::HUGEINT * 4096
              * (1::HUGEINT << 55)) // (siall * 1000000) AS BIGINT)
            AS est_distinct
        FROM tt""")),

    // trailing-window rate features (events + spend in the last 2 days,
    // per event): ONE keyed RANGE-frame window — frames are by value, so
    // same-timestamp events see each other symmetrically and no tie-break
    // is needed; spend rides as exact integer cents
    Q("event_rate_features",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ets"),
            cents(col("value")).as("cents"))
        graft.operators.Temporal.trailingFeatures(ev, "user_id", "ets",
          window = 172800000000L, valueCol = Some("cents"))
          .select("event_id", "user_id", "ets", "trail_count", "trail_sum")
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ets,
          CAST(round(value * 100) AS BIGINT) AS cents FROM events)
        SELECT event_id, user_id, ets,
          count(*) OVER w AS trail_count,
          CAST(sum(cents) OVER w AS BIGINT) AS trail_sum
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ets
          RANGE BETWEEN 172800000000 PRECEDING AND CURRENT ROW)""")),

    // normalized retention triangle: each cell as an integer-exact
    // permille of its cohort size (offset 0 = 1000‰ by construction) —
    // one broadcastable cohort self-join over the |buckets|² cells
    Q("event_retention_rates",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), expr("ts div 1000").as("ets"))
        graft.operators.Temporal.retentionRates(
          graft.operators.Temporal.retentionCohorts(ev, "user_id", "ets",
            bucketWidth = 86400000000L))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS b FROM events),
        a AS (SELECT DISTINCT user_id, b FROM e),
        c AS (SELECT user_id, min(b) AS c FROM a GROUP BY 1),
        cells AS (SELECT CAST(c AS BIGINT) AS cohort,
            CAST(b - c AS BIGINT) AS day_offset,
            CAST(count(*) AS BIGINT) AS active_keys
          FROM a JOIN c USING (user_id) GROUP BY 1, 2),
        sz AS (SELECT cohort, active_keys AS size FROM cells WHERE day_offset = 0)
        SELECT cells.cohort, day_offset, active_keys,
          CAST(active_keys * 1000 // size AS BIGINT) AS permille_of_cohort
        FROM cells JOIN sz ON cells.cohort = sz.cohort""")),

    // STREAMING transition-matrix maintenance: two time drops fold into a
    // persisted (matrix, frontier) state pair — within-batch leads plus
    // one bridge per key from the stored frontier; both tables rewrite
    // under one (appId, batchId) watermark so replays are no-ops on both.
    // Oracle = the one-shot matrix over all events
    Q("streaming_transitions_ingest",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("ts div 1000").as("ets"))
        val mm = ev.agg(min("ets").as("lo"), max("ets").as("hi")).head()
        val cut = (mm.getLong(0) + mm.getLong(1)) / 2
        val src = java.nio.file.Files.createTempDirectory("graft-sti-src")
        val mDir = java.nio.file.Files.createTempDirectory("graft-sti-m")
        val fDir = java.nio.file.Files.createTempDirectory("graft-sti-f")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-sti-ck")
        java.nio.file.Files.delete(mDir)
        java.nio.file.Files.delete(fDir)
        ev.filter(col("ets") <= cut).write.mode("append").parquet(src.toString)
        val schema = s.read.parquet(src.toString).schema
        graft.streaming.StreamingIngest.transitionsIngest(s, src.toString, schema,
          "user_id", "event_type", "ets", "event_id",
          mDir.toString, fDir.toString, ckpt.toString)
        ev.filter(col("ets") > cut).write.mode("append").parquet(src.toString)
        graft.streaming.StreamingIngest.transitionsIngest(s, src.toString, schema,
          "user_id", "event_type", "ets", "event_id",
          mDir.toString, fDir.toString, ckpt.toString)
        val out = new graft.store.VersionedTable(s, mDir.toString).read()
          .localCheckpoint(true)
        Seq(src, mDir, fDir, ckpt).foreach(p => deleteDir(p.toFile))
        out
      },
      Some("""WITH o AS (SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts), event_id) AS next_type
        FROM events)
        SELECT event_type AS from_type, next_type AS to_type,
          CAST(count(*) AS BIGINT) AS n_steps
        FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2""")),

    // row-normalized Markov transition probabilities (×1000, truncating):
    // the rates sibling of funnelRates/retentionRates — one broadcastable
    // self-aggregation over the |types|² matrix
    Q("event_transition_rates",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("ts div 1000").as("ets"))
        graft.operators.Temporal.transitionRates(
          graft.operators.Temporal.transitionMatrix(
            ev, "user_id", "event_type", "ets", "event_id"))
      },
      Some("""WITH o AS (SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts), event_id) AS next_type
        FROM events),
        m AS (SELECT event_type AS from_type, next_type AS to_type,
            CAST(count(*) AS BIGINT) AS n_steps
          FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
        tt AS (SELECT from_type, sum(n_steps) AS tot FROM m GROUP BY 1)
        SELECT m.from_type, to_type, n_steps,
          CAST(n_steps * 1000 // tot AS BIGINT) AS permille_of_from
        FROM m JOIN tt ON m.from_type = tt.from_type""")),

    // k-step Markov flows (k = 2): what the chain's square estimates,
    // counted exactly — same keyed-window shape, lead offset 2
    Q("event_transitions_2step",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("ts div 1000").as("ets"))
        graft.operators.Temporal.transitionMatrix(
          ev, "user_id", "event_type", "ets", "event_id", step = 2)
      },
      Some("""WITH o AS (SELECT user_id, event_type,
          lead(event_type, 2) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts), event_id) AS next_type
        FROM events)
        SELECT event_type AS from_type, next_type AS to_type,
          CAST(count(*) AS BIGINT) AS n_steps
        FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2""")),

    // cohort retention triangle (daily buckets): cohort = first-activity
    // day per user, cells count active users at each day offset — one
    // distinct (user, day) shuffle + min-per-user + keyed join back
    Q("event_retention",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), expr("ts div 1000").as("ets"))
        graft.operators.Temporal.retentionCohorts(ev, "user_id", "ets",
          bucketWidth = 86400000000L)
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS b FROM events),
        a AS (SELECT DISTINCT user_id, b FROM e),
        c AS (SELECT user_id, min(b) AS c FROM a GROUP BY 1)
        SELECT CAST(c AS BIGINT) AS cohort, CAST(b - c AS BIGINT) AS day_offset,
          CAST(count(*) AS BIGINT) AS active_keys
        FROM a JOIN c USING (user_id) GROUP BY 1, 2""")),

    // RETENTION BY EXPERIMENT ARM — operator algebra across families:
    // the hash-pure assignment splits the user population and each arm
    // gets its own retention triangle ("did the treatment retain
    // better"), unioned with the arm label; the oracle replays the
    // salted split AND both triangles
    Q("event_retention_by_arm",
      (s, d) => {
        val E = graft.operators.Experiment
        val ev = t(s, d, "events")
          .select(col("user_id"), expr("ts div 1000").as("ets"))
        val assigned = E.assign(
          ev.select(col("user_id")).distinct().withColumn("h",
            expr("CAST(conv(substr(md5(concat(CAST(user_id AS STRING), " +
              "':exp1')), 1, 15), 16, 10) AS BIGINT)")),
          "h", Seq(("control", 500), ("treatment", 500)))
          .select(col("user_id"), col("arm"))
        val withArm = ev.join(broadcast(assigned), Seq("user_id"))
        Seq("control", "treatment").map { a =>
          graft.operators.Temporal.retentionCohorts(
              withArm.filter(col("arm") === a).select(col("user_id"), col("ets")),
              "user_id", "ets", bucketWidth = 86400000000L)
            .withColumn("arm", lit(a))
        }.reduce(_ unionByName _)
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
        h AS (SELECT user_id, CAST(list_sum(list_transform(range(1, 16),
            i -> CAST(strpos('0123456789abcdef',
                substr(md5(CAST(user_id AS VARCHAR) || ':exp1'), i, 1)) - 1
              AS HUGEINT) << (4 * (15 - i)))) AS BIGINT) AS h FROM u),
        arm AS (SELECT user_id, CASE WHEN h % 1000 < 500 THEN 'control'
            ELSE 'treatment' END AS arm FROM h),
        e AS (SELECT e.user_id, arm.arm,
            epoch_us(ts) // 86400000000 AS b
          FROM events e JOIN arm ON arm.user_id = e.user_id),
        a AS (SELECT DISTINCT arm, user_id, b FROM e),
        c AS (SELECT arm, user_id, min(b) AS c FROM a GROUP BY 1, 2)
        SELECT CAST(c.c AS BIGINT) AS cohort, CAST(a.b - c.c AS BIGINT)
            AS day_offset, CAST(count(*) AS BIGINT) AS active_keys, a.arm
        FROM a JOIN c ON c.arm = a.arm AND c.user_id = a.user_id
        GROUP BY 1, 2, 4""")),

    // ROLLING ACTIVITY (DAU/WAU/MAU, daily buckets): distinct actives per
    // bucket at window widths 1/7/30 — one (user, day) distinct, bounded
    // coverage fan-out (Σ windows = 38 copies of the activity relation),
    // combinable count, NO window functions; coverage clamps at the last
    // observed day so no future buckets appear
    Q("event_active_users",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), expr("ts div 1000").as("ets"))
        graft.operators.Temporal.activeUsers(ev, "user_id", "ets",
          bucketWidth = 86400000000L, windows = Seq(1L, 7L, 30L))
      },
      Some("""WITH act AS (SELECT DISTINCT user_id,
            epoch_us(ts) // 86400000000 AS b FROM events),
        mx AS (SELECT max(b) AS m FROM act),
        cov AS (SELECT DISTINCT w.win, user_id, b + u.r AS bucket
          FROM act, (VALUES (1), (7), (30)) AS w(win),
            unnest(range(0, w.win)) AS u(r), mx
          WHERE b + u.r <= mx.m)
        SELECT CAST(bucket AS BIGINT) AS bucket, CAST(win AS BIGINT) AS win,
          count(*) AS active_keys
        FROM cov GROUP BY 1, 2""")),

    // INCREMENTAL rolling activity: the activity state IS the retention
    // state (one persisted (key, bucket) relation serves both views) —
    // build it on the first half of the range, fold the second half with
    // retentionFold (distinct-union: late data and replays exact), serve
    // with activeUsersOf; the oracle is the ONE-SHOT count over the union
    Q("event_active_users_incremental",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), expr("ts div 1000").as("ets"))
        val mm = ev.agg(min("ets").as("lo"), max("ets").as("hi")).head()
        val cut = (mm.getLong(0) + mm.getLong(1)) / 2
        val w = 86400000000L
        val st = graft.operators.Temporal.retentionState(
          ev.filter(col("ets") <= cut), "user_id", "ets", w)
        val folded = graft.operators.Temporal.retentionFold(
          st, ev.filter(col("ets") > cut), "user_id", "ets", w)
        graft.operators.Temporal.activeUsersOf(folded, Seq(1L, 7L, 30L))
      },
      Some("""WITH act AS (SELECT DISTINCT user_id,
            epoch_us(ts) // 86400000000 AS b FROM events),
        mx AS (SELECT max(b) AS m FROM act),
        cov AS (SELECT DISTINCT w.win, user_id, b + u.r AS bucket
          FROM act, (VALUES (1), (7), (30)) AS w(win),
            unnest(range(0, w.win)) AS u(r), mx
          WHERE b + u.r <= mx.m)
        SELECT CAST(bucket AS BIGINT) AS bucket, CAST(win AS BIGINT) AS win,
          count(*) AS active_keys
        FROM cov GROUP BY 1, 2""")),

    // STICKINESS (DAU/MAU): the two-width join over the rolling actives,
    // integer-exact permille of the monthly audience active that day
    Q("event_stickiness",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), expr("ts div 1000").as("ets"))
        graft.operators.Temporal.stickiness(
          graft.operators.Temporal.activeUsers(ev, "user_id", "ets",
            bucketWidth = 86400000000L, windows = Seq(1L, 30L)),
          shortWin = 1L, longWin = 30L)
      },
      Some("""WITH act AS (SELECT DISTINCT user_id,
            epoch_us(ts) // 86400000000 AS b FROM events),
        mx AS (SELECT max(b) AS m FROM act),
        cov AS (SELECT DISTINCT w.win, user_id, b + u.r AS bucket
          FROM act, (VALUES (1), (30)) AS w(win),
            unnest(range(0, w.win)) AS u(r), mx
          WHERE b + u.r <= mx.m),
        a AS (SELECT bucket, win, count(*) AS ac FROM cov GROUP BY 1, 2)
        SELECT CAST(s.bucket AS BIGINT) AS bucket,
          s.ac AS short_active, l.ac AS long_active,
          CAST((s.ac * 1000) // l.ac AS BIGINT) AS permille_of_long
        FROM a s JOIN a l ON s.bucket = l.bucket AND s.win = 1 AND l.win = 30""")),

    // SKETCHED rolling activity: the billion-key DAU/MAU shape — KMV is
    // duplicate-insensitive and map-side combinable, so raw events flow
    // through the bounded coverage fan-out straight into O(k) partial
    // sketch states with NO corpus-sized distinct; the oracle replays the
    // whole deterministic sketch (kept count, kth min, integer estimate)
    // bit-for-bit via the 60-bit md5-prefix hash twin
    Q("event_active_users_sketch",
      (s, d) => {
        val ev = t(s, d, "events").select(
          expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
            .as("h"),
          expr("ts div 1000").as("ets"))
        graft.operators.Temporal.activeUsersSketch(ev, "h", "ets",
          bucketWidth = 86400000000L, windows = Seq(1L, 7L, 30L),
          k = 64, hashBound = 1152921504606846976L)
      },
      Some("""WITH e AS (SELECT CAST(list_sum(list_transform(range(1, 16),
            i -> CAST(strpos('0123456789abcdef',
                substr(md5(CAST(user_id AS VARCHAR)), i, 1)) - 1
              AS HUGEINT) << (4 * (15 - i)))) AS HUGEINT) AS h,
          epoch_us(ts) // 86400000000 AS b FROM events),
        mx AS (SELECT max(b) AS m FROM e),
        cov AS (SELECT DISTINCT w.win, h, b + u.r AS bucket
          FROM e, (VALUES (1), (7), (30)) AS w(win),
            unnest(range(0, w.win)) AS u(r), mx
          WHERE b + u.r <= mx.m),
        r AS (SELECT bucket, win, h,
            row_number() OVER (PARTITION BY bucket, win ORDER BY h) AS rn FROM cov),
        kk AS (SELECT bucket, win,
            CAST(count(*) FILTER (rn <= 64) AS BIGINT) AS n_kept,
            CAST(max(h) FILTER (rn <= 64) AS BIGINT) AS kth_min
          FROM r GROUP BY 1, 2)
        SELECT CAST(bucket AS BIGINT) AS bucket, CAST(win AS BIGINT) AS win,
          n_kept, kth_min,
          CAST(CASE WHEN n_kept < 64 THEN n_kept
            ELSE (63::HUGEINT * 1152921504606846976::HUGEINT)
              // (kth_min::HUGEINT + 1) END AS BIGINT) AS est_active
        FROM kk""")),

    // HLL-sketched rolling activity: the same bounded coverage fan-out as
    // the KMV form but with FIXED-SIZE (2^p-byte) idempotent-max register
    // state per (bucket, win) cell — the variant for huge cells and
    // replay-tolerant maintainers; the oracle replays registers, the
    // inverse-power sum, and the alpha-micro estimate bit-for-bit
    Q("event_active_users_hll",
      (s, d) => {
        val ev = t(s, d, "events").select(
          expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
            .as("h"),
          expr("ts div 1000").as("ets"))
        graft.operators.Temporal.activeUsersHll(ev, "h", "ets",
          bucketWidth = 86400000000L, windows = Seq(1L, 7L, 30L),
          p = 6, hashBits = 60)
      },
      Some(s"""WITH e AS (SELECT CAST(list_sum(list_transform(range(1, 16),
            i -> CAST(strpos('0123456789abcdef',
                substr(md5(CAST(user_id AS VARCHAR)), i, 1)) - 1
              AS HUGEINT) << (4 * (15 - i)))) AS BIGINT) AS h,
          epoch_us(ts) // 86400000000 AS b FROM events),
        mx AS (SELECT max(b) AS m FROM e),
        cov AS (SELECT DISTINCT w.win, h, b + u.r AS bucket
          FROM e, (VALUES (1), (7), (30)) AS w(win),
            unnest(range(0, w.win)) AS u(r), mx
          WHERE b + u.r <= mx.m),
        r AS (SELECT bucket, win, h >> 54 AS reg,
            CASE WHEN (h & ((1::BIGINT << 54) - 1)) = 0 THEN 55
              ELSE 55 - length(bin(h & ((1::BIGINT << 54) - 1))) END AS rho
          FROM cov),
        mreg AS (SELECT bucket, win, reg, max(rho) AS rho
          FROM r GROUP BY 1, 2, 3),
        st AS (SELECT bucket, win, count(*) AS nz,
            sum(1::HUGEINT << (55 - rho)) AS si FROM mreg GROUP BY 1, 2),
        tt AS (SELECT bucket, win, CAST(64 - nz AS BIGINT) AS zero_regs,
            si + (64 - nz)::HUGEINT * (1::HUGEINT << 55) AS siall FROM st)
        SELECT CAST(bucket AS BIGINT) AS bucket, CAST(win AS BIGINT) AS win,
          zero_regs, CAST(siall AS BIGINT) AS sum_inv,
          CAST((${graft.operators.Sketches.hllAlphaMicro(6)}::HUGEINT * 4096
              * (1::HUGEINT << 55)) // (siall * 1000000) AS BIGINT)
            AS est_active
        FROM tt""")),

    // TWO-WINDOW CHANGE RATIO: per event type and day, next-week spend as
    // an integer permille of trailing-week spend — the level-shift census;
    // one combinable pre-aggregate, RANGE-frame windows on the tiny
    // bucketed series (gaps handled by value frames, not row counting)
    Q("timeseries_change_ratio",
      (s, d) => {
        val ev = t(s, d, "events").select(col("event_type"),
          expr("ts div 1000").as("ets"), cents(col("value")).as("value_cents"))
        graft.operators.Temporal.changeRatio(ev, "event_type", "ets",
          "value_cents", bucketWidth = 86400000000L, window = 7L)
      },
      Some("""WITH e AS (SELECT event_type AS k,
            epoch_us(ts) // 86400000000 AS b,
            CAST(round(value*100) AS BIGINT) AS v FROM events),
        s AS (SELECT k, b, sum(v) AS bs FROM e GROUP BY 1, 2),
        w AS (SELECT k, b, bs,
            sum(bs) OVER (PARTITION BY k ORDER BY b
              RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS ts_,
            sum(bs) OVER (PARTITION BY k ORDER BY b
              RANGE BETWEEN CURRENT ROW AND 6 FOLLOWING) AS ls FROM s)
        SELECT k AS event_type, CAST(b AS BIGINT) AS bucket,
          CAST(bs AS BIGINT) AS bucket_sum,
          CAST(ts_ AS BIGINT) AS trail_sum, CAST(ls AS BIGINT) AS lead_sum,
          CAST(CASE WHEN ts_ > 0 THEN (ls * 1000) // ts_ END AS BIGINT)
            AS ratio_permille
        FROM w""")),

    // AUDIENCE OVERLAP: per event-type pair, distinct-user union /
    // intersection / Jaccard estimated from each type's KMV kept set alone
    // (theta-sketch set algebra on the deterministic KMV — exact below
    // capacity); the oracle replays kept sets, union minima, shared count,
    // and every estimate bit-for-bit
    Q("event_audience_overlap",
      (s, d) => {
        val ev = t(s, d, "events").select(col("event_type"),
          expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
            .as("h"))
        graft.operators.Sketches.distinctOverlap(ev, "event_type", "h",
          k = 128, hashBound = 1152921504606846976L)
      },
      Some("""WITH e AS (SELECT event_type AS g,
            CAST(list_sum(list_transform(range(1, 16),
              i -> CAST(strpos('0123456789abcdef',
                  substr(md5(CAST(user_id AS VARCHAR)), i, 1)) - 1
                AS HUGEINT) << (4 * (15 - i)))) AS BIGINT) AS h
          FROM events),
        dd AS (SELECT DISTINCT g, h FROM e),
        r AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
          FROM dd),
        ks AS (SELECT g, list(h ORDER BY h) AS mins FROM r WHERE rn <= 128
          GROUP BY g),
        p AS (SELECT a.g AS ga, b.g AS gb, a.mins AS ma, b.mins AS mb
          FROM ks a JOIN ks b ON a.g < b.g),
        m AS (SELECT ga, gb, ma, mb,
            list_sort(list_distinct(list_concat(ma, mb)))[1:128] AS mu FROM p),
        st AS (SELECT ga, gb, mu, len(mu) AS nu,
            len(list_filter(mu, x -> list_contains(ma, x)
              AND list_contains(mb, x))) AS sh FROM m),
        f AS (SELECT ga, gb, nu, sh,
            CASE WHEN nu < 128 THEN nu
              ELSE CAST((127::HUGEINT * 1152921504606846976)
                // (mu[-1]::HUGEINT + 1) AS BIGINT) END AS eu FROM st)
        SELECT ga AS group_a, gb AS group_b, CAST(nu AS BIGINT) AS n_union_kept,
          CAST(sh AS BIGINT) AS shared, CAST(eu AS BIGINT) AS est_union,
          CAST(CASE WHEN nu < 128 THEN sh
            ELSE (sh::HUGEINT * eu) // 128 END AS BIGINT) AS est_intersection,
          CAST(CASE WHEN nu > 0 THEN (sh * 1000) // nu ELSE 0 END AS BIGINT)
            AS jaccard_permille
        FROM f""")),

    // LINEAR MULTI-TOUCH ATTRIBUTION: each purchase's credit split in
    // integer permille across the user's views in the trailing 2 days,
    // the last touch absorbing the truncation remainder (weights sum to
    // exactly 1000 per conversion) — the rangeJoin machinery keyed by
    // user, weight windows on the output-bound pair set
    Q("event_attribution_linear",
      (s, d) => {
        val ev = t(s, d, "events").select(col("user_id"), col("event_type"),
          expr("ts div 1000").as("ets"), col("event_id"))
        graft.operators.Temporal.attributionLinear(ev, "user_id",
          "event_type", "ets", "event_id",
          convType = "purchase", touchType = "view",
          lookback = 172800000000L, bucketWidth = 86400000000L)
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ets,
            event_id FROM events),
        c AS (SELECT user_id AS k, event_id AS cid, ets AS cts FROM e
          WHERE event_type = 'purchase'),
        tt AS (SELECT user_id AS k, event_id AS tid, ets AS tts FROM e
          WHERE event_type = 'view'),
        p AS (SELECT c.k, cid, tid, tts FROM c JOIN tt ON c.k = tt.k
          AND tt.tts BETWEEN c.cts - 172800000000 AND c.cts),
        n AS (SELECT *, count(*) OVER (PARTITION BY cid) AS n,
            row_number() OVER (PARTITION BY cid
              ORDER BY tts DESC, tid DESC) AS rn FROM p)
        SELECT k AS user_id, CAST(cid AS BIGINT) AS conv_id,
          CAST(tid AS BIGINT) AS touch_id, CAST(tts AS BIGINT) AS touch_ts,
          CAST(CASE WHEN rn = 1 THEN 1000 - (n - 1) * (1000 // n)
            ELSE 1000 // n END AS BIGINT) AS weight_permille
        FROM n""")),

    // HLL CUBE: distinct users per (type), (day), (type, day), and total
    // from ONE corpus pass — register states merge across grouping sets,
    // the mergeable-sketch property powering OLAP rollups; the oracle
    // replays every set's registers and estimates
    Q("agg_hll_cube",
      (s, d) => {
        val ev = t(s, d, "events").select(col("event_type"),
          expr("(ts div 1000) div 86400000000").as("b"),
          expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
            .as("h"))
        ev.cube(col("event_type"), col("b"))
          .agg(graft.functions.NativeAgg.hllRegisters(col("h"), 6, 60)
            .as("__regs"))
          .select((coalesce(col("event_type"), lit("ALL")).as("etype") +:
            coalesce(col("b"), lit(-1L)).as("bucket") +:
            graft.operators.Sketches.hllStatsCols(6, 60, "__regs")): _*)
          .withColumn("est_distinct",
            graft.operators.Sketches.hllEstimateFromSumInv(6, 60))
      },
      Some(s"""WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS b,
            CAST(list_sum(list_transform(range(1, 16),
              i -> CAST(strpos('0123456789abcdef',
                  substr(md5(CAST(user_id AS VARCHAR)), i, 1)) - 1
                AS HUGEINT) << (4 * (15 - i)))) AS BIGINT) AS h
          FROM events),
        rr AS (SELECT event_type, b, h >> 54 AS reg,
            CASE WHEN (h & ((1::BIGINT << 54) - 1)) = 0 THEN 55
              ELSE 55 - length(bin(h & ((1::BIGINT << 54) - 1))) END AS rho
          FROM e),
        mx AS (SELECT coalesce(event_type, 'ALL') AS etype,
            coalesce(b, -1) AS bucket, reg, max(rho) AS rho
          FROM rr GROUP BY CUBE(event_type, b), reg),
        st AS (SELECT etype, bucket, count(*) AS nz,
            sum(1::HUGEINT << (55 - rho)) AS si FROM mx GROUP BY 1, 2),
        tt AS (SELECT etype, bucket, CAST(64 - nz AS BIGINT) AS zero_regs,
            si + (64 - nz)::HUGEINT * (1::HUGEINT << 55) AS siall FROM st)
        SELECT etype, CAST(bucket AS BIGINT) AS bucket, zero_regs,
          CAST(siall AS BIGINT) AS sum_inv,
          CAST((${graft.operators.Sketches.hllAlphaMicro(6)}::HUGEINT * 4096
              * (1::HUGEINT << 55)) // (siall * 1000000) AS BIGINT)
            AS est_distinct
        FROM tt""")),

    // INCREMENTAL audience overlap: the SAME persisted KMV kept-set state
    // (parity split, idempotent trim-folds through parquet) serves the
    // pairwise overlap algebra — one state, two views (distinct census +
    // overlap); must equal the one-shot corpus pairing
    Q("event_audience_overlap_incremental",
      (s, d) => {
        val S = graft.operators.Sketches
        val ev = t(s, d, "events").select(col("event_id"), col("event_type"),
          expr("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
            .as("h"))
        val dir = java.nio.file.Files.createTempDirectory("graft-ov-state")
        S.kmvState(ev.filter(col("event_id") % 2 === 0), "event_type", "h", 128)
          .write.mode("overwrite").parquet(dir.toString)
        val state = s.read.parquet(dir.toString)
        val folded = S.kmvFold(state,
          S.kmvState(ev.filter(col("event_id") % 2 === 1), "event_type", "h", 128),
          128)
        val out = S.kmvOverlapOf(folded, k = 128,
          hashBound = 1152921504606846976L).localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some("""WITH e AS (SELECT event_type AS g,
            CAST(list_sum(list_transform(range(1, 16),
              i -> CAST(strpos('0123456789abcdef',
                  substr(md5(CAST(user_id AS VARCHAR)), i, 1)) - 1
                AS HUGEINT) << (4 * (15 - i)))) AS BIGINT) AS h
          FROM events),
        dd AS (SELECT DISTINCT g, h FROM e),
        r AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
          FROM dd),
        ks AS (SELECT g, list(h ORDER BY h) AS mins FROM r WHERE rn <= 128
          GROUP BY g),
        p AS (SELECT a.g AS ga, b.g AS gb, a.mins AS ma, b.mins AS mb
          FROM ks a JOIN ks b ON a.g < b.g),
        m AS (SELECT ga, gb, ma, mb,
            list_sort(list_distinct(list_concat(ma, mb)))[1:128] AS mu FROM p),
        st AS (SELECT ga, gb, mu, len(mu) AS nu,
            len(list_filter(mu, x -> list_contains(ma, x)
              AND list_contains(mb, x))) AS sh FROM m),
        f AS (SELECT ga, gb, nu, sh,
            CASE WHEN nu < 128 THEN nu
              ELSE CAST((127::HUGEINT * 1152921504606846976)
                // (mu[-1]::HUGEINT + 1) AS BIGINT) END AS eu FROM st)
        SELECT ga AS group_a, gb AS group_b, CAST(nu AS BIGINT) AS n_union_kept,
          CAST(sh AS BIGINT) AS shared, CAST(eu AS BIGINT) AS est_union,
          CAST(CASE WHEN nu < 128 THEN sh
            ELSE (sh::HUGEINT * eu) // 128 END AS BIGINT) AS est_intersection,
          CAST(CASE WHEN nu > 0 THEN (sh * 1000) // nu ELSE 0 END AS BIGINT)
            AS jaccard_permille
        FROM f""")),

    // COHORT LTV triangle: per acquisition cohort and age, the value
    // contributed plus running totals and the integer-exact per-member
    // cumulative ("revenue per user acquired on day C, by day C+N") —
    // combinable aggregates + one window over the tiny triangle, sizes
    // joined back broadcast
    Q("event_cohort_ltv",
      (s, d) => {
        val ev = t(s, d, "events").select(col("user_id"),
          expr("ts div 1000").as("ets"), cents(col("value")).as("value_cents"))
        graft.operators.Temporal.cohortValue(ev, "user_id", "ets",
          "value_cents", bucketWidth = 86400000000L)
      },
      Some("""WITH e AS (SELECT user_id AS k, epoch_us(ts) // 86400000000 AS b,
            CAST(round(value*100) AS BIGINT) AS v FROM events),
        c AS (SELECT k, min(b) AS c FROM e GROUP BY 1),
        sz AS (SELECT c, count(*) AS size FROM c GROUP BY 1),
        cells AS (SELECT c.c AS cohort, e.b - c.c AS day_offset,
            count(*) AS n_events, sum(e.v) AS value_sum
          FROM e JOIN c USING (k) GROUP BY 1, 2),
        cum AS (SELECT cohort, day_offset, n_events, value_sum,
            sum(value_sum) OVER (PARTITION BY cohort ORDER BY day_offset) AS cv
          FROM cells)
        SELECT CAST(cum.cohort AS BIGINT) AS cohort,
          CAST(day_offset AS BIGINT) AS day_offset,
          CAST(n_events AS BIGINT) AS n_events,
          CAST(value_sum AS BIGINT) AS value_sum,
          CAST(cv AS BIGINT) AS cum_value,
          CAST(cv // size AS BIGINT) AS cum_value_per_key
        FROM cum JOIN sz ON cum.cohort = sz.c""")),

    // TIME-SERIES GAP-FILL (LOCF): per user, the daily spend series
    // regularized to a dense per-day grid, missing days carried forward —
    // the feature-pipeline resample step; one combinable per-(key, bucket)
    // aggregate + ONE keyed window + a bounded gap explode (no grid join),
    // gaps past the budget refuse loudly
    Q("timeseries_gapfill",
      (s, d) => {
        val ev = t(s, d, "events").select(col("user_id"),
          expr("ts div 1000").as("ets"), col("event_id"),
          cents(col("value")).as("value_cents"))
        graft.operators.Temporal.gapFill(ev, "user_id", "ets", "value_cents",
          tieBreak = "event_id", bucketWidth = 86400000000L, mode = "locf")
      },
      Some("""WITH e AS (SELECT user_id AS k,
            epoch_us(ts) // 86400000000 AS b, epoch_us(ts) AS ets, event_id,
            CAST(round(value*100) AS BIGINT) AS v FROM events),
        o AS (SELECT k, b, v FROM (SELECT k, b, v, row_number() OVER (
            PARTITION BY k, b ORDER BY ets DESC, event_id DESC, v DESC) AS rn
          FROM e) WHERE rn = 1),
        n AS (SELECT k, b, v,
            lead(b) OVER (PARTITION BY k ORDER BY b) AS nb FROM o)
        SELECT k AS user_id, CAST(b + u.r AS BIGINT) AS bucket,
          CAST(v AS BIGINT) AS value_cents, (u.r = 0) AS is_observed
        FROM n, unnest(range(0, coalesce(nb - b, 1))) AS u(r)""")),

    // INCREMENTAL gap-fill: the per-key frontier (last observation) is the
    // whole persisted state — the early half's fill rows union the
    // continuation served from the round-tripped frontier, and together
    // they must equal the one-shot dense grid (LOCF carried across the
    // state/batch boundary by the same kernel); late data refuses loudly
    Q("timeseries_gapfill_incremental",
      (s, d) => {
        val T = graft.operators.Temporal
        val ev = t(s, d, "events").select(col("user_id"),
          expr("ts div 1000").as("ets"), col("event_id"),
          cents(col("value")).as("value_cents"))
        val r = ev.agg(min("ets"), max("ets")).head()
        // a BUCKET-boundary cutoff: the continuation contract serves the
        // frontier bucket as final, so the split must not straddle a day
        val cutoff = (r.getLong(0) + r.getLong(1)) / 2 / 86400000000L * 86400000000L
        val early = ev.filter(col("ets") < cutoff)
        val late = ev.filter(col("ets") >= cutoff)
        val dir = java.nio.file.Files.createTempDirectory("graft-gf-state")
        T.gapFillFrontier(early, "user_id", "ets", "value_cents",
            "event_id", 86400000000L)
          .write.mode("overwrite").parquet(dir.toString)
        val frontier = s.read.parquet(dir.toString)
        val statePeriod = T.gapFill(early, "user_id", "ets", "value_cents",
          "event_id", 86400000000L, mode = "locf")
        val continued = T.gapFillContinue(frontier, late, "user_id", "ets",
          "value_cents", "event_id", 86400000000L, mode = "locf")
        val out = statePeriod.unionByName(continued).localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some("""WITH e AS (SELECT user_id AS k,
            epoch_us(ts) // 86400000000 AS b, epoch_us(ts) AS ets, event_id,
            CAST(round(value*100) AS BIGINT) AS v FROM events),
        o AS (SELECT k, b, v FROM (SELECT k, b, v, row_number() OVER (
            PARTITION BY k, b ORDER BY ets DESC, event_id DESC, v DESC) AS rn
          FROM e) WHERE rn = 1),
        n AS (SELECT k, b, v,
            lead(b) OVER (PARTITION BY k ORDER BY b) AS nb FROM o)
        SELECT k AS user_id, CAST(b + u.r AS BIGINT) AS bucket,
          CAST(v AS BIGINT) AS value_cents, (u.r = 0) AS is_observed
        FROM n, unnest(range(0, coalesce(nb - b, 1))) AS u(r)""")),

    // STREAMING gap-fill maintenance: two day-boundary drops on one
    // checkpoint — the fill table accumulates each batch period's dense
    // rows (continued from the persisted frontier, which commits last)
    // and must read back as exactly the one-shot grid
    Q("streaming_gapfill_ingest",
      (s, d) => {
        val ev = t(s, d, "events").select(col("user_id"),
          expr("ts div 1000").as("ets"), col("event_id"),
          cents(col("value")).as("value_cents"))
        val r = ev.agg(min("ets"), max("ets")).head()
        val cutoff = (r.getLong(0) + r.getLong(1)) / 2 / 86400000000L * 86400000000L
        val src = java.nio.file.Files.createTempDirectory("graft-sgf-src")
        val fr = java.nio.file.Files.createTempDirectory("graft-sgf-frontier")
        val fl = java.nio.file.Files.createTempDirectory("graft-sgf-fills")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-sgf-ck")
        java.nio.file.Files.delete(fr); java.nio.file.Files.delete(fl)
        ev.filter(col("ets") < cutoff)
          .write.mode("append").parquet(src.toString)
        val schema = s.read.parquet(src.toString).schema
        graft.streaming.StreamingIngest.gapFillIngest(s, src.toString, schema,
          "user_id", "ets", "value_cents", "event_id", 86400000000L, "locf",
          fr.toString, fl.toString, ckpt.toString)
        ev.filter(col("ets") >= cutoff)
          .write.mode("append").parquet(src.toString)
        graft.streaming.StreamingIngest.gapFillIngest(s, src.toString, schema,
          "user_id", "ets", "value_cents", "event_id", 86400000000L, "locf",
          fr.toString, fl.toString, ckpt.toString)
        val out = new graft.store.VersionedTable(s, fl.toString).read()
          .select("user_id", "bucket", "value_cents", "is_observed")
          .localCheckpoint(true)
        Seq(src, fr, fl, ckpt).foreach(p => deleteDir(p.toFile))
        out
      },
      Some("""WITH e AS (SELECT user_id AS k,
            epoch_us(ts) // 86400000000 AS b, epoch_us(ts) AS ets, event_id,
            CAST(round(value*100) AS BIGINT) AS v FROM events),
        o AS (SELECT k, b, v FROM (SELECT k, b, v, row_number() OVER (
            PARTITION BY k, b ORDER BY ets DESC, event_id DESC, v DESC) AS rn
          FROM e) WHERE rn = 1),
        n AS (SELECT k, b, v,
            lead(b) OVER (PARTITION BY k ORDER BY b) AS nb FROM o)
        SELECT k AS user_id, CAST(b + u.r AS BIGINT) AS bucket,
          CAST(v AS BIGINT) AS value_cents, (u.r = 0) AS is_observed
        FROM n, unnest(range(0, coalesce(nb - b, 1))) AS u(r)""")),

    // LINEAR gap-fill: same grid, missing days interpolated toward the
    // next observation with the sign factored out of the truncating
    // division — `v + sign(nv−v)·(|nv−v|·r) DIV (nb−b)` — so Spark's
    // toward-zero DIV and DuckDB's flooring // agree on every gap
    Q("timeseries_interpolate",
      (s, d) => {
        val ev = t(s, d, "events").select(col("user_id"),
          expr("ts div 1000").as("ets"), col("event_id"),
          cents(col("value")).as("value_cents"))
        graft.operators.Temporal.gapFill(ev, "user_id", "ets", "value_cents",
          tieBreak = "event_id", bucketWidth = 86400000000L, mode = "linear")
      },
      Some("""WITH e AS (SELECT user_id AS k,
            epoch_us(ts) // 86400000000 AS b, epoch_us(ts) AS ets, event_id,
            CAST(round(value*100) AS BIGINT) AS v FROM events),
        o AS (SELECT k, b, v FROM (SELECT k, b, v, row_number() OVER (
            PARTITION BY k, b ORDER BY ets DESC, event_id DESC, v DESC) AS rn
          FROM e) WHERE rn = 1),
        n AS (SELECT k, b, v,
            lead(b) OVER (PARTITION BY k ORDER BY b) AS nb,
            lead(v) OVER (PARTITION BY k ORDER BY b) AS nv FROM o)
        SELECT k AS user_id, CAST(b + u.r AS BIGINT) AS bucket,
          CAST(CASE WHEN u.r = 0 OR nv IS NULL THEN v
            ELSE v + (CASE WHEN nv >= v THEN 1 ELSE -1 END)
              * ((abs(nv - v) * u.r) // (nb - b)) END AS BIGINT) AS value_cents,
          (u.r = 0) AS is_observed
        FROM n, unnest(range(0, coalesce(nb - b, 1))) AS u(r)""")),

    Q("asof_join",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ets"))
        val ords = t(s, d, "orders").select(
          col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("ots"),
          col("o_orderkey"))
        graft.operators.Temporal.asofJoinSelect(ev, ords,
            "user_id", "o_custkey", "ets", "ots", Seq("o_orderkey"), "o_orderkey")
          .select(col("event_id"), col("asof_o_orderkey").as("asof_orderkey"))
      },
      Some("""WITH lo AS (SELECT o_custkey, o_orderkey FROM orders
          QUALIFY row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) = 1)
        SELECT e.event_id, lo.o_orderkey AS asof_orderkey
        FROM events e LEFT JOIN lo ON e.user_id = lo.o_custkey""")),

    // FORWARD as-of (next purchase at/after each view): the asofJoin
    // complement — same one-shuffle union-sort, descending per-key order;
    // ties at the earliest qualifying ts break to the LOWEST id (mirrored
    // in the oracle's ORDER BY ... LIMIT 1)
    Q("asof_join_forward",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("ts div 1000").as("ets"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ets"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_event_id"),
            col("user_id").as("p_user"), col("ets").as("pts"))
        graft.operators.Temporal.asofJoinForwardSelect(views, purch,
            "user_id", "p_user", "ets", "pts", Seq("p_event_id"), "p_event_id")
          .select(col("event_id"), col("asof_p_event_id").as("next_purchase_id"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
          epoch_us(ts) AS ets FROM events),
        v AS (SELECT * FROM e WHERE event_type = 'view'),
        p AS (SELECT * FROM e WHERE event_type = 'purchase')
        SELECT v.event_id, x.pid AS next_purchase_id
        FROM v LEFT JOIN LATERAL (SELECT p.event_id AS pid FROM p
          WHERE p.user_id = v.user_id AND p.ets >= v.ets
          ORDER BY p.ets, p.event_id LIMIT 1) x ON true""")),

    // NEAREST as-of (the purchase closest in time to each view, either
    // direction, within a 2-day tolerance — the tolerance binds: 395 of
    // 1982 views at sf0.01 have no purchase that close): completes the
    // pandas merge_asof direction family; tie at equal distance breaks
    // BACKWARD, within a side the side's own tie rule applies — the
    // oracle's three-level LATERAL sort replays exactly that order
    Q("asof_join_nearest",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("ts div 1000").as("ets"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ets"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_event_id"),
            col("user_id").as("p_user"), col("ets").as("pts"))
        graft.operators.Temporal.asofJoinNearestSelect(views, purch,
            "user_id", "p_user", "ets", "pts", Seq("p_event_id"), "p_event_id",
            tolerance = Some(172800000000L))
          .select(col("event_id"), col("asof_p_event_id").as("nearest_purchase_id"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
          epoch_us(ts) AS ets FROM events),
        v AS (SELECT * FROM e WHERE event_type = 'view'),
        p AS (SELECT * FROM e WHERE event_type = 'purchase')
        SELECT v.event_id, x.pid AS nearest_purchase_id
        FROM v LEFT JOIN LATERAL (SELECT p.event_id AS pid FROM p
          WHERE p.user_id = v.user_id AND abs(p.ets - v.ets) <= 172800000000
          ORDER BY abs(p.ets - v.ets),
            CASE WHEN p.ets <= v.ets THEN 0 ELSE 1 END,
            CASE WHEN p.ets <= v.ets THEN -p.event_id ELSE p.event_id END
          LIMIT 1) x ON true""")),

    // STREAMING retention maintenance: PARITY drops (late data across the
    // batch boundary — retention folds need no ordering contract), each
    // micro-batch APPENDS only its fresh (key, bucket) rows to the state
    // table; the served triangle must equal the one-shot oracle
    Q("streaming_retention_ingest",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ets"))
        val src = java.nio.file.Files.createTempDirectory("graft-sri-src")
        val state = java.nio.file.Files.createTempDirectory("graft-sri-state")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-sri-ck")
        java.nio.file.Files.delete(state)
        val w = 86400000000L
        ev.filter(col("event_id") % 2 === 0).select("user_id", "ets")
          .write.mode("append").parquet(src.toString)
        val schema = s.read.parquet(src.toString).schema
        graft.streaming.StreamingIngest.retentionIngest(s, src.toString, schema,
          "user_id", "ets", w, state.toString, ckpt.toString)
        ev.filter(col("event_id") % 2 === 1).select("user_id", "ets")
          .write.mode("append").parquet(src.toString)
        graft.streaming.StreamingIngest.retentionIngest(s, src.toString, schema,
          "user_id", "ets", w, state.toString, ckpt.toString)
        val out = graft.operators.Temporal.retentionOf(
          new graft.store.VersionedTable(s, state.toString).read())
          .localCheckpoint(true)
        Seq(src, state, ckpt).foreach(p => deleteDir(p.toFile))
        out
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS b FROM events),
        a AS (SELECT DISTINCT user_id, b FROM e),
        c AS (SELECT user_id, min(b) AS c FROM a GROUP BY 1)
        SELECT CAST(c AS BIGINT) AS cohort, CAST(b - c AS BIGINT) AS day_offset,
          CAST(count(*) AS BIGINT) AS active_keys
        FROM a JOIN c USING (user_id) GROUP BY 1, 2""")),

    // STREAMING rolling-activity maintenance: the SAME persisted activity
    // state the retention ingest maintains serves the DAU/WAU/MAU view —
    // one append-only (key, bucket) state, two serving views; two parity
    // drops on one checkpoint (late data everywhere), then activeUsersOf
    // reads the store; oracle = the one-shot coverage count over all events
    Q("streaming_active_users_ingest",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ets"))
        val src = java.nio.file.Files.createTempDirectory("graft-sau-src")
        val state = java.nio.file.Files.createTempDirectory("graft-sau-state")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-sau-ck")
        java.nio.file.Files.delete(state)
        val w = 86400000000L
        ev.filter(col("event_id") % 2 === 0).select("user_id", "ets")
          .write.mode("append").parquet(src.toString)
        val schema = s.read.parquet(src.toString).schema
        graft.streaming.StreamingIngest.retentionIngest(s, src.toString, schema,
          "user_id", "ets", w, state.toString, ckpt.toString)
        ev.filter(col("event_id") % 2 === 1).select("user_id", "ets")
          .write.mode("append").parquet(src.toString)
        graft.streaming.StreamingIngest.retentionIngest(s, src.toString, schema,
          "user_id", "ets", w, state.toString, ckpt.toString)
        val out = graft.operators.Temporal.activeUsersOf(
          new graft.store.VersionedTable(s, state.toString).read()
            .select(col("user_id"), col("bucket")), Seq(1L, 7L, 30L))
          .localCheckpoint(true)
        Seq(src, state, ckpt).foreach(p => deleteDir(p.toFile))
        out
      },
      Some("""WITH act AS (SELECT DISTINCT user_id,
            epoch_us(ts) // 86400000000 AS b FROM events),
        mx AS (SELECT max(b) AS m FROM act),
        cov AS (SELECT DISTINCT w.win, user_id, b + u.r AS bucket
          FROM act, (VALUES (1), (7), (30)) AS w(win),
            unnest(range(0, w.win)) AS u(r), mx
          WHERE b + u.r <= mx.m)
        SELECT CAST(bucket AS BIGINT) AS bucket, CAST(win AS BIGINT) AS win,
          count(*) AS active_keys
        FROM cov GROUP BY 1, 2""")),

    // batch INTERVAL-OVERLAP join (concurrent sessions across user
    // parity): both sides bucketized, each overlapping pair meets in
    // exactly ONE bucket (max-start rule) — no cartesian, no dedup pass;
    // oracle = the sessionize islands + a brute-force overlap predicate
    Q("interval_overlap_join",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ets"))
        val sess = graft.operators.Temporal.sessionize(ev, "user_id", "ets",
            maxGap = 43200000000L, tieBreak = "event_id")
          .groupBy("user_id", "session_idx")
          .agg(min("ets").as("st"), max("ets").as("en"))
        val a = sess.filter(col("user_id") % 2 === 0)
          .select(col("user_id").as("a_user"), col("session_idx").as("a_sess"),
            col("st").as("a_start"), col("en").as("a_end"))
        val b = sess.filter(col("user_id") % 2 === 1)
          .select(col("user_id").as("b_user"), col("session_idx").as("b_sess"),
            col("st").as("b_start"), col("en").as("b_end"))
        graft.operators.Temporal.intervalJoin(a, "a_start", "a_end",
            b, "b_start", "b_end", bucketWidth = 43200000000L)
          .select("a_user", "a_sess", "b_user", "b_sess")
      },
      Some("""WITH g AS (SELECT user_id, event_id, epoch_us(ts) AS ets,
          epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
        FROM events),
        s AS (SELECT user_id, ets,
          SUM(CASE WHEN gap IS NULL OR gap > 43200000000 THEN 1 ELSE 0 END) OVER
            (PARTITION BY user_id ORDER BY ets, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS session_idx
        FROM g),
        sess AS (SELECT user_id, session_idx, min(ets) AS st, max(ets) AS en
          FROM s GROUP BY 1, 2)
        SELECT a.user_id AS a_user, CAST(a.session_idx AS BIGINT) AS a_sess,
          b.user_id AS b_user, CAST(b.session_idx AS BIGINT) AS b_sess
        FROM sess a JOIN sess b
          ON a.user_id % 2 = 0 AND b.user_id % 2 = 1
          AND a.st <= b.en AND b.st <= a.en""")),

    // skew DIAGNOSIS: the top-heavy-key census that precedes salting —
    // keys above 1% of all rows with their permille share (driver-side
    // threshold truncation mirrored by floor() in the oracle)
    Q("skew_key_census",
      (s, d) => graft.operators.Skew.skewedKeys(
        t(s, d, "events").select(
          when(col("event_id") % 10 < 3, lit(1L)).otherwise(col("user_id"))
            .as("k")),
        "k", threshold = 0.01),
      Some("""WITH l AS (SELECT CASE WHEN event_id % 10 < 3 THEN 1
            ELSE user_id END AS k FROM events),
        t AS (SELECT count(*) AS n FROM l),
        c AS (SELECT k, CAST(count(*) AS BIGINT) AS cnt FROM l GROUP BY 1)
        SELECT k, cnt, cnt * 1000 // n AS share_x1000
        FROM c, t WHERE cnt > CAST(floor(n * 0.01) AS BIGINT)""")),

    // two-phase salted count over the same hot-key relation: the
    // (key, salt) pre-combine must re-aggregate to exactly the plain
    // GROUP BY counts whatever the salting
    Q("skew_salted_count",
      (s, d) => graft.operators.Skew.saltedCount(
        t(s, d, "events").select(
          when(col("event_id") % 10 < 3, lit(1L)).otherwise(col("user_id"))
            .as("k")),
        "k", parts = 8),
      Some("""SELECT CASE WHEN event_id % 10 < 3 THEN 1 ELSE user_id END AS k,
          count(*) AS cnt
        FROM events GROUP BY 1""")),

    // skewed-key join through the salting operator: ~30% of events collapse
    // onto one hot key, the join fans it out over (key, salt) — results must
    // equal the plain SQL join regardless of salting
    Q("skew_salted_join",
      (s, d) => {
        val l = t(s, d, "events").select(
          when(col("event_id") % 10 < 3, lit(1L)).otherwise(col("user_id")).as("k"))
        val r = t(s, d, "customer").select(col("c_custkey").as("k"), col("c_mktsegment"))
        graft.operators.Skew.saltedJoin(l, r, "k", parts = 8)
          .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
      },
      Some("""WITH l AS (SELECT CASE WHEN event_id % 10 < 3 THEN 1 ELSE user_id END AS k
          FROM events),
        r AS (SELECT c_custkey AS k, c_mktsegment FROM customer)
        SELECT c_mktsegment, count(*) AS cnt FROM l JOIN r USING (k) GROUP BY 1""")),

    // EXPONENTIALLY-DECAYED counts (the freshness-weighted feature):
    // per-user daily counts folded through s = (s*85) DIV 100 + cnt over
    // the dense span to the common frontier — empty days decay, truncating
    // DIV each step is the portability contract; the oracle replays the
    // identical recurrence with a RECURSIVE CTE, step for step
    Q("event_decayed_counts",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), expr("ts div 1000").as("ets"))
        val fr = ev.agg(max(expr("ets div 86400000000"))).head().getLong(0)
        graft.operators.Temporal.decayedCounts(ev, "user_id", "ets",
          bucketWidth = 86400000000L, decayNum = 85, decayDen = 100,
          frontier = fr)
      },
      Some("""WITH RECURSIVE c AS (SELECT user_id,
            epoch_us(ts) // 86400000000 AS b, CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2),
        f AS (SELECT max(b) AS fr FROM c),
        k AS (SELECT user_id, min(b) AS b0, CAST(count(*) AS BIGINT) AS nb
          FROM c GROUP BY 1),
        r(user_id, b, s) AS (
          SELECT k.user_id, k.b0,
            (SELECT cnt FROM c WHERE c.user_id = k.user_id AND c.b = k.b0)
          FROM k
          UNION ALL
          SELECT r.user_id, r.b + 1, (r.s * 85) // 100 + coalesce(c.cnt, 0)
          FROM r JOIN f ON r.b < f.fr
          LEFT JOIN c ON c.user_id = r.user_id AND c.b = r.b + 1)
        SELECT k.user_id, CAST(k.b0 AS BIGINT) AS first_bucket,
          k.nb AS n_active_buckets, CAST(r.s AS BIGINT) AS decayed_x
        FROM r JOIN f ON r.b = f.fr JOIN k ON k.user_id = r.user_id""")),

    // INCREMENTAL decayed counts: state built to a mid-range day
    // frontier round-trips through parquet (decay stamps survive in
    // column metadata), the later half folds in stepwise — keys absent
    // from the batch still decay, new keys start from zero — and the
    // folded scores must equal the one-shot recurrence over everything
    // (same RECURSIVE-CTE oracle)
    Q("event_decayed_incremental",
      (s, d) => {
        val T = graft.operators.Temporal
        val ev = t(s, d, "events")
          .select(col("user_id"), expr("ts div 1000").as("ets"))
        val mm = ev.agg(min(expr("ets div 86400000000")),
          max(expr("ets div 86400000000"))).head()
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val cut = (lo + hi) / 2
        val dir = java.nio.file.Files.createTempDirectory("graft-decay-state")
        T.decayedCounts(ev.filter(expr("ets div 86400000000") <= cut),
            "user_id", "ets", 86400000000L, 85, 100, frontier = cut)
          .write.mode("overwrite").parquet(dir.toString)
        val state = s.read.parquet(dir.toString)
        val out = T.decayedCountsFold(state,
            ev.filter(expr("ets div 86400000000") > cut), "user_id", "ets",
            newFrontier = hi)
          .localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some("""WITH RECURSIVE c AS (SELECT user_id,
            epoch_us(ts) // 86400000000 AS b, CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2),
        f AS (SELECT max(b) AS fr FROM c),
        k AS (SELECT user_id, min(b) AS b0, CAST(count(*) AS BIGINT) AS nb
          FROM c GROUP BY 1),
        r(user_id, b, s) AS (
          SELECT k.user_id, k.b0,
            (SELECT cnt FROM c WHERE c.user_id = k.user_id AND c.b = k.b0)
          FROM k
          UNION ALL
          SELECT r.user_id, r.b + 1, (r.s * 85) // 100 + coalesce(c.cnt, 0)
          FROM r JOIN f ON r.b < f.fr
          LEFT JOIN c ON c.user_id = r.user_id AND c.b = r.b + 1)
        SELECT k.user_id, CAST(k.b0 AS BIGINT) AS first_bucket,
          k.nb AS n_active_buckets, CAST(r.s AS BIGINT) AS decayed_x
        FROM r JOIN f ON r.b = f.fr JOIN k ON k.user_id = r.user_id""")),

    // CONCENTRATION census (HHI over permille shares): how concentrated
    // each user's activity is across event types — 1e6 = one-trick,
    // ~2e5 = uniform over 5 types; integer-exact truncating shares
    Q("event_concentration",
      (s, d) => graft.operators.Temporal.concentration(
        t(s, d, "events"), "user_id", "event_type"),
      Some("""WITH c AS (SELECT user_id, event_type,
            CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
        tt AS (SELECT user_id, cnt,
            sum(cnt) OVER (PARTITION BY user_id) AS tot FROM c),
        sh AS (SELECT user_id, cnt * 1000 // tot AS s, tot FROM tt)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_keys,
          CAST(max(tot) AS BIGINT) AS total_cnt,
          CAST(sum(s * s) AS BIGINT) AS hhi_x1e6
        FROM sh GROUP BY 1""")),

    // GINI inequality over per-type counts (the concentration census's
    // companion: HHI weighs the head, Gini the whole distribution) —
    // sorted-rank formula in DECIMAL(38,0), replayed exactly
    Q("event_inequality",
      (s, d) => graft.operators.Temporal.inequality(
        t(s, d, "events"), "user_id", "event_type"),
      Some("""WITH c AS (SELECT user_id, event_type,
            CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
        r AS (SELECT user_id, cnt, CAST(row_number() OVER (
            PARTITION BY user_id ORDER BY cnt, event_type) AS BIGINT) AS i
          FROM c),
        g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_keys,
            CAST(sum(cnt) AS BIGINT) AS total_cnt,
            sum(i::HUGEINT * cnt) AS ic
          FROM r GROUP BY 1)
        SELECT user_id, n_keys, total_cnt,
          CAST(((2 * ic - (n_keys + 1)::HUGEINT * total_cnt) * 1000000)
            // (n_keys::HUGEINT * total_cnt) AS BIGINT) AS gini_x1e6
        FROM g""")),

    // TOP-K user journeys: the 15 most common 3-step event paths — one
    // user-keyed lead window, a combinable path count, TakeOrdered; the
    // oracle replays windows, concatenation, and the (cnt, path) order
    Q("event_top_paths",
      (s, d) => graft.operators.Temporal.topPaths(
        t(s, d, "events")
          .select(col("user_id"), col("event_type"),
            expr("ts div 1000").as("ets"), col("event_id")),
        "user_id", "event_type", "ets", "event_id", length = 3, k = 15),
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ets,
            event_id FROM events),
        l AS (SELECT user_id, event_type AS t0,
            lead(event_type, 1) OVER w AS t1,
            lead(event_type, 2) OVER w AS t2
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ets, event_id)),
        p AS (SELECT t0 || '>' || t1 || '>' || t2 AS path, count(*) AS cnt
          FROM l WHERE t1 IS NOT NULL AND t2 IS NOT NULL GROUP BY 1)
        SELECT CAST(row_number() OVER (ORDER BY cnt DESC, path) AS BIGINT) AS rank,
          path, CAST(cnt AS BIGINT) AS cnt
        FROM p ORDER BY cnt DESC, path LIMIT 15""")),

    // STREAMING decayed-counts maintenance — the twelfth maintainer, the
    // r15 fold-replay class in its purest form (the fold refuses late
    // data, so txnApplied MUST gate it): two day-boundary drops on one
    // checkpoint, served scores ≡ the one-shot recurrence (same oracle)
    Q("streaming_decay_ingest",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), expr("ts div 1000").as("ets"))
        val mm = ev.agg(min(expr("ets div 86400000000")),
          max(expr("ets div 86400000000"))).head()
        val cut = (mm.getLong(0) + mm.getLong(1)) / 2
        val root = java.nio.file.Files.createTempDirectory("graft-sdc")
        val src = s"$root/src"
        ev.filter(expr("ets div 86400000000") <= cut)
          .write.mode("append").parquet(src)
        val schema = s.read.parquet(src).schema
        graft.streaming.StreamingIngest.decayIngest(s, src, schema,
          "user_id", "ets", 86400000000L, 85, 100, s"$root/state", s"$root/ck")
        ev.filter(expr("ets div 86400000000") > cut)
          .write.mode("append").parquet(src)
        graft.streaming.StreamingIngest.decayIngest(s, src, schema,
          "user_id", "ets", 86400000000L, 85, 100, s"$root/state", s"$root/ck")
        val out = new graft.store.VersionedTable(s, s"$root/state").read()
          .localCheckpoint(true)
        deleteDir(root.toFile)
        out
      },
      Some("""WITH RECURSIVE c AS (SELECT user_id,
            epoch_us(ts) // 86400000000 AS b, CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2),
        f AS (SELECT max(b) AS fr FROM c),
        k AS (SELECT user_id, min(b) AS b0, CAST(count(*) AS BIGINT) AS nb
          FROM c GROUP BY 1),
        r(user_id, b, s) AS (
          SELECT k.user_id, k.b0,
            (SELECT cnt FROM c WHERE c.user_id = k.user_id AND c.b = k.b0)
          FROM k
          UNION ALL
          SELECT r.user_id, r.b + 1, (r.s * 85) // 100 + coalesce(c.cnt, 0)
          FROM r JOIN f ON r.b < f.fr
          LEFT JOIN c ON c.user_id = r.user_id AND c.b = r.b + 1)
        SELECT k.user_id, CAST(k.b0 AS BIGINT) AS first_bucket,
          k.nb AS n_active_buckets, CAST(r.s AS BIGINT) AS decayed_x
        FROM r JOIN f ON r.b = f.fr JOIN k ON k.user_id = r.user_id""")),

    // ACTIVITY STREAKS (gaps-and-islands): per-user consecutive-day runs
    // — total active days, streak count, longest and current streak —
    // from ONE combinable distinct to the (key, bucket) relation, island
    // windows riding that tiny relation only (never the raw events)
    Q("event_streaks",
      (s, d) => graft.operators.Temporal.streaks(
        t(s, d, "events").select(col("user_id"), expr("ts div 1000").as("ets")),
        "user_id", "ets", bucketWidth = 86400000000L),
      Some("""WITH a AS (SELECT DISTINCT user_id,
            epoch_us(ts) // 86400000000 AS bkt FROM events),
        i AS (SELECT user_id, bkt, bkt - row_number()
            OVER (PARTITION BY user_id ORDER BY bkt) AS isl FROM a),
        g AS (SELECT user_id, isl, CAST(count(*) AS BIGINT) AS len,
            max(bkt) AS endb FROM i GROUP BY 1, 2)
        SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_buckets,
          CAST(count(*) AS BIGINT) AS n_streaks,
          CAST(max(len) AS BIGINT) AS longest_streak,
          CAST(arg_max(len, endb) AS BIGINT) AS current_streak,
          CAST(max(endb) AS BIGINT) AS last_bucket
        FROM g GROUP BY 1""")),

    // SAMPLE-RATIO-MISMATCH check — the safety gate a lift report is
    // conditioned on: observed arm shares vs the configured 500/300/200
    // permilles, signed deviation, and the flag; arms ride in via the
    // spec so a zero-traffic arm still reports (its absence IS the
    // signal). Integer-exact; one combinable count + broadcast spec
    Q("event_experiment_srm",
      (s, d) => {
        val E = graft.operators.Experiment
        val units = t(s, d, "events").select(col("user_id")).distinct()
        val hashed = units.withColumn("h",
          expr("CAST(conv(substr(md5(concat(CAST(user_id AS STRING), ':exp2')), " +
            "1, 15), 16, 10) AS BIGINT)"))
        val assigned = E.assign(hashed, "h",
          Seq(("control", 500), ("blue", 300), ("green", 200)))
        E.srmCheck(assigned, "arm",
          Seq(("control", 500), ("blue", 300), ("green", 200)),
          thresholdPermille = 50)
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
        h AS (SELECT CAST(list_sum(list_transform(range(1, 16),
            i -> CAST(strpos('0123456789abcdef',
                substr(md5(CAST(user_id AS VARCHAR) || ':exp2'), i, 1)) - 1
              AS HUGEINT) << (4 * (15 - i)))) AS BIGINT) AS h FROM u),
        a AS (SELECT CASE WHEN h % 1000 < 500 THEN 'control'
            WHEN h % 1000 < 800 THEN 'blue' ELSE 'green' END AS arm FROM h),
        o AS (SELECT arm, CAST(count(*) AS BIGINT) AS units FROM a GROUP BY 1),
        spec AS (SELECT * FROM (VALUES ('control', 500), ('blue', 300),
          ('green', 200)) s(arm, ep)),
        tt AS (SELECT CAST(sum(units) AS BIGINT) AS tot FROM o)
        SELECT spec.arm, coalesce(o.units, 0) AS units,
          CAST(spec.ep AS BIGINT) AS expected_permille,
          CASE WHEN tot IS NULL OR tot = 0 THEN 0
            ELSE coalesce(o.units, 0) * 1000 // tot END AS observed_permille,
          CASE WHEN tot IS NULL OR tot = 0 THEN 0
            ELSE coalesce(o.units, 0) * 1000 // tot END - spec.ep
            AS deviation_permille,
          abs(CASE WHEN tot IS NULL OR tot = 0 THEN 0
            ELSE coalesce(o.units, 0) * 1000 // tot END - spec.ep) > 50
            AS srm_flag
        FROM spec LEFT JOIN o USING (arm), tt""")),

    // DETERMINISTIC experiment split + lift report: arm membership is a
    // pure function of the salted 60-bit unit hash (h % 1000 against
    // cumulative permille ranges — no stored assignment, replayable by any
    // engine), conversion = "user ever purchased" pre-aggregated to one
    // row per unit, and the relative conversion-rate lift vs control is
    // integer-exact in DECIMAL(38,0). One combinable groupBy over units,
    // control row broadcast back — the |arms|-row report at any scale.
    Q("event_experiment_lift",
      (s, d) => {
        val E = graft.operators.Experiment
        val units = t(s, d, "events").groupBy(col("user_id")).agg(
          max((col("event_type") === "purchase").cast("int")).as("converted"),
          sum(when(col("event_type") === "purchase", cents(col("value")))
            .otherwise(lit(0L))).as("purchase_cents"))
        val hashed = units.withColumn("h",
          expr("CAST(conv(substr(md5(concat(CAST(user_id AS STRING), ':exp1')), " +
            "1, 15), 16, 10) AS BIGINT)"))
        val assigned = E.assign(hashed, "h",
          Seq(("control", 500), ("treatment", 500)))
        E.lift(assigned, "arm", "converted", Some("purchase_cents"), "control")
      },
      Some("""WITH u AS (SELECT user_id,
            max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
            sum(CASE WHEN event_type = 'purchase'
              THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS val
          FROM events GROUP BY 1),
        h AS (SELECT conv, val, CAST(list_sum(list_transform(range(1, 16),
            i -> CAST(strpos('0123456789abcdef',
                substr(md5(CAST(user_id AS VARCHAR) || ':exp1'), i, 1)) - 1
              AS HUGEINT) << (4 * (15 - i)))) AS BIGINT) AS h FROM u),
        a AS (SELECT CASE WHEN h % 1000 < 500 THEN 'control' ELSE 'treatment' END AS arm,
            conv, val FROM h),
        g AS (SELECT arm, CAST(count(*) AS BIGINT) AS units,
            CAST(sum(conv) AS BIGINT) AS conversions,
            CAST(sum(val) AS BIGINT) AS value_sum FROM a GROUP BY 1),
        c AS (SELECT units AS uc, conversions AS cc FROM g WHERE arm = 'control')
        SELECT g.arm, g.units, g.conversions, g.value_sum,
          g.conversions * 1000 // g.units AS conv_permille,
          CASE WHEN g.arm = 'control' THEN CAST(0 AS BIGINT)
            WHEN c.cc = 0 THEN NULL
            ELSE CAST((g.conversions::HUGEINT * c.uc * 1000)
              // (c.cc::HUGEINT * g.units) - 1000 AS BIGINT) END AS lift_permille
        FROM g, c""")))
}
