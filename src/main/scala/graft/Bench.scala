package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints a detail JSON line then ONE COMPACT JSON line last (the driver
  * parses a bounded stdout tail — the compact line is the record). A cheap
  * warmup query first absorbs JVM/codegen startup; each query then runs
  * SPARK_GRAFT_BENCH_RUNS times (default 3); the compact line's per-query
  * figure is the BEST-OF-CLEAN MIN, the detail line carries medians.
  * Memoized-scenario queries (scd2_*, store_delta_writer) run exactly once
  * in the first pass (their scenario caches per (scenario, sfDir), so a
  * plain second invocation would time a cache read, not the engine); when
  * that single run lands in an un-clean window, the retry pass rebuilds
  * the scenario into a FRESH destination per attempt
  * ([[graft.queries.Scenarios.withFreshScenarios]]) so each retry times
  * the full engine run.
  *
  * CONTENTION SELF-DEFENSE: a fixed ~100 ms CPU probe (the sentinel) runs
  * between every individual query run. A run whose adjacent probes sat
  * within 1.5× of the whole run's sentinel minimum AND within 1.5× of the
  * probe's quiet-host STRUCTURAL cost (absolute gate — a uniformly
  * contended stretch inflates sMin too and would otherwise certify
  * itself) executed in a certified-quiet window ("clean"); a query with
  * no clean run is retried
  * up to SPARK_GRAFT_BENCH_RETRIES (default 2) extra times chasing one.
  * `queries_min` is the BEST-OF-CLEAN minimum (falling back to all runs
  * when no window was ever quiet), `clean` flags which queries got a quiet
  * window, and `sentinel_per_query` reports each query's cleanest adjacent
  * probe ratio — so a single noisy query reading >2× its baseline can be
  * dismissed (or confirmed) without re-running the whole suite. */
object Bench {
  /** Headline set: the flagship SCD2 CDC run + one representative of each
    * heavy operator family (agg, join+topk, window, dedup families, ANN,
    * temporal joins, clustering, packing, corpus stats, text scoring). */
  val headline: Seq[String] = Seq(
    "scd2_history", "q1_agg", "q3_top_orders", "w1_latest_per_key",
    "dedup_exact", "dedup_minhash_lsh", "dedup_minhash_incremental",
    "dedup_simhash", "dedup_ngram_jaccard", "dedup_semantic",
    "dedup_clusters", "dedup_spans", "ann_topk_bruteforce", "ann_topk_ivf",
    // the billion-vector composed index (train+assign+partitioned write+
    // probe each run) and the one-pass lexical+vector fusion — the two
    // heaviest r8/r9 retrieval additions, benched so regressions show
    "ann_topk_ivfpq", "hybrid_topk",
    "asof_join", "range_join", "pack_concat_chunks",
    "text_term_stats", "text_heavy_hitters", "text_quality",
    // manifest-level data skipping: first run builds the 4-dir table (the
    // Scenarios cache keeps it), later runs time readWhere dir pruning
    "store_skipping",
    // foreign `_delta_log` continuation: scenario-memoized like scd2_*
    // (single run times the full-load→foreign-delta-append→log-replay read)
    "store_delta_writer",
    // LIVE two-drop graft-table stream (fresh table per run, never
    // memoized): offset resolution + 2 AvailableNow micro-batches — an
    // O(table) regression in commit/offset resolution surfaces here
    "streaming_drain_bench",
    // r13: the newest operator families, previously un-tracked round-over-
    // round (r12 verdict item 6) — asymmetric containment (near-full
    // prefixes + capped postings), CDC gear-hash chunk census, DSIR
    // importance scoring, integer-exact BM25. (graph_pagerank was
    // measured for inclusion and rejected: ~12 s at sf0.01 — its
    // fixed-cost round structure would add ~40 s of wall per bench run
    // for no extra signal; its sf1 sweep tracks it instead.)
    "dedup_containment", "dedup_cdc_chunks", "text_dsir_select",
    "text_bm25_topk",
    // r13 (this session): the new boilerplate family's one-shot path —
    // two census passes + the shuffle-free InSet apply, the shape whose
    // filter-list growth could surprise at scale (sample_temperature is
    // NOT added: its selection shape is already tracked by sample_mixture
    // via the shared tokenBudgetSample machinery)
    "text_boilerplate_removal",
    // r14: multi-table orchestration (Graft.syncAll, two tables at
    // parallelism 2, full+delta rounds) — scd2_history was the only SCD2
    // entry with a round-over-round wall signal; this one tracks the
    // concurrent-orchestration path (lock handling, per-table engines
    // sharing one session). Scenario-memoized like scd2_*.
    "syncall_customer_history",
    // r14: the two new text families — in-engine classifier training
    // (vocab census + 2 epochs of score-filter-aggregate + the map-only
    // apply) and cross-corpus LM scoring (reference-side model aggs + two
    // N:1 scoring joins)
    "text_quality_classifier", "text_lm_cross_score",
    // r14: tf-idf weighted cosine near-dup — the candidate join is the
    // wall signal (norm-prefix-filtered inverted index, 258k candidates
    // at sf0.1 vs 1.13M unfiltered)
    "dedup_tfidf_cosine",
    // r15: the event-analytics family's two join/distinct-heavy shapes
    // (r14 verdict item 4) — funnel's shrinking-survivor keyed joins and
    // retention's (key, bucket) distinct + min-per-key + join-back; both
    // landed after the r14 bench cut and had no round-over-round signal
    "event_funnel", "event_retention",
    // r16 (r15 verdict item 4): the newest join shapes with no
    // round-over-round wall signal — the interval-overlap bucket
    // equi-join (74,828-pair output at sf0.1, the heaviest new gate) and
    // the keyed-window transition matrix
    "interval_overlap_join", "event_transitions",
    // r16b: the two newest shapes with no round-over-round signal — the
    // HLL coverage fan-out straight into native register partials (the
    // billion-key actives path; also the round's only new native agg),
    // and gap-fill's agg + keyed-lookahead-window + bounded explode
    "event_active_users_hll", "timeseries_gapfill",
    // r16c: the two newest shapes with wall signal — the basket-keyed
    // pair self-join (quadratic-fan-out family; support/lift arithmetic)
    // and the persisted BM25 index round-trip (build + term-clustered
    // parquet write + fold + served query)
    "basket_cooccurrence", "text_bm25_incremental")

  /** Expected QUIET band per headline query: the upper edge of the
    * builder-box certified-quiet readings recorded in BASELINE.md (sf0.1,
    * local[32]) — updated each round from fresh certified-quiet
    * measurements whenever an operator's structure changes (the update
    * protocol is documented in BASELINE.md). The compact JSON emits these
    * plus `over_band` = queries whose best-of-clean min exceeded
    * [[OverBandRatio]]× their band, so a clean-but-slow reading (r12's
    * dedup_semantic: clean:true at 2.4× band) is machine-visible without
    * cross-referencing BASELINE prose. A query missing here (new this
    * round, band not yet certified) is never flagged. */
  val bands: Map[String, Double] = Map(
    "scd2_history" -> 3.3, "q1_agg" -> 0.35, "q3_top_orders" -> 0.8,
    "w1_latest_per_key" -> 0.35, "dedup_exact" -> 0.4,
    // minhash_lsh re-read at r15 (driver sat exactly at the 2.7 line in
    // r14): two certified-quiet runs=5 passes read min_clean 1.781/1.923,
    // medians 1.94/2.06 — the builder-box floor is ~1.8-2.1 and r13's
    // 2.16 was ordinary, but the DRIVER's certified-quiet r14 read was
    // 2.706, so 2.7 stands as the cross-box band (the >2x flag rule
    // leaves headroom either way)
    "dedup_minhash_lsh" -> 2.7, "dedup_minhash_incremental" -> 2.2,
    // jaccard re-read r16 (r15 verdict item 1: the driver's 4.166 rode a
    // 1.55x-sentinel window): two certified-quiet runs=5 passes (sentinel
    // medians 0.122/0.124, all windows clean, 0-2 drained) read min_clean
    // 2.385/2.463, medians 2.836/2.744 — code byte-identical to the 2.37
    // r14 reading, so 4.166 was weather as suspected; band nudged 2.4 →
    // 2.5 to sit on the quiet cluster's upper edge (2.37-2.46)
    "dedup_simhash" -> 2.6, "dedup_ngram_jaccard" -> 2.5,
    // dedup_semantic's band moved 1.5 → 2.1 at r11's 3dbd051 (the hot-cell
    // refinement join deliberately stopped riding the cached hash(cell)
    // partitioning — skew guard); the r12 "weak" was a stale band, not a
    // regression (r13 triage: 10-run floor 2.08 clean on a 1.2× box)
    "dedup_semantic" -> 2.1, "dedup_clusters" -> 3.5, "dedup_spans" -> 1.1,
    "ann_topk_bruteforce" -> 0.4, "ann_topk_ivf" -> 1.2,
    "ann_topk_ivfpq" -> 2.1, "hybrid_topk" -> 0.6, "asof_join" -> 0.25,
    "range_join" -> 0.3, "pack_concat_chunks" -> 0.7,
    "text_term_stats" -> 0.5, "text_heavy_hitters" -> 0.6,
    "text_quality" -> 0.16, "store_skipping" -> 0.4,
    "store_delta_writer" -> 5.0, "streaming_drain_bench" -> 1.4,
    // r14 re-certification of the r13 first-round bands (r13 verdict item
    // 1): two certified-quiet passes (load 0.00, sentinel floors 0.084 /
    // 0.094 at 0.100 struct), runs=5 each — band = the upper edge of the
    // quiet readings. Quiet pairs: containment 2.78/3.22, cdc 0.96/1.03,
    // dsir 1.00/1.01, bm25 0.87/1.06, boilerplate 1.17/1.71 (r13: 1.50).
    // scd2_history read 2.22/2.79 (r13 cluster 2.6-3.0) — its 3.3 band
    // stands; the r13 driver's 4.35 was box weather, as suspected.
    "dedup_containment" -> 3.2, "dedup_cdc_chunks" -> 1.1,
    "text_dsir_select" -> 1.1, "text_bm25_topk" -> 1.1,
    "text_boilerplate_removal" -> 1.8,
    // r14 first-round band, RE-CERTIFIED r15 (two runs=5 passes): quiet
    // min_clean 3.638 (sentinel 1.01×) joins the r14 cluster 2.63-3.76 —
    // 4.0 confirmed. A 5.15 reading rode a 1.35×-sentinel window
    // (drained 7) and is weather; fresh-epoch rebuild medians run ~5 s
    // (scenario build variance, per the memoized-retry note) but the
    // band is judged on best-of-clean
    "syncall_customer_history" -> 4.0,
    // r14 first-round bands, RE-CERTIFIED r15: quiet clusters 0.88-0.95
    // (classifier; r14 0.88/1.06) and 1.02-1.35 (cross-LM; r14
    // 0.96/1.31) — both bands confirmed as-is
    "text_quality_classifier" -> 1.2, "text_lm_cross_score" -> 1.4,
    // r15 re-certification (r14 verdict item 1): two certified-quiet
    // runs=5 passes (sentinel medians 0.115/0.118 at 0.100 struct, all
    // per-query windows clean) — min_clean 2.975/3.073, medians
    // 3.06/3.45, driver quiet read 3.27; band = de-rated upper edge of
    // the quiet cluster (closes the r14 ADVICE band-below-observed note)
    "dedup_tfidf_cosine" -> 4.0,
    // r15 first-round bands for the event-analytics headliners: quiet
    // pairs 0.201/0.200 min, 0.222/0.291 median (funnel) and 0.301/0.271
    // min, 0.377/0.352 median (retention) — de-rated upper edges.
    // RE-CERTIFIED r16 (two quiet runs=5 passes, sentinels 0.122/0.124):
    // funnel min 0.280/0.297, retention min 0.352/0.356 — both confirmed
    "event_funnel" -> 0.35, "event_retention" -> 0.5,
    // r16 first-round bands (r15 verdict item 4), same two quiet passes:
    // interval overlap min 0.830/0.981 median 1.014/1.026; transitions
    // min 0.389/0.434 median 0.445/0.488 — de-rated upper edges
    "interval_overlap_join" -> 1.2, "event_transitions" -> 0.6,
    // r16b first-round bands, two certified-quiet runs=5 passes (sentinel
    // medians 0.126/0.139 at 0.100 struct): hll actives min_clean
    // 0.606/0.685, gap-fill 0.452/0.469 — de-rated upper edges
    "event_active_users_hll" -> 0.9, "timeseries_gapfill" -> 0.65,
    // r16c first-round bands, two certified-quiet runs=5 passes at the
    // CONTRACT 32-cpu geometry (sentinel medians 0.124/0.121 at 0.100
    // struct; an earlier 4-cpu pair read within 10% of these — both
    // queries are fixed-cost dominated): basket pairs min_clean
    // 1.367/1.500, bm25 index round-trip 1.785/1.879 — de-rated upper
    // edges
    "basket_cooccurrence" -> 2.1, "text_bm25_incremental" -> 2.2)

  /** A clean reading above this multiple of its band is flagged
    * `over_band` — the same >2×-band rule the round verdicts apply. */
  val OverBandRatio = 2.0

  /** Queries whose scenario memoizes per (scenario, sfDir): a PLAIN
    * repetition would time a cache read, not the engine (VERDICT r9
    * What's-wrong #1: the retry pass re-invoked scd2_history, the memoized
    * scenario returned instantly, and a 0.05 s cache read became the
    * recorded best-of-clean min) — so these run once in the first pass and
    * retry only via fresh-epoch scenario rebuilds. */
  private def memoized(name: String): Boolean =
    name.startsWith("scd2_") || name.startsWith("syncall_") ||
      name == "store_delta_writer"

  /** Queries whose FIRST invocation lazily builds a memoized scenario the
    * query itself then reads (store_skipping builds the 4-dir table once;
    * the operator under test is the pruned read): run once UNTIMED before
    * the timed passes, or the build run can end up the only
    * certified-quiet sample and best-of-clean exceeds the median (seen at
    * sf0.1: 2.32 s "min" vs 0.255 s median). */
  private val prewarm: Seq[String] = Seq("store_skipping")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: small scan+agg to JIT the read path (not timed)
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    // Contention sentinel: a FIXED ~100 ms CPU-bound probe (hash-sum over a
    // synthetic range — no IO, no shuffle, constant work) interleaved
    // between headline queries. Its spread (max/min) separates host weather
    // from real regressions: code changes cannot move the sentinel, so a
    // sentinel spread of 2-3× says the box was contended and per-query
    // medians carry that noise; a tight sentinel (≤1.3×) certifies the run.
    import org.apache.spark.sql.functions.{sum => fsum, xxhash64, pmod, col, lit}
    def sentinelOnce(): Double = {
      val t0 = System.nanoTime()
      // pmod bounds the summands so the 40M-row sum cannot overflow ANSI Long
      spark.range(0, 40000000L, 1, cpus.toInt)
        .select(fsum(pmod(xxhash64(col("id")), lit(1000000L)))).head()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).foreach(_ => sentinelOnce()) // JIT the probe itself (not recorded)
    val sentinels = scala.collection.mutable.ArrayBuffer(sentinelOnce())
    // probes DISCARDED by the settle-and-drain loop: excluded from window
    // judgment (a heavy run's self-inflicted GC/cleanup tail is not host
    // weather) but fed into the summary's contention telemetry below, so
    // a short external burst the drain absorbed still shows in the
    // recorded median/max/spread instead of vanishing entirely
    val drained = scala.collection.mutable.ArrayBuffer[Double]()

    val fns = SparkEntry.queries
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val retries = sys.env.getOrElse("SPARK_GRAFT_BENCH_RETRIES", "2").toInt
    // a run is CLEAN when both sentinel samples adjacent to it sat within
    // CLEAN_RATIO of the whole run's sentinel minimum — the probe is
    // constant work, so an inflated adjacent probe certifies external
    // contention DURING that window, and the query's time there is weather,
    // not code (two consecutive driver rounds were uninterpretable without
    // this: sentinel spreads 6.15× and 9.7×)
    val CleanRatio = 1.5
    // ABSOLUTE clean gate (r10 verdict): the relative check alone lets a
    // UNIFORMLY contended stretch certify itself — every sample inflated
    // lifts sMin too, and ratios look quiet. The probe is constant work,
    // so its quiet-host structural cost is a stable prior: ~0.1 s at 32
    // cpus on the driver host (BASELINE.md), scaling ~linearly with 1/cpus
    // for an embarrassingly parallel probe. A window is clean only when
    // its adjacent probes ALSO sit within CleanRatio of that structural
    // floor. Overridable for genuinely different hosts.
    val structCost = sys.env.get("SPARK_GRAFT_SENTINEL_STRUCT").map(_.toDouble)
      .getOrElse(0.1 * 32.0 / cpus.toInt)
    // a failing query must NOT fold its (fast-fail) wall time into the
    // median as if it were a green run — it reports null and is excluded
    // from the total, with its name listed under "failed"
    def once(name: String): Option[Double] = {
      // drop persisted intermediates from prior runs: repeated invocations
      // would otherwise hit the cache registry (identical logical plans)
      // and the median would time warm cache reads, not the operator
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { fns(name)(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
      catch {
        case e: Throwable => System.err.println(s"[bench] $name failed: $e"); None
      }
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    // every individual run records the sentinel sample indices adjacent to
    // it; cleanliness is judged at the END against the final sentinel min
    case class Run(time: Option[Double], sBefore: Int, sAfter: Int)
    def timedRun(name: String): Run = {
      val before = sentinels.size - 1
      val t = once(name)
      // settle-and-drain before the after-probe: a heavy run leaves GC
      // debt and ASYNC cleanup (ContextCleaner unpersists, temp dirs,
      // shuffle files, stream shutdown) that a 100 ms probe fired
      // immediately absorbs — reading as a "dirty window" on a perfectly
      // quiet host (measured: the two memoized scenario builds and the
      // live-stream bench were the only entries whose ADJACENT probes sat
      // 2–4.6× while every probe elsewhere was ≤1.5×; a single 120 ms
      // settle fixed the stream but not the scenario builds). The probe
      // re-fires up to 3 times while its sample stays above the absolute
      // quiet bar, so a SELF-inflicted tail drains out of the record while
      // SUSTAINED external contention — what the sentinel exists to
      // certify — reads high on every re-probe and keeps the window
      // dirty. (A sub-second external burst could slip past the drain;
      // that residual risk is the same order as the probe's own 100 ms
      // sampling granularity.)
      System.gc()
      Thread.sleep(120)
      var s = sentinelOnce()
      var extraProbes = 0
      while (s > CleanRatio * structCost && extraProbes < 3) {
        drained += s // keep the discarded sample in the contention record
        Thread.sleep(120)
        s = sentinelOnce()
        extraProbes += 1
      }
      sentinels += s
      Run(t, before, sentinels.size - 1)
    }
    // local triage aid: SPARK_GRAFT_BENCH_ONLY=a,b,c runs a subset
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val names = headline.filter(fns.contains)
      .filter(n => only.forall(_.contains(n)))
    prewarm.filter(fns.contains).foreach(once) // scenario builds, untimed
    val allRuns = scala.collection.mutable.Map[String, Vector[Run]]()
    names.foreach { name =>
      val n = if (memoized(name)) 1 else runs
      allRuns(name) = Vector.fill(n)(timedRun(name))
    }
    // retry pass: a query with NO clean run gets up to `retries` more
    // attempts — the whole point is one certified-quiet window per query.
    // Memoized-scenario queries retry differently: a plain re-invocation
    // would time a cache read, so each retry rebuilds the scenario from
    // scratch into a FRESH destination (Scenarios.withFreshScenarios) —
    // the re-run times the full engine run, and these entries can now earn
    // clean:true on a noisy-then-quiet host like everything else (r11
    // verdict: the two memoized entries were the only ones structurally
    // unable to, and both recorded the round's biggest outliers).
    // the relative gate's denominator is FLOORED at the structural cost: a
    // single lucky-fast probe sample (measured: sMin 0.077 s vs median
    // 0.123 s on one run) must not redefine "quiet" below what the probe
    // structurally costs — with a raw sMin floor, ordinary 0.12 s probes
    // read 1.56× and a quiet run certified only 11/25 queries. On a box
    // genuinely slower than the assumed struct, sMin > struct and the
    // relative gate binds as before.
    def ratioOf(r: Run, sMin: Double): Double =
      math.max(sentinels(r.sBefore), sentinels(r.sAfter)) /
        math.max(sMin, structCost)
    def isClean(r: Run, sMin: Double): Boolean =
      ratioOf(r, sMin) <= CleanRatio &&
        math.max(sentinels(r.sBefore), sentinels(r.sAfter)) <=
          CleanRatio * structCost
    def retryLoop(name: String, attempt: () => Run): Unit = {
      var left = retries
      while (left > 0 && {
        val sMin = sentinels.min
        !allRuns(name).exists(r => r.time.isDefined && isClean(r, sMin))
      }) {
        allRuns(name) = allRuns(name) :+ attempt()
        left -= 1
      }
    }
    names.filterNot(memoized).foreach(n => retryLoop(n, () => timedRun(n)))
    names.filter(memoized).foreach(n => retryLoop(n,
      () => graft.queries.Scenarios.withFreshScenarios(timedRun(n))))
    // (median over all runs, best-of-clean min, cleanest window ratio)
    val sMinF = sentinels.min
    val results: Seq[(String, Option[(Double, Double)], Double, Boolean)] =
      names.map { name =>
        val rs = allRuns(name)
        val ok = rs.filter(_.time.isDefined)
        val failedAny = rs.exists(_.time.isEmpty)
        val cleanOk = ok.filter(r => isClean(r, sMinF))
        val bestRatio =
          if (ok.isEmpty) Double.NaN
          else ok.map(r => ratioOf(r, sMinF)).min
        val stats = if (failedAny || ok.isEmpty) None else Some((
          median(ok.flatMap(_.time)),
          (if (cleanOk.nonEmpty) cleanOk else ok).flatMap(_.time).min))
        (name, stats, bestRatio, cleanOk.nonEmpty)
      }
    // Locale.ROOT: the JVM default locale may render decimals with a comma
    // ("0,123"), silently breaking the machine-parsable JSON contract
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def render(f: ((Double, Double)) => Double): String = results.map {
      case (k, Some(t), _, _) => "\"" + k + "\":" + fmt(f(t))
      case (k, None, _, _) => "\"" + k + "\":null"
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, None, _, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val cleanJson = results.map { case (k, _, _, c) => "\"" + k + "\":" + c }
      .mkString("{", ",", "}")
    val perQuerySentinel = results.map { case (k, _, r, _) =>
      "\"" + k + "\":" + (if (r.isNaN) "null" else fmt(r))
    }.mkString("{", ",", "}")
    val total = results.flatMap(_._2.map(_._1)).sum
    val totalMin = results.flatMap(_._2.map(_._2)).sum
    // summary stats see EVERY observed probe sample — recorded windows AND
    // drain-discarded ones — so the contention record cannot under-report
    // a burst the drain absorbed; only window JUDGMENT (sMinF, per-run
    // adjacency) excludes the drained list
    val allSamples = sentinels.toSeq ++ drained
    val sMax = allSamples.max
    val sentinelJson = s"""{"median":${fmt(median(allSamples))},"min":${fmt(sMinF)},"max":${fmt(sMax)},"spread":${fmt(sMax / sMinF)},"struct":${fmt(structCost)},"samples":${sentinels.size},"drained":${drained.size}}"""
    // TWO lines: a detail line first (medians, per-query cleanest sentinel
    // ratios, clean flags — everything a human or the judge wants), then
    // ONE COMPACT line LAST. The driver parses a 2,000-char stdout tail;
    // the r9 single fat line blew past it and the round recorded no bench
    // (VERDICT r9 What's-wrong #2). The compact line keeps the driver
    // contract ("queries" per-query seconds = best-of-clean min, the
    // trustworthy statistic) and stays well under the tail window.
    // per-query quiet bands + the over-band flag: a reading can be CLEAN
    // (quiet window) yet far above its recorded band — r12's
    // dedup_semantic read 3.72 s clean against a 1.4–1.5 s band and the
    // gap was only visible by hand-reading BASELINE prose
    def fmt2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val bandsJson = names.flatMap(n => bands.get(n).map(b =>
      "\"" + n + "\":" + fmt2(b))).mkString("{", ",", "}")
    val overBand = results.collect {
      case (k, Some((_, mn)), _, _)
        if bands.get(k).exists(b => mn > OverBandRatio * b) => "\"" + k + "\""
    }.mkString("[", ",", "]")
    println(s"""{"detail":"medians","queries_median":${render(_._1)},"sentinel_per_query":$perQuerySentinel,"clean":$cleanJson}""")
    def compactLine(withBands: Boolean) = {
      val bandFields =
        if (withBands) s""""bands":$bandsJson,"over_band":$overBand,"""
        else s""""over_band":$overBand,"""
      s"""{"metric":"total","value":${fmt(totalMin)},"unit":"sec","queries":${render(_._2)},"total_min":${fmt(totalMin)},"total_median":${fmt(total)},"failed":$failed,$bandFields"sentinel":$sentinelJson,"sf":"$sfDir","runs":$runs,"stat":"min_clean"}"""
    }
    val compact = compactLine(withBands = true)
    if (compact.length <= 1900) println(compact)
    else if (compactLine(withBands = false).length <= 1900)
      // degrade gracefully: drop the band map (recoverable from source),
      // keep the over_band verdicts
      println(compactLine(withBands = false))
    else
      // belt-and-braces: never let the final line outgrow the tail window
      println(s"""{"metric":"total","value":${fmt(totalMin)},"unit":"sec","queries":{},"total_min":${fmt(totalMin)},"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
