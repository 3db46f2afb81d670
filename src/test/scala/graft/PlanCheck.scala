package graft

import org.apache.spark.sql.SparkSession

/** Manual plan-hygiene dump: prints formatted physical plans for the
  * queries whose shape matters at 100 TB, to eyeball pushdown, broadcast,
  * and whole-stage codegen. Run: sbt "Test/runMain graft.PlanCheck <sfDir>". */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq(
      "q1_agg", "q3_top_orders", "p3_watermark", "p1_projection",
      "j1_anti_join", "w1_latest_per_key", "dedup_simhash", "ann_topk_bruteforce",
      "text_decontaminate", "pack_concat_chunks", "text_term_stats")
    val fns = SparkEntry.queries
    interesting.foreach { name =>
      println(s"\n========== $name ==========")
      fns(name)(spark, sfDir).explain("formatted")
    }

    // automated invariants over the optimized plans (things that silently
    // rot: lost pushdown, de-broadcast joins, accidental global windows)
    def planOf(name: String): String = {
      val df = fns(name)(spark, sfDir)
      df.queryExecution.executedPlan.toString + "\n" +
        df.queryExecution.optimizedPlan.toString
    }
    val checks: Seq[(String, String, String => Boolean)] = Seq(
      ("q1_agg", "filter pushed to parquet scan",
        p => p.contains("PushedFilters: [IsNotNull") || p.contains("PushedFilters: [")),
      ("q3_top_orders", "dimension joins broadcast",
        p => p.contains("BroadcastHashJoin")),
      ("j1_anti_join", "anti join broadcast",
        p => p.contains("BroadcastHashJoin") && p.contains("LeftAnti")),
      ("text_decontaminate", "bench posting list broadcast",
        p => p.contains("BroadcastHashJoin")),
      ("pack_concat_chunks", "cumsum window partitioned by bucket (no global single-partition sort)",
        // the window spec must lead with the __pid partition key: a
        // regression to a global window prints windowspecdefinition(<order
        // col> ASC ... ) with no partition column in front
        p => p.contains("windowspecdefinition(__pid")),
      ("ann_topk_bruteforce", "top-k via TakeOrdered, not global sort",
        p => p.contains("TakeOrderedAndProject")),
      ("store_skipping", "manifest pruning: GraftFileIndex scan, filters pushed to parquet",
        p => p.contains("GraftFileIndex") && p.contains("PushedFilters: [")),
      ("store_cdf", "change feed is ONE scan, not a per-version union of jobs",
        p => !p.contains("Union")),
      ("dedup_spans", "span windows keyed, never global (h/gram verify + doc merge)",
        // every window in the span plan must carry a partition key — a
        // regression to windowspecdefinition(pos ASC...) with no leading
        // partition column would serialize the corpus on one executor
        p => p.contains("windowspecdefinition(h#") &&
          p.contains("windowspecdefinition(doc_id#") &&
          !p.contains("windowspecdefinition(pos#")),
      ("sample_token_budget", "budget cumsum bucketed by (group, lcgBucket), bases broadcast",
        p => p.contains("windowspecdefinition(source#") &&
          p.contains("BroadcastHashJoin")),
      ("sample_shuffle_shards", "shard rank windowed per key bucket (no global window), bases broadcast",
        p => p.contains("windowspecdefinition(__bk") &&
          p.contains("BroadcastHashJoin")),
      // (dedup_exact_probe's gate checkpoints its result, which truncates
      // the returned plan — its no-SMJ invariant runs below on the raw
      // operator instead)
      ("dedup_semantic", "semantic pairing confined to cluster cells (no cartesian, no nested-loop)",
        p => !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")),
      ("ann_topk_pq", "ADC shortlist via TakeOrdered, not a global sort",
        p => p.contains("TakeOrderedAndProject")),
      ("ann_topk_sq8", "SQ8 integer-dot shortlist via TakeOrdered, kernel codegen'd (no UDF)",
        p => p.contains("TakeOrderedAndProject") &&
          p.contains("int_dot_to_query") && !p.contains("BatchEvalPython")),
      ("event_rate_features", "trailing features = ONE user-keyed RANGE-frame window, no join/cartesian",
        p => p.contains("windowspecdefinition(user_id#") &&
          !p.contains("Join") && !p.contains("CartesianProduct")),
      ("asof_join_forward", "forward as-of = union-sort (keyed window), NOT a join (no |L|x|R| pairing)",
        p => p.contains("windowspecdefinition(__k#") && !p.contains("Join") &&
          !p.contains("CartesianProduct")),
      ("asof_join_nearest", "nearest as-of = the SAME union with two keyed window passes + a pick projection, NOT a join",
        p => p.contains("windowspecdefinition(__k#") && !p.contains("Join") &&
          !p.contains("CartesianProduct")),
      ("interval_overlap_join", "interval overlap rides the bucket equi-join (no cartesian/nested-loop)",
        p => !p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin")),
      ("text_distinct_sketch", "KMV sketch partial-aggregates map-side (O(k) state, no distinct shuffle)",
        p => p.contains("partial_graft_kmin_distinct") &&
          !p.contains("Expand")),
      ("sample_bottomk", "bottom-k sample = O(k) bounded-heap partial agg, NO row_number window over the tail",
        p => p.contains("partial_graft_topk") && !p.contains("Window")),
      ("agg_quantile_sketch", "quantile sketch = combinable histogram GROUP BY + keyed windows on the tiny histogram (no data sort, no cartesian)",
        // the corpus-side work must stay one partial-combined count; the
        // windows run keyed by group over <= 64*2^k histogram rows
        p => p.contains("partial_count") &&
          p.contains("windowspecdefinition(l_returnflag#") &&
          !p.contains("CartesianProduct")),
      ("hybrid_topk", "modality pools via TakeOrdered; fusion join has no cartesian",
        p => p.contains("TakeOrderedAndProject") && !p.contains("CartesianProduct")),
      ("text_chunk_windows", "chunking is a pure narrow fan-out (no exchange, no join)",
        p => !p.contains("Exchange") && !p.contains("Join")),
      ("ann_range_search", "radius search is one narrow filtered scan (no exchange, no sort)",
        p => !p.contains("Exchange") && !p.contains("Sort")),
      ("text_lm_score", "LM models partial-agg'd, vocab a literal, no cartesian/fan-out join",
        // the vocab size must be folded into the expression as a driver
        // scalar (no CROSS JOIN in the plan), and both count models must
        // partial-aggregate map-side before their exchange
        p => !p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin") &&
          p.contains("partial_count")),
      ("text_bm25_topk", "BM25: df broadcast, top-k via TakeOrdered, no cartesian",
        // corpus totals fold in as driver scalars (no cross join); the
        // per-term df side broadcasts; the final top-k is a TakeOrdered
        p => p.contains("TakeOrderedAndProject") &&
          p.contains("BroadcastHashJoin") &&
          !p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin")),
      ("graph_pagerank", "PageRank rounds are keyed joins only (no cartesian/nested-loop)",
        p => !p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin")),
      ("dedup_containment", "containment join rides the prefix posting index (no cartesian)",
        p => !p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin")),
      ("text_dsir_select", "DSIR: weight table broadcast, top-k via TakeOrdered, no cartesian",
        // the 4096-bucket weight histogram must broadcast into the scoring
        // join (corpus postings never shuffle for it) and the final rank
        // must be a TakeOrdered, never a global sort materialization
        p => p.contains("BroadcastHashJoin") &&
          p.contains("TakeOrderedAndProject") &&
          !p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin")),
      ("text_score_buckets", "bucket thresholds broadcast; NO per-language window (single-reducer trap)",
        p => p.contains("BroadcastHashJoin") && !p.contains("Window") &&
          !p.contains("SortMergeJoin")),
      ("text_phrase_blocklist", "phrase filter is a map-only pass (automaton rides the closure)",
        p => !p.contains("Exchange") && !p.contains("Join")),
      ("text_quality_classifier", "classifier APPLY is a map-only pass (weights ride the closure)",
        // training runs eagerly at gate build (driver-side epochs); the
        // returned plan is the corpus-wide scoring pass, which must stay
        // one codegen projection — a regression to a weights JOIN would
        // shuffle the corpus at apply time
        p => !p.contains("Exchange") && !p.contains("Join")),
      ("text_boilerplate_removal", "boilerplate apply is one shuffle-free projection (InSet probe, no join)",
        // the filter list must ride the closure as an InSet literal — a
        // regression to a join (text shuffles) or a linear In scan would
        // change the 100 TB cost class of the apply pass
        p => !p.contains("Exchange") && !p.contains("Join") &&
          p.contains("INSET")),
      ("text_contamination_rate", "contamination pass is map-only (bench set rides the closure as InSet)",
        // the benchmark gram set must fold into the projection as an InSet
        // literal — a regression to a join would shuffle corpus text for a
        // metadata-scale reference set
        p => !p.contains("Exchange") && !p.contains("Join") &&
          p.contains("INSET")),
      ("text_keywords", "keyword window keyed BY DOCUMENT; df side broadcast or partial-agg'd",
        // a regression to windowspecdefinition(term…) or an un-keyed window
        // would rank the whole corpus on one executor
        p => p.contains("windowspecdefinition(doc_id#") &&
          !p.contains("CartesianProduct")),
      ("dedup_tfidf_cosine", "cosine verify rides the capped inverted index (no cartesian/nested-loop)",
        p => !p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin")),
      ("pipeline_pretrain_mix", "composed pipeline: packing window stays bucketed, contamination InSet folded, no cartesian",
        // composition must not degrade any stage's plan class: the final
        // cumsum window keeps its __pid bucket key (never global), the
        // bench gram set stays a folded InSet (no join for it), and no
        // stage pairing degenerates to a cartesian
        p => p.contains("windowspecdefinition(__pid") &&
          p.contains("INSET") &&
          !p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin")),
      ("event_funnel", "funnel = combinable MINs + keyed joins: NO window, no cartesian",
        // a regression to a per-user window (sort every user's events) or
        // a cartesian step pairing would change the operator's cost class
        p => !p.contains("Window") && !p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin") &&
          p.contains("partial_min")),
      ("event_retention", "retention = one distinct + min-per-key + keyed join: NO window",
        p => !p.contains("Window") && !p.contains("CartesianProduct") &&
          p.contains("partial_min")),
      ("event_funnel_incremental", "funnel fold = batch MINs + keyed joins against the state: NO window, no cartesian",
        // the fold must keep funnel's cost class — a per-key window would
        // sort history the state exists to avoid
        p => !p.contains("Window") && !p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin") &&
          p.contains("partial_min")),
      ("event_transitions", "transition matrix window keyed BY USER (lead bounded by one user's events)",
        p => p.contains("windowspecdefinition(user_id#") &&
          !p.contains("CartesianProduct")),
      ("event_funnel_window", "windowed funnel keeps the MIN+join shape: NO window exec, no cartesian",
        p => !p.contains("Window") && !p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin") &&
          p.contains("partial_min")),
      ("event_retention_incremental", "retention fold: the state side is probed via BROADCAST semi/anti — never sort-merge-shuffled, no window",
        p => p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
          !p.contains("Window") && !p.contains("CartesianProduct")),
      ("event_transitions_incremental", "transition fold: batch windows keyed BY USER, frontier anti-join broadcast, no cartesian",
        p => p.contains("windowspecdefinition(user_id#") &&
          p.contains("BroadcastHashJoin") &&
          !p.contains("CartesianProduct")),
      ("event_sessionize_incremental", "sessionize fold: batch windows keyed BY USER, frontier broadcast, no cartesian (history never re-sorted)",
        p => p.contains("windowspecdefinition(user_id#") &&
          p.contains("BroadcastHashJoin") &&
          !p.contains("CartesianProduct")),
      ("event_transitions_2step", "k-step transition window keyed BY USER too",
        p => p.contains("windowspecdefinition(user_id#") &&
          !p.contains("CartesianProduct")),
      ("event_active_users", "rolling actives = distinct + bounded coverage fan-out + combinable count: NO window, no cartesian",
        // the DAU/WAU/MAU family must keep funnel's cost class — the only
        // corpus shuffle is the (key, bucket) distinct (map-side
        // combinable), the window frontier folds in as a driver scalar
        // (no cross join), and counts partial-aggregate
        p => !p.contains("Window") && !p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin") &&
          p.contains("partial_count")),
      ("event_active_users_incremental", "rolling-actives fold rides the retention state's broadcast probe: no SMJ on the state, NO window",
        p => p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
          !p.contains("Window") && !p.contains("CartesianProduct")),
      ("event_active_users_sketch", "sketched actives: KMV partial-aggregates map-side with NO corpus distinct (no Expand), no window",
        // the billion-key shape: raw events flow through the coverage
        // fan-out straight into O(k) partial sketch states — a regression
        // to a distinct (Expand / extra exchange-agg pair) or a window
        // would reintroduce the corpus shuffle KMV exists to avoid
        p => p.contains("partial_graft_kmin_distinct") &&
          !p.contains("Expand") && !p.contains("Window") &&
          !p.contains("CartesianProduct")),
      ("agg_hll_distinct", "HLL: registers partial-aggregate map-side (one keyed shuffle), NO distinct/Expand, no window",
        // the fixed-state sketch shape: a regression to count(DISTINCT)
        // (Expand + double exchange) or a window would reintroduce the
        // corpus shuffle the m-byte registers exist to avoid
        p => p.contains("partial_graft_hll_registers") &&
          !p.contains("Expand") && !p.contains("Window") &&
          !p.contains("CartesianProduct")),
      ("event_active_users_hll", "HLL actives: coverage fan-out straight into partial registers — NO corpus distinct, no window",
        p => p.contains("partial_graft_hll_registers") &&
          !p.contains("Expand") && !p.contains("Window") &&
          !p.contains("CartesianProduct")),
      ("event_attribution_linear", "attribution rides the (user, bucket) equi-join — no cartesian/nested-loop; weight windows keyed BY CONVERSION",
        p => p.contains("windowspecdefinition(conv_id#") &&
          !p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin")),
      ("agg_hll_cube", "HLL cube: grouping sets feed partial register states in ONE pass (Expand is the cube, not a distinct)",
        p => p.contains("partial_graft_hll_registers") &&
          !p.contains("CartesianProduct") && !p.contains("Window")),
      ("agg_quantile_transform", "quantile transform: tiny-histogram window + BROADCAST join back — no corpus sort (the percent_rank replacement)",
        // the per-row permille must come from the broadcast histogram via
        // codegen bucket arithmetic; a regression to percent_rank would
        // print a corpus-keyed window and an SMJ would shuffle the scan
        p => p.contains("BroadcastHashJoin") &&
          p.contains("windowspecdefinition(l_returnflag#") &&
          !p.contains("SortMergeJoin") && !p.contains("CartesianProduct")),
      ("agg_outlier_fences", "outlier fences: sketch histogram + BROADCAST fences + combinable counts (no corpus sort, no SMJ)",
        p => p.contains("BroadcastHashJoin") && p.contains("partial_sum") &&
          !p.contains("SortMergeJoin") && !p.contains("CartesianProduct")),
      ("timeseries_change_ratio", "change ratio: combinable pre-agg; RANGE windows keyed by series over the tiny bucketed relation",
        p => p.contains("windowspecdefinition(event_type#") &&
          p.contains("partial_sum") && !p.contains("CartesianProduct") &&
          !p.contains("Join")),
      ("event_audience_overlap", "overlap sketch: ONE corpus shuffle into O(k) KMV partials; pairing is metadata-scale (no corpus window)",
        // the corpus must reach the plan exactly once, as partial KMV
        // states — a regression to a distinct (Expand) or a row_number
        // window would shuffle the key domain this sketch exists to avoid
        p => p.contains("partial_graft_kmin_distinct") &&
          !p.contains("Expand") && !p.contains("Window") &&
          !p.contains("CartesianProduct")),
      ("sample_priority", "priority sample = O(k) bounded-heap partial agg + broadcast join-back: NO row_number window over the tail",
        p => p.contains("partial_graft_topk") &&
          p.contains("BroadcastHashJoin") && !p.contains("Window") &&
          !p.contains("SortMergeJoin") && !p.contains("CartesianProduct")),
      ("event_cohort_ltv", "LTV triangle: combinable aggs, running sums windowed BY COHORT over the tiny triangle, sizes broadcast",
        // the corpus-side work must stay combinable aggregates + one keyed
        // join; the only window rides the |buckets|² triangle, keyed by
        // cohort (a global or user-keyed window here would be a regression
        // to sorting corpus-scale data)
        p => p.contains("windowspecdefinition(cohort#") &&
          p.contains("BroadcastHashJoin") && p.contains("partial_count") &&
          !p.contains("CartesianProduct")),
      ("event_decayed_counts", "decay recurrence inside the per-key aggregate: NO window, NO join — one combinable count + one keyed fold",
        // the dense-span iteration must stay a higher-order expression in
        // the aggregate projection; a regression to a per-bucket explode
        // + window would shuffle the grid
        p => p.contains("partial_count") && !p.contains("Window") &&
          !p.contains("Join") && !p.contains("CartesianProduct")),
      ("event_streaks", "island windows keyed BY USER over the tiny activity relation, no join",
        p => p.contains("windowspecdefinition(user_id#") &&
          !p.contains("Join") && !p.contains("CartesianProduct")),
      ("event_top_paths", "path windows keyed BY USER; top-k via TakeOrdered, not a global sort",
        p => p.contains("windowspecdefinition(user_id#") &&
          p.contains("TakeOrderedAndProject") &&
          !p.contains("CartesianProduct")),
      ("agg_minmax_scale", "group stats broadcast back over a second scan — no SMJ, no window",
        p => p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
          !p.contains("Window")),
      ("agg_winsorize", "fences from the tiny-histogram window (keyed by group), broadcast back — no SMJ, no corpus sort",
        p => p.contains("BroadcastHashJoin") &&
          p.contains("windowspecdefinition(l_returnflag#") &&
          !p.contains("SortMergeJoin") && !p.contains("CartesianProduct")),
      ("reconcile_diff", "diff = ONE keyed full join, per-column compare in projection — no cartesian/nested-loop",
        p => !p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin")),
      ("q5_local_volume", "6-way join: every dimension broadcast, no cartesian/nested-loop (the join-order exercise)",
        p => p.contains("BroadcastHashJoin") &&
          !p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin")),
      ("basket_cooccurrence", "basket pairs via the basket-keyed equi-join (never cartesian); size cap windowed BY BASKET; dims broadcast",
        // the pair join must stay keyed on the basket column — a
        // cartesian here is |items|² over the whole corpus — and the
        // fan-out cap must ride a basket-keyed window, not a global one
        p => p.contains("windowspecdefinition(__b#") &&
          p.contains("BroadcastHashJoin") && !p.contains("CartesianProduct")),
      ("event_experiment_lift", "experiment lift: combinable unit aggregates, the ONE control row broadcast back (no SMJ, no window)",
        // assignment is projection arithmetic and the report is |arms|
        // rows: the only join tolerable here is the single-row control
        // broadcast (a BNLJ over a 1-row IdentityBroadcast is the cheap
        // cross join, not a regression)
        p => p.contains("BroadcastExchange") && p.contains("partial_count") &&
          !p.contains("SortMergeJoin") && !p.contains("Window")),
      ("scd2_point_in_time", "point-in-time join = the asof union-sort (ONE keyed shuffle + window), never a facts×versions join",
        // the leak-free feature join must keep the tagged-union shape: a
        // regression to a range join (facts×versions pairing, then a
        // per-fact row_number) would print a Join node and shuffle every
        // version against every covering fact
        p => p.contains("windowspecdefinition(__k#") &&
          !p.contains("Join") && !p.contains("CartesianProduct")),
      ("text_bloom_membership", "bloom: words built via partial bit_or map-side, state joined BROADCAST for probes, no SMJ/window",
        // the ≤ ceil(m/60)-word state must collapse map-side (OR partials)
        // and reach the probe join broadcast — a sort-merge join would
        // shuffle the probe set against a metadata-sized relation, and a
        // window here would mean the all-bits-set check lost its
        // combinable-min shape
        p => p.contains("partial_bit_or") &&
          p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
          !p.contains("Window") && !p.contains("CartesianProduct")),
      ("text_countmin_freq", "count-min: combinable cell counts, state joined BROADCAST for lookups (never shuffled), no window",
        // the d×w state is metadata-sized by construction — a regression
        // to a sort-merge join would shuffle the probe set against it for
        // nothing, and any window here would mean the lookup lost its
        // aggregate shape
        p => p.contains("BroadcastHashJoin") && p.contains("partial_count") &&
          !p.contains("SortMergeJoin") && !p.contains("Window") &&
          !p.contains("CartesianProduct")),
      ("timeseries_gapfill", "gap-fill = combinable bucket agg + ONE user-keyed window + bounded explode: NO grid join",
        // the scale shape: a regression to a dense-grid JOIN (or a global
        // window) would shuffle the grid a second time — the lookahead
        // window must stay keyed by user and the plan join-free
        p => p.contains("windowspecdefinition(user_id#") &&
          p.contains("partial_max") && !p.contains("Join") &&
          !p.contains("CartesianProduct")),
      ("dedup_cdc_chunks", "CDC windows keyed (doc-keyed assembly, (h,chunk) verify — never global), no cartesian",
        // a regression to windowspecdefinition(p#...) with no leading
        // partition column would serialize the whole token stream on one
        // executor; the raw-verify window must key on the chunk hash
        p => p.contains("windowspecdefinition(doc_id#") &&
          p.contains("windowspecdefinition(h#") &&
          !p.contains("windowspecdefinition(p#") &&
          !p.contains("CartesianProduct")))
    println("\n========== invariants ==========")
    var failed = 0
    checks.foreach { case (name, what, ok) =>
      val pass = ok(planOf(name))
      if (!pass) failed += 1
      println(f"${if (pass) "PASS" else "FAIL"}  $name%-22s $what")
    }
    // HLL fold/serve on raw states (the gate checkpoints its result, which
    // truncates the returned plan): the fold must stay a partial-max
    // combinable aggregate over the tiny register relation — no
    // sort-merge join, no window
    locally {
      import org.apache.spark.sql.functions.{col, expr}
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet").select(
        col("l_orderkey"), col("l_returnflag"),
        expr("CAST(conv(substr(md5(CAST(l_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT)")
          .as("h"))
      val S = graft.operators.Sketches
      val a = S.hllRegisterState(li.filter(col("l_orderkey") % 2 === 0),
        "l_returnflag", "h", 6, 60)
      val b = S.hllRegisterState(li.filter(col("l_orderkey") % 2 === 1),
        "l_returnflag", "h", 6, 60)
      val out = S.hllOf(S.hllFold(a, b), 6, 60)
      out.collect()
      val p = out.queryExecution.executedPlan.toString
      val pass = p.contains("partial_max") && !p.contains("SortMergeJoin") &&
        !p.contains("Window") && !p.contains("CartesianProduct")
      if (!pass) failed += 1
      println(f"${if (pass) "PASS" else "FAIL"}  agg_hll_incremental    fold = partial-max combinable aggregate over the register state (no SMJ, no window)")
    }

    // probe-strategy incremental dedup: the history side must reach the
    // plan as a narrow scan probed by broadcast semi/anti joins — never a
    // sort-merge shuffle (the gate checkpoints its result, so this checks
    // the raw operator's executed plan)
    locally {
      import org.apache.spark.sql.functions.col
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val seen = graft.operators.Dedup.exact(docs, "doc_id", "text").select("fp")
      val out = graft.operators.Dedup.exactIncremental(
        docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", seen,
        strategy = "probe")
      out.collect()
      val p = out.queryExecution.executedPlan.toString
      val pass = p.contains("BroadcastHashJoin") && p.contains("LeftAnti") &&
        !p.contains("SortMergeJoin")
      graft.operators.Dedup.releaseIntermediates()
      if (!pass) failed += 1
      println(f"${if (pass) "PASS" else "FAIL"}  dedup_exact_probe      history probed via broadcast semi/anti — never sort-merge-shuffled")
    }

    // persisted BM25 index serving: the query's term IN (...) filter must
    // PUSH into the postings parquet scan (only probed terms' row groups
    // read — the whole point of the stored index) and the top-k must be a
    // TakeOrdered, not a global sort (the gate checkpoints its result, so
    // this checks the raw serve plan over a real on-disk index)
    locally {
      import org.apache.spark.sql.functions.col
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val (p0, l0) = graft.operators.TextCorpus.bm25Index(docs, "doc_id", "text")
      val root = java.nio.file.Files.createTempDirectory("graft-pc-bm25")
      p0.repartitionByRange(col("term")).sortWithinPartitions("term")
        .write.mode("overwrite").parquet(s"$root/p")
      l0.write.mode("overwrite").parquet(s"$root/l")
      val out = graft.operators.TextCorpus.bm25Serve(
        spark.read.parquet(s"$root/p"), spark.read.parquet(s"$root/l"),
        Seq("merge", "window", "spark"), 10)
      val p = out.queryExecution.executedPlan.toString
      val pass = p.contains("PushedFilters: [In(term") &&
        p.contains("TakeOrderedAndProject")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(root.toFile)
      if (!pass) failed += 1
      println(f"${if (pass) "PASS" else "FAIL"}  text_bm25_serve        term IN pushed into the postings scan; top-k via TakeOrdered")
    }

    // deletion-vector read: the probe must print under a WholeStageCodegen
    // node (the `*(n)` prefix on its Filter line) in the FINALIZED adaptive
    // plan — a regression to a UDF or interpreted predicate would split the
    // span and box every scanned row of a DV'd table (needs execution: AQE
    // only assigns codegen ids once stages finalize)
    locally {
      val df = fns("store_dv_delete")(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val pass = p.linesIterator.exists(l =>
        l.contains("graft_dv_deleted") &&
          """\*\(\d+\) Filter""".r.findFirstIn(l).isDefined)
      if (!pass) failed += 1
      println(f"${if (pass) "PASS" else "FAIL"}  store_dv_delete        DV probe codegen'd inside the scan stage (no UDF codegen break)")
    }

    // row-id read: both FileAttrLookup probes must print under a
    // WholeStageCodegen Project in the FINALIZED plan (fresh derivation is
    // map-side arithmetic over the scan — no exchange, no join against a
    // file table), riding the store_row_ids gate's scenario table
    locally {
      val df = fns("store_row_ids")(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val pass = p.linesIterator.exists(l =>
        l.contains("graft_file_attr") &&
          """\*\(\d+\) Project""".r.findFirstIn(l).isDefined) &&
        !p.contains("Exchange") && !p.contains("Join")
      if (!pass) failed += 1
      println(f"${if (pass) "PASS" else "FAIL"}  store_row_ids          row-id derivation codegen'd map-side (no exchange/join)")
    }

    // runtime pruning counter: execute the skipping query and ask the index
    // how many dirs the pushed dataFilters kept (transparent-path check)
    locally {
      val df = fns("store_skipping")(spark, sfDir)
      df.count()
      val idx = df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f.relation.location
      }.collectFirst { case g: org.apache.spark.sql.graft.GraftFileIndex => g }
      val pruned = idx.flatMap(_.lastPruning)
      val pass = pruned.exists { case (kept, total) => total == 4 && kept == 1 }
      if (!pass) failed += 1
      println(f"${if (pass) "PASS" else "FAIL"}  store_skipping         index kept 1 of 4 dirs at planning (got $pruned)")
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
