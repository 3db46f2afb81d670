#!/usr/bin/env python3
"""sf1-scale oracle check for the five heaviest dedup gates (round-7 verdict
item 8). Run `sbt "Test/runMain graft.Sf1Drive"` first — it synthesizes the
10x corpus (per-copy token salting; see its scaladoc for the construction
and the cross-copy editdist impossibility argument) and dumps the five
gates' outputs. This script replays each gate's DuckDB oracle over the same
synthesized corpus and diffs the multisets. The editdist oracle runs PER
COPY: copies are disjoint in q-gram space and every cross-copy pair has
distance >= 2 x tokens >= 20 > maxDist 10 by the salt construction, so the
per-copy union IS the full truth (the script also asserts the engine
reported zero cross-copy pairs).

Usage: python3 tools/sf1_check.py [oracle_sql.json]
(default oracle file: /tmp/verify-out/oracle_sql.json, written by
`sbt "runMain graft.Verify <sfdir> /tmp/verify-out"`)."""
import duckdb
import json
import sys
import time

SF1 = "/root/repo/tmp/sf1/documents.parquet/*.parquet"
OUT = "/root/repo/tmp/sf1-out"
GATES = ["dedup_spans", "dedup_minhash_incremental", "dedup_clusters", "dedup_simhash",
         "dedup_containment", "dedup_cdc_chunks", "sample_mixture", "text_dsir_select",
         "text_dsir_sample", "text_boilerplate_removal",
         # round-14: sample_temperature and text_dedup_segments replay the
         # Catalog oracle verbatim (salting changes token spelling, not
         # counts/positions); text_phrase_blocklist replays with its phrase
         # literals salted to copy 0 (the hybrid_topk protocol)
         "sample_temperature", "text_dedup_segments", "text_phrase_blocklist",
         "text_quality_classifier", "text_lm_cross_score",
         "dedup_simhash_incremental",
         # round-14: contamination rate / keywords replay their Catalog
         # oracles verbatim (the bench slice / keyword counts apply the
         # same predicates to the synthesized corpus); the tfidf cosine
         # oracle runs PER COPY below — its full-corpus pair join spills
         # past the box's disk in DuckDB, and per-copy salting makes the
         # per-copy union the exact truth (no shingle crosses copies)
         "text_contamination_rate", "text_keywords",
         # round-14: repetition coverage — per-row projections, oracles
         # replay verbatim (the salt is constant within a copy, so
         # within-doc repeats are preserved)
         "text_dup_ngram_coverage", "text_top_ngram_coverage",
         # round-15: KMV distinct sketch — the oracle replays the whole
         # sketch (kept set, kth min, integer-exact estimate) verbatim
         "text_distinct_sketch",
         # round-16: deterministic bottom-k-by-hash sample — the oracle
         # replays the identical (hash, id) order over the 10x corpus
         "sample_bottomk",
         # round-16b: count-min frequency sketch — the oracle replays the
         # affine-mod-prime cells and min-of-d estimates verbatim (salted
         # tokens just shift which terms cross the >= 20 probe bar)
         "text_countmin_freq", "text_countmin_incremental",
         # round-16b: DLT priority sample — the oracle replays priorities,
         # the kept set, tau, and the estimates row-for-row
         "sample_priority", "streaming_countmin_ingest",
         # round-16b: persisted KMV state (fold + streaming) — same oracle
         # as the one-shot census
         "text_distinct_sketch_incremental", "streaming_kmv_ingest",
         # round-16b: token-weighted doc-length percentiles
         "agg_quantile_weighted",
         # round-16c: bloom membership — the oracle replays the whole
         # filter (affine-mod-prime bit indices, OR'd 60-bit words,
         # all-bits-set probes) verbatim over the salted vocabulary
         "text_bloom_membership", "text_bloom_incremental",
         "streaming_bloom_ingest",
         # round-16c: sliding chunker — starts/slices/joins replay verbatim
         # over the salted tokens
         "text_sliding_chunks",
         # round-16c: incremental clustering — same recursive-reach oracle
         # as dedup_clusters (salting keeps pairs copy-local)
         "dedup_clusters_incremental"]

# the drive salts the gate's phrase literals to copy 0 — mirror it here
PHRASE_SALT = {"query spark hash": "query_00 spark_00 hash_00",
               "scan filter": "scan_00 filter_00",
               "slow table": "slow_00 table_00",
               "key agg": "key_00 agg_00"}

# text_score_buckets at sf1 buckets n_chars by lang (the gate's linear
# score degenerates to the constant bias on salted tokens): the same
# histogram / threshold (cum*3 >= j*total) / assignment rule as the
# Catalog oracle, with n_chars standing in for the score column
SCORE_BUCKETS_SF1_SQL = """
  WITH sc AS (SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
      FROM documents),
    hist AS (SELECT lang, n_chars AS s, count(*) AS c FROM sc GROUP BY 1, 2),
    cum AS (SELECT lang, s, sum(c) OVER (PARTITION BY lang ORDER BY s) AS cm,
        sum(c) OVER (PARTITION BY lang) AS tot FROM hist),
    cuts AS (SELECT lang,
        min(CASE WHEN cm * 3 >= tot THEN s END) AS c1,
        min(CASE WHEN cm * 3 >= 2 * tot THEN s END) AS c2
      FROM cum GROUP BY lang)
    SELECT sc.doc_id, sc.lang, sc.n_chars,
      CAST(1 + CASE WHEN sc.n_chars > c.c1 THEN 1 ELSE 0 END
         + CASE WHEN sc.n_chars > c.c2 THEN 1 ELSE 0 END AS BIGINT) AS bucket
    FROM sc JOIN cuts c ON sc.lang = c.lang"""


def compare(con, got_rel, oracle_sql):
    cols = sorted(r[0] for r in con.execute(f"DESCRIBE ({got_rel})").fetchall())
    collist = ", ".join(f'"{c}"' for c in cols)
    n_got, n_ora, d1, d2 = con.execute(
        f"""SELECT (SELECT count(*) FROM ({got_rel})),
            (SELECT count(*) FROM ({oracle_sql})),
            (SELECT count(*) FROM (SELECT {collist} FROM ({got_rel})
              EXCEPT ALL SELECT {collist} FROM ({oracle_sql}))),
            (SELECT count(*) FROM (SELECT {collist} FROM ({oracle_sql})
              EXCEPT ALL SELECT {collist} FROM ({got_rel})))"""
    ).fetchone()
    return n_got, n_ora, n_got == n_ora and d1 == 0 and d2 == 0


EMB = "/root/repo/tmp/sf1/embeddings.parquet/*.parquet"
EMB_GATES = ["dedup_semantic", "dedup_semantic_incremental", "ann_topk_sq8",
             "ann_topk_sq8_indexed",
             "ann_topk_pq", "ann_topk_ivfpq", "hybrid_topk"]


def main_emb(oracle_path):
    """Embedding-gate sweep (round-8 verdict item 6): every oracle replays
    over the FULL 10x corpus — no per-copy shortcut (the 64-dim cosine
    oracle is cheap enough that even the quadratic SemDeDup check stays
    O(minutes)). hybrid_topk swaps the query terms for their copy-0
    salted forms, matching the drive."""
    sqls = json.load(open(oracle_path))
    ok = True
    for g in EMB_GATES:
        con = duckdb.connect()
        con.execute("SET threads TO 32")
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{EMB}'")
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF1}'")
        sql = sqls[g]
        if g == "hybrid_topk":
            assert "['join', 'hash', 'window']" in sql
            sql = sql.replace("['join', 'hash', 'window']",
                              "['join_00', 'hash_00', 'window_00']")
        t0 = time.time()
        n_got, n_ora, m = compare(con, f"SELECT * FROM '{OUT}/{g}/*.parquet'", sql)
        print(f"{g}: rows={n_got} oracle={n_ora} "
              f"{'MATCH' if m else 'MISMATCH'} ({time.time() - t0:.0f}s)")
        ok &= m
        con.close()
    print("SF1 EMB SWEEP:", "ALL MATCH" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


CUST = "/root/repo/tmp/sf1/customer.parquet/*.parquet"
SCD2_GATES = ["scd2_history", "scd2_latest_pk", "scd2_strange_inline"]


def main_scd2(oracle_path):
    """SCD2 engine sweep (round-9 verdict item 6): the flagship CDC path on
    a 10x customer corpus (stride 100M keeps the +10M batch-2 inserts
    collision-free; see Sf1Drive.runScd2). Each gate's DuckDB oracle
    replays verbatim over the synthesized table."""
    sqls = json.load(open(oracle_path))
    ok = True
    for g in SCD2_GATES:
        con = duckdb.connect()
        con.execute("SET threads TO 32")
        con.execute(f"CREATE VIEW customer AS SELECT * FROM '{CUST}'")
        t0 = time.time()
        n_got, n_ora, m = compare(con, f"SELECT * FROM '{OUT}/{g}/*.parquet'", sqls[g])
        print(f"{g}: rows={n_got} oracle={n_ora} "
              f"{'MATCH' if m else 'MISMATCH'} ({time.time() - t0:.0f}s)")
        ok &= m
        con.close()
    print("SF1 SCD2 SWEEP:", "ALL MATCH" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


LINEITEM = "/root/repo/tmp/sf1/lineitem.parquet/*.parquet"


def main_dv(oracle_path):
    """Deletion-vector DELETE sweep (round 10): store_dv_delete's oracle
    replays over the 10x synthesized lineitem (see Sf1Drive.runDv).
    Round 16 adds agg_quantile_sketch over the same corpus (the sketch
    oracle replays the bucketing/rank rule verbatim)."""
    sqls = json.load(open(oracle_path))
    ok = True
    for g in ["store_dv_delete", "agg_quantile_sketch",
              "agg_quantile_sketch_incremental",
              # round-16b: HLL over the same corpus — the register/estimate
              # oracle replays verbatim (orderkeys disjoint across copies)
              "agg_hll_distinct", "agg_hll_incremental",
              # round-16b: Tukey fences on the sketch quantiles
              "agg_outlier_fences", "agg_quantile_transform"]:
        con = duckdb.connect()
        con.execute("SET threads TO 32")
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{LINEITEM}'")
        t0 = time.time()
        n_got, n_ora, m = compare(con, f"SELECT * FROM '{OUT}/{g}/*.parquet'",
                                  sqls[g])
        print(f"{g}: rows={n_got} oracle={n_ora} "
              f"{'MATCH' if m else 'MISMATCH'} ({time.time() - t0:.0f}s)")
        ok &= m
        con.close()
    print("SF1 DV SWEEP:", "ALL MATCH" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


def main_foreign(oracle_path):
    """Foreign-writer migration sweep (round 11): store_delta_writer's
    oracle (the full SCD2 history) replays over the 10x synthesized
    customer; the engine side ran full-load -> graft-log strip ->
    ForeignDeltaTable delta load -> pure-_delta_log read-back (see
    Sf1Drive.runForeign)."""
    sqls = json.load(open(oracle_path))
    g = "store_delta_writer"
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{CUST}'")
    t0 = time.time()
    n_got, n_ora, m = compare(con, f"SELECT * FROM '{OUT}/{g}/*.parquet'", sqls[g])
    print(f"{g}: rows={n_got} oracle={n_ora} "
          f"{'MATCH' if m else 'MISMATCH'} ({time.time() - t0:.0f}s)")
    con.close()
    print("SF1 FOREIGN SWEEP:", "ALL MATCH" if m else "FAILURES")
    sys.exit(0 if m else 1)


def main_streaming(oracle_path):
    """Streaming table-source sweep (round 11): the sink of the two
    AvailableNow drains (snapshot + capped incremental) must reassemble
    the 10x synthesized customer exactly (see Sf1Drive.runStreaming)."""
    g = "streaming_reassembly"
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{CUST}'")
    sql = "SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer"
    t0 = time.time()
    n_got, n_ora, m = compare(con, f"SELECT * FROM '{OUT}/{g}/*.parquet'", sql)
    print(f"{g}: rows={n_got} oracle={n_ora} "
          f"{'MATCH' if m else 'MISMATCH'} ({time.time() - t0:.0f}s)")
    con.close()
    print("SF1 STREAMING SWEEP:", "ALL MATCH" if m else "FAILURES")
    sys.exit(0 if m else 1)


def main_graph(oracle_path):
    """Round-11 operator sweep: PageRank over the 10x near-dup graph (the
    gate oracle verbatim — salting keeps pairs within copies, so the 10x
    graph is ten disjoint sf0.1 graphs) and BM25 with copy-salted query
    terms (the gate SQL with the term list swapped, like hybrid_topk's
    handling in main_emb)."""
    sqls = json.load(open(oracle_path))
    ok = True
    for g in ["graph_pagerank", "text_bm25_topk"]:
        con = duckdb.connect()
        con.execute("SET threads TO 32")
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF1}'")
        sql = sqls[g]
        if g == "text_bm25_topk":
            assert "('merge', 'window', 'spark')" in sql
            sql = sql.replace("('merge', 'window', 'spark')",
                              "('merge_00', 'window_33', 'spark_77')")
        t0 = time.time()
        n_got, n_ora, m = compare(con, f"SELECT * FROM '{OUT}/{g}/*.parquet'", sql)
        print(f"{g}: rows={n_got} oracle={n_ora} "
              f"{'MATCH' if m else 'MISMATCH'} ({time.time() - t0:.0f}s)")
        ok &= m
        con.close()
    print("SF1 GRAPH SWEEP:", "ALL MATCH" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


EV = "/root/repo/tmp/sf1/events.parquet/*.parquet"
EVENT_GATES = ["event_funnel", "event_funnel_incremental", "event_funnel_window",
               "event_funnel_rates",
               "event_rate_features", "streaming_funnel_ingest",
               "streaming_retention_ingest", "asof_join_forward",
               "event_retention_rates", "streaming_transitions_ingest",
               "event_retention", "event_retention_incremental",
               "event_transitions", "event_transitions_2step", "event_transition_rates",
               "event_transitions_incremental", "sessionize",
               # round-16: rolling activity (DAU/WAU/MAU + stickiness) —
               # oracles replay verbatim (counts over the 10x disjoint-user
               # view; buckets unchanged)
               "event_active_users", "event_active_users_incremental",
               "event_stickiness", "event_active_users_sketch",
               "streaming_active_users_ingest", "asof_join_nearest",
               "event_sessionize_incremental", "streaming_sessions_ingest",
               "streaming_quantiles_ingest",
               # round-16b: HLL actives/maintainer + gap-fill — oracles
               # replay verbatim (disjoint users per copy; registers and
               # per-user grids are copy-local)
               "event_active_users_hll", "streaming_hll_ingest",
               "timeseries_gapfill", "timeseries_interpolate",
               "event_cohort_ltv", "event_audience_overlap",
               "timeseries_gapfill_incremental", "timeseries_change_ratio",
               "event_audience_overlap_incremental",
               "event_attribution_linear", "agg_hll_cube",
               "streaming_gapfill_ingest",
               # round-16c: experiment lift — users are disjoint per copy,
               # so per-unit conversion rows and the salted-hash split
               # replay verbatim; the report re-aggregates over 10x units
               "event_experiment_lift",
               # round-16c: funnel latency percentiles — the chain and the
               # histogram-bucket arithmetic both replay verbatim over the
               # disjoint-user 10x events
               "event_funnel_latency",
               # round-16c: SRM check — per-copy users keep the same salted
               # split, the spec/threshold replay verbatim
               "event_experiment_srm",
               # round-16c: gaps-and-islands streaks — per-copy users,
               # buckets and islands replay verbatim
               "event_streaks",
               # round-16c: decayed counts — the recursive-CTE recurrence
               # replays verbatim over per-copy users
               "event_decayed_counts", "event_decayed_incremental",
               "streaming_decay_ingest",
               # round-16c: top paths — per-copy users keep windows
               # copy-local; the global top-15 re-aggregates identically
               "event_top_paths",
               # round-16c: HHI concentration — per-copy users, shares and
               # squares replay verbatim
               "event_concentration", "event_inequality",
               "event_retention_by_arm"]


def main_events(oracle_path):
    """Event-analytics sweep at 10x (round 15): every oracle replays
    VERBATIM over the synthesized events view — users are disjoint across
    copies and event_id -> id*10+cp is monotone, so per-key windows,
    funnel chains, and cohorts are copy-local with unchanged tie order
    (see Sf1Drive.runEvents). streaming_clean_ingest replays its batch
    filter over the 10x salted documents."""
    sqls = json.load(open(oracle_path))
    ok = True
    for g in EVENT_GATES + ["streaming_clean_ingest"]:
        con = duckdb.connect()
        con.execute("SET threads TO 32")
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{EV}'")
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF1}'")
        t0 = time.time()
        n_got, n_ora, m = compare(con, f"SELECT * FROM '{OUT}/{g}/*.parquet'",
                                  sqls[g])
        print(f"{g}: rows={n_got} oracle={n_ora} "
              f"{'MATCH' if m else 'MISMATCH'} ({time.time() - t0:.0f}s)")
        ok &= m
        con.close()
    print("SF1 EVENTS SWEEP:", "ALL MATCH" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


def main():
    args = [a for a in sys.argv[1:]
            if a not in ("emb", "scd2", "dv", "foreign", "graph", "streaming",
                         "events")]
    oracle_path = args[0] if args else "/tmp/verify-out/oracle_sql.json"
    if "events" in sys.argv[1:]:
        return main_events(oracle_path)
    if "emb" in sys.argv[1:]:
        return main_emb(oracle_path)
    if "scd2" in sys.argv[1:]:
        return main_scd2(oracle_path)
    if "dv" in sys.argv[1:]:
        return main_dv(oracle_path)
    if "foreign" in sys.argv[1:]:
        return main_foreign(oracle_path)
    if "graph" in sys.argv[1:]:
        return main_graph(oracle_path)
    if "streaming" in sys.argv[1:]:
        return main_streaming(oracle_path)
    sqls = json.load(open(oracle_path))
    ok = True
    for g in GATES + ["text_score_buckets"]:
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF1}'")
        t0 = time.time()
        if g == "text_score_buckets":
            sql = SCORE_BUCKETS_SF1_SQL
        else:
            sql = sqls[g]
        if g == "text_phrase_blocklist":
            for orig, salted in PHRASE_SALT.items():
                assert orig in sql, f"phrase literal '{orig}' missing from oracle"
                sql = sql.replace(orig, salted)
        n_got, n_ora, m = compare(con, f"SELECT * FROM '{OUT}/{g}/*.parquet'", sql)
        print(f"{g}: rows={n_got} oracle={n_ora} "
              f"{'MATCH' if m else 'MISMATCH'} ({time.time() - t0:.0f}s)")
        ok &= m
        con.close()

    # tfidf cosine: per-copy oracles (the editdist pattern — shingles are
    # copy-local by the salt construction, so candidates never cross
    # copies and the per-copy union IS the truth), with the GLOBAL doc
    # count substituted for the idf N: the operator weighted against the
    # full 50k corpus, so each per-copy replay must too
    con = duckdb.connect()
    t0 = time.time()
    total = con.execute(f"SELECT count(*) FROM '{SF1}'").fetchone()[0]
    cross = con.execute(
        f"SELECT count(*) FROM '{OUT}/dedup_tfidf_cosine/*.parquet' "
        "WHERE id_a // 10000000 != id_b // 10000000"
    ).fetchone()[0]
    okt = cross == 0
    print(f"dedup_tfidf_cosine cross-copy pairs (must be 0): {cross}")
    tsql = sqls["dedup_tfidf_cosine"]
    nd_sub = "(SELECT count(*) AS nd FROM documents)"
    assert nd_sub in tsql, "tfidf oracle shape changed: nd CTE not found"
    tsql = tsql.replace(nd_sub, f"(SELECT {total} AS nd)")
    for j in range(10):
        con.execute(
            "CREATE OR REPLACE VIEW documents AS "
            f"SELECT * FROM '{SF1}' WHERE doc_id // 10000000 = {j}"
        )
        got = (f"SELECT * FROM '{OUT}/dedup_tfidf_cosine/*.parquet' "
               f"WHERE id_a // 10000000 = {j}")
        n_got, n_ora, m = compare(con, got, tsql)
        print(f"  copy {j}: rows={n_got} oracle={n_ora} {'MATCH' if m else 'MISMATCH'}")
        okt &= m
    print(f"dedup_tfidf_cosine total: {'MATCH' if okt else 'MISMATCH'} "
          f"({time.time() - t0:.0f}s)")
    ok &= okt
    con.close()

    # editdist: per-copy oracles; cross-copy pairs impossible by construction
    con = duckdb.connect()
    t0 = time.time()
    cross = con.execute(
        f"SELECT count(*) FROM '{OUT}/dedup_editdist/*.parquet' "
        "WHERE id_a // 10000000 != id_b // 10000000"
    ).fetchone()[0]
    okc = cross == 0
    print(f"dedup_editdist cross-copy pairs (must be 0): {cross}")
    for j in range(10):
        con.execute(
            "CREATE OR REPLACE VIEW documents AS "
            f"SELECT * FROM '{SF1}' WHERE doc_id // 10000000 = {j}"
        )
        got = (f"SELECT * FROM '{OUT}/dedup_editdist/*.parquet' "
               f"WHERE id_a // 10000000 = {j}")
        n_got, n_ora, m = compare(con, got, sqls["dedup_editdist"])
        print(f"  copy {j}: rows={n_got} oracle={n_ora} {'MATCH' if m else 'MISMATCH'}")
        okc &= m
    print(f"dedup_editdist total: {'MATCH' if okc else 'MISMATCH'} "
          f"({time.time() - t0:.0f}s)")
    ok &= okc

    # round-16: editdist INCREMENTAL — same per-copy protocol (batch ids
    # stay inside their copy's 10M block: +1e6 < 1e7, and cross-copy
    # distance > maxDist by the salt construction)
    t0 = time.time()
    cross = con.execute(
        f"SELECT count(*) FROM '{OUT}/dedup_editdist_incremental/*.parquet' "
        "WHERE id_a // 10000000 != id_b // 10000000"
    ).fetchone()[0]
    oki = cross == 0
    print(f"dedup_editdist_incremental cross-copy pairs (must be 0): {cross}")
    for j in range(10):
        con.execute(
            "CREATE OR REPLACE VIEW documents AS "
            f"SELECT * FROM '{SF1}' WHERE doc_id // 10000000 = {j}"
        )
        got = (f"SELECT * FROM '{OUT}/dedup_editdist_incremental/*.parquet' "
               f"WHERE id_a // 10000000 = {j}")
        n_got, n_ora, m = compare(con, got, sqls["dedup_editdist_incremental"])
        print(f"  copy {j}: rows={n_got} oracle={n_ora} {'MATCH' if m else 'MISMATCH'}")
        oki &= m
    print(f"dedup_editdist_incremental total: {'MATCH' if oki else 'MISMATCH'} "
          f"({time.time() - t0:.0f}s)")
    ok &= oki
    print("SF1 SWEEP:", "ALL MATCH" if ok else "FAILURES")
    sys.exit(0 if ok else 1)


main()
