package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Graph, Similarity, TextCorpus}

import Catalog.Q
import GateSupport._

/** SCD2 engine end-to-end gates: load modes, drift, watermarks, restore, multi-table syncAll, state probes, composed pipelines.
  *
  * Split from the monolithic Catalog (round 16) — same `Q` registrations,
  * re-aggregated by [[Catalog.all]]; shared fixture readers and oracle
  * fragments live in [[GateSupport]]. */
private[queries] object CatalogScd2 {
  val gates: Seq[Q] = Seq(
    Q("a1_max_count",
      (s, d) => t(s, d, "events")
        .agg(max("event_id").as("delta_max"), count(lit(1)).as("cnt")),
      Some("SELECT max(event_id) AS delta_max, count(*) AS cnt FROM events")),

    Q("a5_minmax",
      (s, d) => t(s, d, "lineitem").agg(
        min("l_shipdate").as("min_ship"), max("l_shipdate").as("max_ship"),
        count(lit(1)).as("cnt")),
      Some("""SELECT min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
        count(*) AS cnt FROM lineitem""")),

    Q("scd2_history",
      (s, d) => Scenarios.history(s, Scenarios.deltaDest(s, d)),
      Some(s"""SELECT $oc, CAST(1 AS BIGINT) AS ver,
          FALSE AS __is_deleted, TRUE AS __is_full_load FROM customer
        UNION ALL SELECT c_custkey, trim(c_name), c_acctbal + 100, trim(c_mktsegment),
          CAST(2 AS BIGINT), FALSE, FALSE
          FROM customer WHERE c_custkey % 89 = 0 AND c_custkey % 97 <> 0
        UNION ALL SELECT c_custkey + 10000000, trim(c_name), c_acctbal, trim(c_mktsegment),
          CAST(2 AS BIGINT), FALSE, FALSE FROM customer WHERE c_custkey % 83 = 0
        UNION ALL SELECT c_custkey, NULL, NULL, NULL, CAST(NULL AS BIGINT), TRUE, FALSE
          FROM customer WHERE c_custkey % 97 = 0""")),

    // U2-d consistency auto-fix gated end-to-end (reference test_10):
    // latest_pk_version corrupted both ways (dropped delete-candidates +
    // a bogus pk), detected, auto-repaired from history, then the normal
    // batch-2 delta load — the history must hash-match the never-corrupted
    // oracle (an unrepaired snapshot would lose the % 97 tombstones and
    // emit a spurious one for the bogus pk)
    Q("scd2_consistency_fix",
      (s, d) => Scenarios.history(s, Scenarios.consistencyFixDest(s, d)),
      Some(s"""SELECT $oc, CAST(1 AS BIGINT) AS ver,
          FALSE AS __is_deleted, TRUE AS __is_full_load FROM customer
        UNION ALL SELECT c_custkey, trim(c_name), c_acctbal + 100, trim(c_mktsegment),
          CAST(2 AS BIGINT), FALSE, FALSE
          FROM customer WHERE c_custkey % 89 = 0 AND c_custkey % 97 <> 0
        UNION ALL SELECT c_custkey + 10000000, trim(c_name), c_acctbal, trim(c_mktsegment),
          CAST(2 AS BIGINT), FALSE, FALSE FROM customer WHERE c_custkey % 83 = 0
        UNION ALL SELECT c_custkey, NULL, NULL, NULL, CAST(NULL AS BIGINT), TRUE, FALSE
          FROM customer WHERE c_custkey % 97 = 0""")),

    // Two tables synced CONCURRENTLY through Graft.syncAll (parallelism 2):
    // each destination's history must be EXACTLY what a standalone batch
    // run produces — concurrency must not leak between table states
    Q("syncall_customer_history",
      (s, d) => Scenarios.history(s, s"${Scenarios.syncAllRoot(s, d)}/customer"),
      Some(s"""SELECT $oc, CAST(1 AS BIGINT) AS ver,
          FALSE AS __is_deleted, TRUE AS __is_full_load FROM customer
        UNION ALL SELECT c_custkey, trim(c_name), c_acctbal + 100, trim(c_mktsegment),
          CAST(2 AS BIGINT), FALSE, FALSE
          FROM customer WHERE c_custkey % 89 = 0 AND c_custkey % 97 <> 0
        UNION ALL SELECT c_custkey + 10000000, trim(c_name), c_acctbal, trim(c_mktsegment),
          CAST(2 AS BIGINT), FALSE, FALSE FROM customer WHERE c_custkey % 83 = 0
        UNION ALL SELECT c_custkey, NULL, NULL, NULL, CAST(NULL AS BIGINT), TRUE, FALSE
          FROM customer WHERE c_custkey % 97 = 0""")),

    Q("syncall_supplier_history",
      (s, d) => Scenarios.history(s, s"${Scenarios.syncAllRoot(s, d)}/supplier"),
      Some("""SELECT s_suppkey, trim(s_name) AS s_name, s_acctbal,
          CAST(1 AS BIGINT) AS ver, FALSE AS __is_deleted, TRUE AS __is_full_load
          FROM supplier
        UNION ALL SELECT s_suppkey, trim(s_name), s_acctbal + 50,
          CAST(2 AS BIGINT), FALSE, FALSE
          FROM supplier WHERE s_suppkey % 13 = 0 AND s_suppkey % 19 <> 0
        UNION ALL SELECT s_suppkey + 1000000, trim(s_name), s_acctbal,
          CAST(2 AS BIGINT), FALSE, FALSE FROM supplier WHERE s_suppkey % 17 = 0
        UNION ALL SELECT s_suppkey, NULL, NULL, CAST(NULL AS BIGINT), TRUE, FALSE
          FROM supplier WHERE s_suppkey % 19 = 0""")),

    Q("scd2_latest_pk",
      (s, d) => Scenarios.latestPk(s, Scenarios.deltaDest(s, d)),
      Some("""SELECT c_custkey, CAST(1 AS BIGINT) AS ver FROM customer
          WHERE c_custkey % 97 <> 0 AND c_custkey % 89 <> 0
        UNION ALL SELECT c_custkey, CAST(2 AS BIGINT) FROM customer
          WHERE c_custkey % 89 = 0 AND c_custkey % 97 <> 0
        UNION ALL SELECT c_custkey + 10000000, CAST(2 AS BIGINT) FROM customer
          WHERE c_custkey % 83 = 0""")),

    Q("scd2_current_state",
      (s, d) => {
        val dest = Scenarios.deltaDest(s, d)
        val sync = new graft.scd2.Synchronizer(s,
          new graft.sources.DataFrameSource(Scenarios.batch2(s, d), Seq("c_custkey")),
          dest, WriteConfig(deltaCol = Some("ver")))
        sync.currentState()
          .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment", "ver")
      },
      Some("""SELECT c_custkey, trim(c_name) AS c_name,
          CASE WHEN c_custkey % 89 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS c_acctbal,
          trim(c_mktsegment) AS c_mktsegment,
          CAST(CASE WHEN c_custkey % 89 = 0 THEN 2 ELSE 1 END AS BIGINT) AS ver
          FROM customer WHERE c_custkey % 97 <> 0
        UNION ALL SELECT c_custkey + 10000000, trim(c_name), c_acctbal, trim(c_mktsegment),
          CAST(2 AS BIGINT) FROM customer WHERE c_custkey % 83 = 0""")),

    Q("scd2_strange_inline",
      (s, d) => Scenarios.history(s, Scenarios.strangeDest(s, d, inline = true)),
      Some(strangeOracle)),

    Q("scd2_strange_fallback",
      (s, d) => Scenarios.history(s, Scenarios.strangeDest(s, d, inline = false)),
      Some(strangeOracle)),

    Q("scd2_append_inserts",
      (s, d) => Scenarios.history(s, Scenarios.appendInsertsDest(s, d))
        .withColumn("ts_us", expr("ts div 1000")).drop("ts"),
      Some("""SELECT event_id, user_id, trim(event_type) AS event_type, value,
          trim(props) AS props, FALSE AS __is_deleted,
          (event_id <= (SELECT (max(event_id)*4)//5 FROM events)) AS __is_full_load,
          CAST(epoch_us(ts) AS BIGINT) AS ts_us
        FROM events""")),

    Q("scd2_simple_delta",
      (s, d) => Scenarios.history(s, Scenarios.simpleDeltaDest(s, d)),
      Some(s"""SELECT $oc, CAST(1 AS BIGINT) AS ver,
          FALSE AS __is_deleted, TRUE AS __is_full_load FROM customer
        UNION ALL SELECT c_custkey, trim(c_name), c_acctbal + 100, trim(c_mktsegment),
          CAST(2 AS BIGINT), FALSE, FALSE FROM customer WHERE c_custkey % 89 = 0
        UNION ALL SELECT c_custkey + 10000000, trim(c_name), c_acctbal, trim(c_mktsegment),
          CAST(2 AS BIGINT), FALSE, FALSE FROM customer WHERE c_custkey % 83 = 0""")),

    Q("scd2_schema_drift",
      (s, d) => Scenarios.history(s, Scenarios.schemaDriftDest(s, d)),
      Some(s"""SELECT $oc, CAST(1 AS BIGINT) AS ver, CAST(NULL AS BIGINT) AS extra,
          FALSE AS __is_deleted, TRUE AS __is_full_load FROM customer
        UNION ALL SELECT $oc, CAST(1 AS BIGINT), c_custkey * 2, FALSE, TRUE
          FROM customer""")),

    // P3 with a TIMESTAMP watermark (datetime delta column — the
    // reference's temporal-table / AS_ROW_START path, vs bigint rowversion)
    Q("scd2_ts_watermark",
      (s, d) => Scenarios.history(s, Scenarios.tsWatermarkDest(s, d)),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
          FALSE AS __is_deleted, TRUE AS __is_full_load
          FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'
        UNION ALL SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, FALSE, FALSE
          FROM orders WHERE o_orderdate > (SELECT max(o_orderdate) FROM orders
            WHERE o_orderdate < TIMESTAMP '2000-01-01')""")),

    // K5/drift: int → bigint widening mid-stream under SchemaDrift.Full —
    // first-load files must read back as BIGINT after the second load
    Q("scd2_type_widening",
      (s, d) => Scenarios.history(s, Scenarios.widenDest(s, d)),
      Some("""SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS val,
          CAST(1 AS BIGINT) AS ver, FALSE AS __is_deleted, TRUE AS __is_full_load
          FROM customer
        UNION ALL SELECT c_custkey, CAST(c_nationkey AS BIGINT) + 1000,
          CAST(2 AS BIGINT), FALSE, FALSE FROM customer WHERE c_custkey % 89 = 0""")),

    Q("scd2_full_twice",
      (s, d) => Scenarios.history(s, Scenarios.fullTwiceDest(s, d)),
      Some(s"""SELECT $oc, CAST(1 AS BIGINT) AS ver,
          FALSE AS __is_deleted, TRUE AS __is_full_load FROM customer
        UNION ALL SELECT $oc, CAST(1 AS BIGINT), FALSE, TRUE FROM customer""")),

    // W1 restore: latest_pk_version deleted, recomputed purely from history
    // (full-load snapshot ∪ window-deduped post-full changes ∖ deletes) —
    // must equal the incrementally-maintained snapshot
    Q("scd2_restore_pk",
      (s, d) => Scenarios.latestPk(s, Scenarios.restorePkDest(s, d)),
      Some("""SELECT c_custkey, CAST(1 AS BIGINT) AS ver FROM customer
          WHERE c_custkey % 97 <> 0 AND c_custkey % 89 <> 0
        UNION ALL SELECT c_custkey, CAST(2 AS BIGINT) FROM customer
          WHERE c_custkey % 89 = 0 AND c_custkey % 97 <> 0
        UNION ALL SELECT c_custkey + 10000000, CAST(2 AS BIGINT) FROM customer
          WHERE c_custkey % 83 = 0""")),

    // S5 time travel: the pk snapshot AS OF the version committed by the
    // full load, read after the delta load has superseded it
    Q("scd2_time_travel",
      (s, d) => {
        val dest = Scenarios.deltaDest(s, d)
        new graft.store.VersionedTable(s, s"$dest/delta_load/latest_pk_version").readVersion(0)
      },
      Some("SELECT c_custkey, CAST(1 AS BIGINT) AS ver FROM customer")),

    Q("scd2_query_source",
      (s, d) => Scenarios.history(s, Scenarios.querySourceDest(s, d)),
      Some(s"""SELECT $oc, CAST(1 AS BIGINT) AS ver,
          FALSE AS __is_deleted, TRUE AS __is_full_load
        FROM customer WHERE c_acctbal > 1000""")),

    // §2.9 streaming CDC gated end-to-end: the SAME two snapshots as
    // scd2_history, delivered as file drops through readStream →
    // foreachBatch → Synchronizer — the streaming history must hash-match
    // the batch oracle (and hence the batch engine, gate-vs-gate)
    Q("scd2_streaming_cdc",
      (s, d) => Scenarios.history(s, Scenarios.streamingCdcDest(s, d)),
      Some(s"""SELECT $oc, CAST(1 AS BIGINT) AS ver,
          FALSE AS __is_deleted, TRUE AS __is_full_load FROM customer
        UNION ALL SELECT c_custkey, trim(c_name), c_acctbal + 100, trim(c_mktsegment),
          CAST(2 AS BIGINT), FALSE, FALSE
          FROM customer WHERE c_custkey % 89 = 0 AND c_custkey % 97 <> 0
        UNION ALL SELECT c_custkey + 10000000, trim(c_name), c_acctbal, trim(c_mktsegment),
          CAST(2 AS BIGINT), FALSE, FALSE FROM customer WHERE c_custkey % 83 = 0
        UNION ALL SELECT c_custkey, NULL, NULL, NULL, CAST(NULL AS BIGINT), TRUE, FALSE
          FROM customer WHERE c_custkey % 97 = 0""")),

    // CAPSTONE: SCD2-ingested corpus (edits + deletions) → current state →
    // quality filter → exact dedup, composed end-to-end — the shape of a
    // pretraining dataset build, with the whole chain oracle-checked
    Q("pipeline_e2e",
      (s, d) => {
        val current = Scenarios.docsCurrent(s, d)
        val quality = current.filter(TextFunctions.qualityLabel(col("text")) === "ok")
        Dedup.exact(quality, "doc_id", "text")
      },
      Some(s"""WITH cur AS (
          SELECT doc_id,
            CASE WHEN doc_id % 7 = 0 THEN text || ' edited7' ELSE text END AS text
          FROM documents WHERE doc_id % 31 <> 0),
        q AS (SELECT doc_id, text FROM cur
          WHERE CAST(len($toksSql) AS BIGINT) >= 5 AND ($stopWordsSql) > 0)
        SELECT md5($normSql) AS fp, CAST(min(doc_id) AS BIGINT) AS keep_id,
          count(*) AS dupes
        FROM q GROUP BY 1""")),

    // END-TO-END INCREMENTAL INGEST: a synthetic "daily batch" (exact
    // copies of every 7th corpus doc, near-copies of every 11th with two
    // appended tokens, order-reversed every-13th as novel content) runs
    // the rolling-ingestion pipeline — exact dedup against the persisted
    // fingerprint set, near-dedup against the persisted minhash index,
    // then the quality filter — and the gate checks WHICH docs survive.
    // Copies die at the fingerprint stage, near-copies at the index stage
    // (J ≈ 0.9 to their source), reversed docs have disjoint 3-shingles
    // and survive to the quality cut. The oracle replays every stage from
    // first principles (md5 set, exact Jaccard truth, quality SQL).
    // FIXTURE-DEPENDENT RECALL: the oracle's near-copy stage is EXACT
    // Jaccard while the engine's is LSH (16 bands × 4 rows) — a J≈0.9
    // pair fails to band-collide with p ≈ 3e-8, so a REGENERATED documents
    // fixture could in principle flip one near-copy's verdict without any
    // code bug (dedup_minhash_incremental stays structural: its exact
    // copies band-collide by construction). If this gate ever mismatches
    // by exactly the near-copy rows after a fixture refresh, re-check
    // band collision before suspecting the operator.
    Q("pipeline_ingest_incremental",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val seen = Dedup.exact(corpus, "doc_id", "text").select("fp")
        val dir = java.nio.file.Files.createTempDirectory("graft-ing-idx")
        Dedup.minhashIndex(corpus, "doc_id", "text").write
          .mode("overwrite").parquet(dir.toString)
        val index = s.read.parquet(dir.toString)
        val batch = corpus.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
          .unionByName(corpus.filter(col("doc_id") % 11 === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"),
              concat(col("text"), lit(" tail7 tail8")).as("text")))
          .unionByName(corpus.filter(col("doc_id") % 13 === 0)
            .select((col("doc_id") + 3000000L).as("doc_id"),
              concat_ws(" ", reverse(split(col("text"), " "))).as("text")))
        val afterExact = Dedup.exactIncremental(batch, "doc_id", "text", seen)
        val nearIds = Dedup.minhashLshIncremental(afterExact, index,
            "doc_id", "text", threshold = 0.5)
          .select(col("id_b").as("doc_id")).distinct()
        // localCheckpoint so the temp index backing the plan can be deleted
        val out = afterExact.join(nearIds, Seq("doc_id"), "left_anti")
          .filter(TextFunctions.qualityLabel(col("text")) === "ok")
          .select("doc_id").localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some(s"""WITH batch AS (
          SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
          UNION ALL SELECT doc_id + 2000000, text || ' tail7 tail8'
            FROM documents WHERE doc_id % 11 = 0
          UNION ALL SELECT doc_id + 3000000,
            array_to_string(list_reverse(string_split(text, ' ')), ' ')
            FROM documents WHERE doc_id % 13 = 0),
        ex AS (SELECT doc_id, text FROM batch
          WHERE md5($normSql) NOT IN (SELECT md5($normSql) FROM documents)),
        bsets AS (SELECT doc_id, list_distinct(
            CASE WHEN len($toksSql) <= 3 THEN [array_to_string($toksSql, ' ')]
            ELSE list_transform(range(1, len($toksSql)-1),
              i -> array_to_string(($toksSql)[i:i+2], ' ')) END) AS sh FROM ex),
        csets AS (SELECT doc_id, list_distinct(
            CASE WHEN len($toksSql) <= 3 THEN [array_to_string($toksSql, ' ')]
            ELSE list_transform(range(1, len($toksSql)-1),
              i -> array_to_string(($toksSql)[i:i+2], ' ')) END) AS sh FROM documents),
        pb AS (SELECT doc_id, unnest(sh) AS s FROM bsets),
        pc AS (SELECT doc_id, unnest(sh) AS s FROM csets),
        sb AS (SELECT doc_id, len(sh) AS sz FROM bsets),
        sc AS (SELECT doc_id, len(sh) AS sz FROM csets),
        near AS (SELECT pb.doc_id FROM pb JOIN pc ON pb.s = pc.s
          JOIN sb ON sb.doc_id = pb.doc_id JOIN sc ON sc.doc_id = pc.doc_id
          GROUP BY pb.doc_id, pc.doc_id, sb.sz, sc.sz
          HAVING (count(*)*1000) // (sb.sz + sc.sz - count(*)) >= 500),
        kept AS (SELECT doc_id, text FROM ex WHERE doc_id NOT IN (SELECT doc_id FROM near))
        SELECT doc_id FROM kept
        WHERE CAST(len($toksSql) AS BIGINT) >= 5 AND ($stopWordsSql) > 0"""))
      ,

    // vector-corpus CDC: array<float> payloads through the whole SCD2
    // engine (projection, union, delete tombstones with NULL arrays);
    // oracle checks every scalar derivation incl. dim-of-NULL for deletes
    Q("scd2_vector_corpus",
      (s, d) => Scenarios.history(s, Scenarios.vectorCorpusDest(s, d))
        .select(col("vec_id"), col("label"),
          size(col("embedding")).cast("long").as("dim"),
          col("ver"), col(SystemCols.isDeleted), col(SystemCols.isFullLoad)),
      Some("""SELECT vec_id, label, CAST(len(embedding) AS BIGINT) AS dim,
          CAST(1 AS BIGINT) AS ver, FALSE AS __is_deleted, TRUE AS __is_full_load
          FROM embeddings
        UNION ALL SELECT vec_id, label + 100, CAST(len(embedding) AS BIGINT),
          CAST(2 AS BIGINT), FALSE, FALSE
          FROM embeddings WHERE vec_id % 13 = 0 AND vec_id % 19 <> 0
        UNION ALL SELECT vec_id + 100000, label, CAST(len(embedding) AS BIGINT),
          CAST(2 AS BIGINT), FALSE, FALSE FROM embeddings WHERE vec_id % 17 = 0
        UNION ALL SELECT vec_id, NULL, NULL, CAST(NULL AS BIGINT), TRUE, FALSE
          FROM embeddings WHERE vec_id % 19 = 0""")),

    // POINT-IN-TIME dimension join — the leak-free training-feature join
    // against an SCD2 version chain: each order joins the customer VERSION
    // current at its (deterministic business-time) timestamp; facts before
    // the key's creation AND facts after its tombstone read NULLs — the
    // tombstone row deliberately still CARRIES the pre-delete attributes,
    // so a hash match proves the operator nulls them rather than leaking.
    // Same version-chain semantics as the scd2_history scenario (%89
    // update, %97 delete) with staggered per-key effective times.
    Q("scd2_point_in_time",
      (s, d) => {
        val cust = t(s, d, "customer")
        val dim = cust.select(col("c_custkey").as("k"),
            (lit(1000L) + col("c_custkey") % 50).as("vts"),
            cents(col("c_acctbal")).as("bal_cents"),
            trim(col("c_mktsegment")).as("segment"),
            lit(false).as("del"), lit(1L).as("ver"))
          .unionByName(cust.filter(col("c_custkey") % 89 === 0)
            .select(col("c_custkey").as("k"),
              (lit(2000L) + col("c_custkey") % 50).as("vts"),
              (cents(col("c_acctbal")) + 10000L).as("bal_cents"),
              trim(col("c_mktsegment")).as("segment"),
              lit(false).as("del"), lit(2L).as("ver")))
          .unionByName(cust.filter(col("c_custkey") % 97 === 0)
            .select(col("c_custkey").as("k"),
              (lit(3000L) + col("c_custkey") % 50).as("vts"),
              cents(col("c_acctbal")).as("bal_cents"),
              trim(col("c_mktsegment")).as("segment"),
              lit(true).as("del"), lit(3L).as("ver")))
        val facts = t(s, d, "orders").select(col("o_orderkey"),
          col("o_custkey"), (lit(500L) + col("o_orderkey") % 3500).as("fact_ts"))
        graft.operators.Temporal.pointInTimeJoin(facts, dim,
          "o_custkey", "k", "fact_ts", "vts",
          Seq("bal_cents", "segment", "ver"), tieBreak = "ver",
          deletedCol = Some("del"))
      },
      Some("""WITH dim AS (
          SELECT c_custkey AS k, CAST(1000 + c_custkey % 50 AS BIGINT) AS vts,
            CAST(round(c_acctbal*100) AS BIGINT) AS bal, trim(c_mktsegment) AS seg,
            FALSE AS del, CAST(1 AS BIGINT) AS ver FROM customer
          UNION ALL SELECT c_custkey, CAST(2000 + c_custkey % 50 AS BIGINT),
            CAST(round(c_acctbal*100) AS BIGINT) + 10000, trim(c_mktsegment),
            FALSE, CAST(2 AS BIGINT) FROM customer WHERE c_custkey % 89 = 0
          UNION ALL SELECT c_custkey, CAST(3000 + c_custkey % 50 AS BIGINT),
            CAST(round(c_acctbal*100) AS BIGINT), trim(c_mktsegment),
            TRUE, CAST(3 AS BIGINT) FROM customer WHERE c_custkey % 97 = 0),
        f AS (SELECT o_orderkey, o_custkey,
            CAST(500 + o_orderkey % 3500 AS BIGINT) AS fact_ts FROM orders),
        m AS (SELECT f.o_orderkey, f.o_custkey, f.fact_ts,
            d.bal, d.seg, d.del, d.ver,
            row_number() OVER (PARTITION BY f.o_orderkey
              ORDER BY d.vts DESC, d.ver DESC) AS rn
          FROM f LEFT JOIN dim d ON d.k = f.o_custkey AND d.vts <= f.fact_ts)
        SELECT o_orderkey, o_custkey, fact_ts,
          CASE WHEN del THEN NULL ELSE bal END AS pit_bal_cents,
          CASE WHEN del THEN NULL ELSE seg END AS pit_segment,
          CASE WHEN del THEN NULL ELSE ver END AS pit_ver
        FROM m WHERE rn = 1""")))
}
