package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Graph, Similarity, TextCorpus}

import Catalog.Q
import GateSupport._

/** Versioned-store gates: skipping, optimize, Delta protocol interop (reader/writer, DVs, CDF, row ids, TVFs).
  *
  * Split from the monolithic Catalog (round 16) — same `Q` registrations,
  * re-aggregated by [[Catalog.all]]; shared fixture readers and oracle
  * fragments live in [[GateSupport]]. */
private[queries] object CatalogStore {
  val gates: Seq[Q] = Seq(
    Q("store_skipping",
      (s, d) => {
        val t = new graft.store.VersionedTable(s, Scenarios.skipDest(s, d))
        val q = Scenarios.orderkeyQuarter(s, d)
        t.readWhere(col("l_orderkey") > q && col("l_orderkey") <= 2 * q &&
            col("l_quantity") >= 25)
          .groupBy((col("l_suppkey") % 50).as("sgrp"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("l_quantity").cast("long")).as("qty"),
            sum(cents(col("l_extendedprice"))).as("price_cents"))
      },
      Some("""WITH b AS (SELECT max(l_orderkey)//4 AS q FROM lineitem)
        SELECT l_suppkey % 50 AS sgrp, count(*) AS cnt,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents
        FROM lineitem, b
        WHERE l_orderkey > q AND l_orderkey <= 2*q AND l_quantity >= 25
        GROUP BY 1""")),

    Q("store_optimize_zorder",
      (s, d) => {
        val t = new graft.store.VersionedTable(s, Scenarios.optimizeDest(s, d))
        t.readWhere(col("l_partkey") % 10 === 0 && col("l_orderkey") <= Scenarios.orderkeyQuarter(s, d))
          .groupBy((col("l_partkey") % 7).as("pgrp"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("l_orderkey")).as("keysum"),
            sum(cents(col("l_extendedprice"))).as("price_cents"))
      },
      Some("""WITH b AS (SELECT max(l_orderkey)//4 AS q FROM lineitem)
        SELECT l_partkey % 7 AS pgrp, count(*) AS cnt,
          CAST(sum(l_orderkey) AS BIGINT) AS keysum,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents
        FROM lineitem, b
        WHERE l_partkey % 10 = 0 AND l_orderkey <= q
        GROUP BY 1""")),

    // Change data feed over the SCD2 history: everything committed AFTER the
    // initial full load (versions 1..latest) = exactly the update/insert
    // rows plus delete tombstones of the delta batch — the incremental-
    // consumer view a downstream pipeline tails instead of diffing snapshots
    // External Delta-protocol reader: the scenario strips _graft_log from a
    // mirror-written table, so this read reconstructs the live file set
    // purely from the public _delta_log (checkpoint + JSON tail) — the
    // interop direction the reference gets from delta-rs/delta-spark
    Q("store_delta_reader",
      (s, d) => {
        val dest = Scenarios.deltaReadDest(s, d)
        graft.store.DeltaTable.read(s, dest)
          .groupBy((col("s_suppkey") % 10).as("grp"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("s_suppkey")).as("keysum"),
            sum(cents(col("s_acctbal"))).as("bal_cents"))
      },
      Some("""SELECT s_suppkey % 10 AS grp, count(*) AS cnt,
          CAST(sum(s_suppkey) AS BIGINT) AS keysum,
          CAST(sum(CAST(round((s_acctbal + CASE WHEN s_suppkey % 5 = 0 THEN 1000.0 ELSE 0 END)*100) AS BIGINT)) AS BIGINT) AS bal_cents
        FROM supplier GROUP BY 1""")),

    // External Delta WRITE: the full SCD2 delta load continued IN PLACE on
    // a foreign `_delta_log`-only destination (no _graft_log, no aux
    // tables — the shape a migrating odbc2deltalake deployment hands us);
    // the combined history is read back through the pure Delta log and
    // must equal the all-graft deltaDest history bit for bit
    Q("store_delta_writer",
      (s, d) => graft.store.DeltaTable
        .read(s, s"${Scenarios.foreignDeltaDest(s, d)}/delta")
        .drop(SystemCols.timestamp),
      Some(s"""SELECT $oc, CAST(1 AS BIGINT) AS ver,
          FALSE AS __is_deleted, TRUE AS __is_full_load FROM customer
        UNION ALL SELECT c_custkey, trim(c_name), c_acctbal + 100, trim(c_mktsegment),
          CAST(2 AS BIGINT), FALSE, FALSE
          FROM customer WHERE c_custkey % 89 = 0 AND c_custkey % 97 <> 0
        UNION ALL SELECT c_custkey + 10000000, trim(c_name), c_acctbal, trim(c_mktsegment),
          CAST(2 AS BIGINT), FALSE, FALSE FROM customer WHERE c_custkey % 83 = 0
        UNION ALL SELECT c_custkey, NULL, NULL, NULL, CAST(NULL AS BIGINT), TRUE, FALSE
          FROM customer WHERE c_custkey % 97 = 0""")),

    Q("store_cdf",
      (s, d) => {
        val tbl = new graft.store.VersionedTable(s, s"${Scenarios.deltaDest(s, d)}/delta")
        tbl.readChanges(1L, tbl.requireVersion)
          .drop(SystemCols.timestamp, graft.store.VersionedTable.VersionCol)
      },
      Some(cdfOracle)),

    // Row-level change feed of a CDF-enabled MERGE commit: updates surface
    // as update_preimage/update_postimage pairs, new keys as inserts — the
    // Delta table_changes contract for MERGE, exact (not the added-dir
    // approximation readChanges documents for rewrites)
    Q("store_cdf_merge",
      (s, d) => {
        val t = new graft.store.VersionedTable(s, Scenarios.cdfMergeDest(s, d))
        t.readChangeFeed(2L, 2L).drop(graft.store.VersionedTable.CommitTsCol)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal,
          'update_preimage' AS _change_type, CAST(2 AS BIGINT) AS __commit_version
          FROM customer WHERE c_custkey % 89 = 0
        UNION ALL SELECT c_custkey, c_name, c_acctbal + 100, 'update_postimage',
          CAST(2 AS BIGINT) FROM customer WHERE c_custkey % 89 = 0
        UNION ALL SELECT c_custkey + 10000000, c_name, c_acctbal, 'insert',
          CAST(2 AS BIGINT) FROM customer WHERE c_custkey % 83 = 0""")),

    // Writer-side deletion vectors (merge-on-read DELETE WHERE): two DV
    // deletes over a two-dir lineitem table — the surviving-row aggregate
    // must match DuckDB filtering the raw table with the same predicates
    // (rows marked in roaring bitmaps, never rewritten; the read path is
    // the codegen'd DvRowDeleted probe over _metadata.row_index)
    Q("store_dv_delete",
      (s, d) => {
        val t = new graft.store.VersionedTable(s, Scenarios.dvDeleteDest(s, d))
        t.read()
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("l_quantity").cast("long")).as("qty"),
            sum(cents(col("l_extendedprice"))).as("price_cents"),
            sum(col("l_orderkey")).as("key_sum"))
      },
      Some("""SELECT l_returnflag, count(*) AS cnt,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents,
          CAST(sum(l_orderkey) AS BIGINT) AS key_sum
        FROM lineitem
        WHERE NOT (l_quantity >= 45) AND NOT (l_suppkey % 7 = 0)
        GROUP BY l_returnflag""")),

    // Batch CDF read over a FOREIGN _delta_log (table_changes without a
    // Delta jar): v1 metadata commit contributes nothing, the v2 blind
    // append derives as inserts, the v3 DV delete is consumed from its
    // cdc actions ALONE — exact row-level deletes with _change_type and
    // __commit_version matching the SQL replay of the same mutations
    Q("store_cdf_foreign",
      (s, d) => {
        val dest = Scenarios.foreignCdfDest(s, d)
        graft.store.DeltaTable.readChanges(s, s"$dest/tbl", 1L, 3L)
          .drop(graft.store.VersionedTable.CommitTsCol)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal,
          'insert' AS _change_type, CAST(2 AS BIGINT) AS __commit_version
          FROM customer WHERE c_custkey % 2 = 1
        UNION ALL SELECT c_custkey, c_name, c_acctbal, 'delete', CAST(3 AS BIGINT)
          FROM customer WHERE c_custkey % 3 = 0""")),

    // Row tracking end-to-end (PROTOCOL.md Row Tracking): two deterministic
    // single-file appends to an rt-ACTIVE foreign table take fresh
    // baseRowId ranges (read back as _row_id = base + row_index, stamped
    // with each commit's _row_commit_version), then a DV delete — every
    // surviving row's id must be EXACTLY what the SQL row_number replay
    // assigns, proving ids are stable under merge-on-read deletes
    Q("store_row_ids",
      (s, d) => {
        val dest = Scenarios.rowTrackedDest(s, d)
        graft.store.DeltaTable.read(s, s"$dest/tbl", rowIds = true)
          .select(col("c_custkey"),
            col(graft.store.DeltaTable.RowIdCol),
            col(graft.store.DeltaTable.RowCommitVersionCol))
      },
      Some("""WITH evens AS (SELECT c_custkey,
            row_number() OVER (ORDER BY c_custkey) - 1 AS rid
          FROM customer WHERE c_custkey % 2 = 0),
        odds AS (SELECT c_custkey,
            (SELECT count(*) FROM evens) + row_number() OVER (ORDER BY c_custkey) - 1 AS rid
          FROM customer WHERE c_custkey % 2 = 1),
        ids AS (SELECT c_custkey, rid, CAST(1 AS BIGINT) AS ver FROM evens
          UNION ALL SELECT c_custkey, rid, CAST(2 AS BIGINT) FROM odds)
        SELECT c_custkey, CAST(rid AS BIGINT) AS _row_id,
          ver AS _row_commit_version
        FROM ids WHERE c_custkey % 5 <> 0""")),

    // MERGE on a FOREIGN _delta_log (one commit: matched keys DV'd in
    // place, source landed as fresh files) — the same %89/%83 batch as
    // store_dv_merge, so any external Delta reader of the upserted table
    // must equal the plain SQL merge
    Q("store_foreign_merge",
      (s, d) => {
        val dest = Scenarios.foreignMergeDest(s, d)
        graft.store.DeltaTable.read(s, s"$dest/tbl")
      },
      Some("""SELECT c_custkey, c_name,
          CASE WHEN c_custkey % 89 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS c_acctbal
        FROM customer
        UNION ALL
        SELECT c_custkey + 10000000 AS c_custkey, c_name, c_acctbal
        FROM customer WHERE c_custkey % 83 = 0""")),

    // RESTORE on a FOREIGN _delta_log: a DV delete + a DV update layered
    // on customer, then restore(0) — the external read must be EXACTLY
    // the original table (both mutations roll back as one forward commit)
    Q("store_foreign_restore",
      (s, d) => {
        val dest = Scenarios.foreignRestoreDest(s, d)
        graft.store.DeltaTable.read(s, s"$dest/tbl")
      },
      Some("SELECT c_custkey, c_name, c_acctbal FROM customer")),

    // Liquid-clustered OPTIMIZE FULL: four appends each spanning the full
    // acctbal range, then the rewrite re-clusters by the delta.clustering
    // domain's column (disjoint per-file spans asserted in-scenario) — the
    // external read must equal plain SQL over customer, proving the
    // clustered rewrite moved rows between files without changing any
    Q("store_foreign_cluster",
      (s, d) => {
        val dest = Scenarios.foreignClusterDest(s, d)
        graft.store.DeltaTable.read(s, s"$dest/tbl")
      },
      Some("SELECT c_custkey, c_name, c_acctbal FROM customer")),

    // SHALLOW CLONE: metadata-only copy via absolute-URI adds; the clone
    // takes a DV delete while the source stays untouched (asserted
    // in-scenario) — the mutated clone must equal the plain-SQL filter
    Q("store_foreign_clone",
      (s, d) => {
        val dest = Scenarios.foreignCloneDest(s, d)
        graft.store.DeltaTable.read(s, s"$dest/clone")
      },
      Some("SELECT c_custkey, c_name, c_acctbal FROM customer " +
        "WHERE c_custkey % 3 <> 0")),

    // Declared column contracts on the foreign writer: CHECK constraint
    // enforced in-plan (violating batch aborts untouched), generated
    // column computed on append and RECOMPUTED by updateWhere, NOT NULL
    // preserved — the final table must equal the plain-SQL projection
    Q("store_foreign_policy",
      (s, d) => {
        val dest = Scenarios.foreignPolicyDest(s, d)
        graft.store.DeltaTable.read(s, s"$dest/tbl")
      },
      Some("""SELECT c_custkey, c_name,
             |  CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1000
             |       ELSE c_acctbal END AS c_acctbal,
             |  c_custkey % 5 AS c_mod
             |FROM customer""".stripMargin)),

    // Deletion-vector-mode MERGE (merge-on-read upsert): matched rows DV'd
    // in place, source appended — the final snapshot must equal the plain
    // SQL merge of the same batch (updates %89 +100, inserts %83 shifted)
    Q("store_dv_merge",
      (s, d) => {
        val t = new graft.store.VersionedTable(s, Scenarios.dvMergeDest(s, d))
        t.read()
      },
      Some("""SELECT c_custkey, c_name,
          CASE WHEN c_custkey % 89 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS c_acctbal
        FROM customer
        UNION ALL
        SELECT c_custkey + 10000000 AS c_custkey, c_name, c_acctbal
        FROM customer WHERE c_custkey % 83 = 0""")),

    // The same DV'd destination resolved through its mirrored `_delta_log`
    // by the EXTERNAL Delta reader: add actions carry "p"-storage DV
    // descriptors and the (3,7) deletionVectors protocol feature — any
    // Delta client must see exactly the live rows the native read sees
    Q("store_dv_mirror",
      (s, d) => {
        val dest = Scenarios.dvDeleteDest(s, d)
        graft.store.DeltaTable.read(s, dest)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("l_quantity").cast("long")).as("qty"),
            sum(cents(col("l_extendedprice"))).as("price_cents"),
            sum(col("l_orderkey")).as("key_sum"))
      },
      Some("""SELECT l_returnflag, count(*) AS cnt,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents,
          CAST(sum(l_orderkey) AS BIGINT) AS key_sum
        FROM lineitem
        WHERE NOT (l_quantity >= 45) AND NOT (l_suppkey % 7 = 0)
        GROUP BY l_returnflag""")),

    // The SQL-only surface, gated end-to-end: the same snapshot + CDF
    // slices as store_skipping/store_cdf but phrased THROUGH spark.sql over
    // the graft_table/graft_changes TVFs — proving the TVF plans carry the
    // manifest-backed scan (pruning, pushdown) to hash-exact results
    Q("store_tvf_snapshot",
      (s, d) => {
        graft.GraftExtensions.register(s)
        val dest = Scenarios.skipDest(s, d)
        val q = Scenarios.orderkeyQuarter(s, d)
        s.sql(s"""SELECT l_suppkey % 50 AS sgrp, count(*) AS cnt,
            sum(CAST(l_quantity AS BIGINT)) AS qty,
            sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS price_cents
          FROM graft_table('$dest')
          WHERE l_orderkey > $q AND l_orderkey <= ${2 * q} AND l_quantity >= 25
          GROUP BY l_suppkey % 50""")
      },
      Some("""WITH b AS (SELECT max(l_orderkey)//4 AS q FROM lineitem)
        SELECT l_suppkey % 50 AS sgrp, count(*) AS cnt,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents
        FROM lineitem, b
        WHERE l_orderkey > q AND l_orderkey <= 2*q AND l_quantity >= 25
        GROUP BY 1""")),

    // The foreign-table SQL surface: the same change feed as
    // store_cdf_foreign but phrased THROUGH spark.sql over the
    // delta_changes TVF — proving the external reader + cdc plans carry to
    // SQL-only users hash-exactly
    Q("store_tvf_delta_changes",
      (s, d) => {
        graft.GraftExtensions.register(s)
        val dest = Scenarios.foreignCdfDest(s, d)
        s.sql(s"""SELECT c_custkey, c_name, c_acctbal, `_change_type`,
            `__commit_version`
          FROM delta_changes('$dest/tbl', 1, 3)""")
      },
      Some("""SELECT c_custkey, c_name, c_acctbal,
          'insert' AS _change_type, CAST(2 AS BIGINT) AS __commit_version
          FROM customer WHERE c_custkey % 2 = 1
        UNION ALL SELECT c_custkey, c_name, c_acctbal, 'delete', CAST(3 AS BIGINT)
          FROM customer WHERE c_custkey % 3 = 0""")),

    Q("store_tvf_changes",
      (s, d) => {
        graft.GraftExtensions.register(s)
        val dest = s"${Scenarios.deltaDest(s, d)}/delta"
        val latest = new graft.store.VersionedTable(s, dest).requireVersion
        s.sql(s"""SELECT c_custkey, c_name, c_acctbal, c_mktsegment, ver,
            __is_deleted, __is_full_load
          FROM graft_changes('$dest', 1, $latest)""")
      },
      Some(cdfOracle)))
}
