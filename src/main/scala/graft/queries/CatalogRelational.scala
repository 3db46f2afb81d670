package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Graph, Similarity, TextCorpus}

import Catalog.Q
import GateSupport._

/** Relational / projection / join / window / aggregation gates (SURVEY.md §2 P/J/U/W/O families + TPC-H-style checks).
  *
  * Split from the monolithic Catalog (round 16) — same `Q` registrations,
  * re-aggregated by [[Catalog.all]]; shared fixture readers and oracle
  * fragments live in [[GateSupport]]. */
private[queries] object CatalogRelational {
  val gates: Seq[Q] = Seq(
    Q("q1_agg",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("price_cents"),
          count(lit(1)).as("cnt"))
        .select("l_returnflag", "l_linestatus", "sum_qty", "price_cents", "cnt"),
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents,
        count(*) AS cnt
        FROM lineitem GROUP BY 1, 2""")),

    Q("q3_top_orders",
      (s, d) => {
        val rev = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
        t(s, d, "lineitem")
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")),
            col("o_custkey") === col("c_custkey"))
          .groupBy("o_orderkey")
          .agg(sum(rev).as("revenue_u"))
          .orderBy(col("revenue_u").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, CAST(sum(
          CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))
        ) AS BIGINT) AS revenue_u
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey ORDER BY revenue_u DESC, o_orderkey LIMIT 10""")),

    Q("p1_projection",
      (s, d) => t(s, d, "customer").select(
        col("c_custkey"),
        upper(trim(col("c_name"))).as("name_u"),
        col("c_nationkey").cast("long").as("nk"),
        cents(col("c_acctbal")).as("acctbal_cents"),
        col("c_mktsegment")),
      Some("""SELECT c_custkey, upper(trim(c_name)) AS name_u,
        CAST(c_nationkey AS BIGINT) AS nk,
        CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents, c_mktsegment
        FROM customer""")),

    // P1 + ingest value caps (reference odbc_reader.py:235,273-275): the
    // projection layer trims then truncates string payloads at maxTextSize
    Q("p1_value_caps",
      (s, d) => graft.scd2.Projection.select(
        t(s, d, "documents"),
        Seq(ColInfo("doc_id", org.apache.spark.sql.types.LongType),
          ColInfo("text", org.apache.spark.sql.types.StringType)),
        WriteConfig(maxTextSize = Some(40))),
      Some("SELECT doc_id, left(trim(text), 40) AS text FROM documents")),

    Q("p3_watermark",
      (s, d) => {
        val thr = t(s, d, "events").agg(max("event_id")).head().getLong(0) * 4 / 5
        t(s, d, "events").filter(col("event_id") > thr)
          .select("event_id", "user_id", "event_type")
      },
      Some("""SELECT event_id, user_id, event_type FROM events
        WHERE event_id > (SELECT (max(event_id)*4)//5 FROM events)""")),

    Q("p8_snapshot_filter",
      (s, d) => {
        val o = t(s, d, "orders")
        o.join(broadcast(o.agg(max("o_orderdate").as("mx"))),
            col("o_orderdate") === col("mx"))
          .select("o_orderkey", "o_custkey", "o_orderdate")
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderdate FROM orders
        WHERE o_orderdate = (SELECT max(o_orderdate) FROM orders)""")),

    // customers without a RECENT order (unfiltered, every customer has
    // orders at sf≥0.01 → empty result = no coverage)
    Q("j1_anti_join",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderdate") >= lit("2001-01-01")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey"),
      Some("""SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')""")),

    Q("j2_semi_join",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderdate") >= lit("2001-01-01")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey"),
      Some("""SELECT c_custkey FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')""")),

    Q("u1_union",
      (s, d) => t(s, d, "nation").select(col("n_nationkey").as("k"), lit("n").as("src"))
        .unionByName(t(s, d, "region").select(col("r_regionkey").as("k"), lit("r").as("src"))),
      Some("""SELECT n_nationkey AS k, 'n' AS src FROM nation
        UNION ALL SELECT r_regionkey, 'r' FROM region""")),

    Q("u2_except",
      (s, d) => t(s, d, "customer").select(col("c_custkey").as("key"))
        .except(t(s, d, "orders").filter(col("o_orderdate") >= lit("2001-01-01"))
          .select(col("o_custkey").as("key"))),
      Some("""SELECT c_custkey AS key FROM customer
        EXCEPT SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'""")),

    Q("w1_latest_per_key",
      (s, d) => {
        // ts is BIGINT nanos on the Spark side but micro-truncated in the
        // DuckDB read — order on the shared microsecond precision
        val w = Window.partitionBy("user_id")
          .orderBy(expr("ts div 1000").desc, col("event_id").desc)
        t(s, d, "events").withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_id", "event_type")
      },
      Some("""SELECT user_id, event_id, event_type FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""")),

    Q("w2_topn_per_group",
      (s, d) => {
        val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey"))
        t(s, d, "part").withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("p_brand", "p_partkey", "rn")
      },
      Some("""SELECT p_brand, p_partkey, CAST(row_number() OVER
          (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rn
        FROM part
        QUALIFY rn <= 3""")),

    // the same top-3-per-brand as w2_topn_per_group, but via the bounded-
    // heap TypedImperativeAggregate instead of a sort-based window: O(k)
    // state per group + map-side combine — no full per-group sort at
    // 100 TB. Same oracle ⇒ the two formulations must agree exactly.
    Q("w2_topn_agg",
      (s, d) => t(s, d, "part")
        .groupBy("p_brand")
        .agg(graft.functions.NativeAgg.topKPairs(
          (col("p_retailprice") * 100).cast("long"), col("p_partkey"), 3).as("tk"))
        .select(col("p_brand"), posexplode(col("tk")))
        .select(col("p_brand"), col("col.p").as("p_partkey"),
          (col("pos") + 1).cast("long").as("rn")),
      Some("""SELECT p_brand, p_partkey, CAST(row_number() OVER
          (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rn
        FROM part
        QUALIFY rn <= 3""")),

    // 4-way dim join with two broadcasts (supplier→nation→region star arm)
    Q("q5_multi_join",
      (s, d) => t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("suppliers"),
          sum(cents(col("s_acctbal"))).as("acctbal_cents"))
        .select("r_name", "n_name", "suppliers", "acctbal_cents"),
      Some("""SELECT r_name, n_name, count(*) AS suppliers,
          CAST(sum(CAST(round(s_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name""")),

    // query-side VARIANT: semi-structured props parsed with Spark 4's
    // try_parse_json into VariantType, a typed path extracted with
    // variant_get, aggregated per event_type — the analytics complement of
    // the store-side VARIANT interop (read/write/shredded-read). Oracle
    // extracts the same path with DuckDB's json machinery
    Q("events_variant_extract",
      (s, d) => t(s, d, "events")
        .select(col("event_type"),
          expr("variant_get(try_parse_json(props), '$.k', 'bigint')").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k")),
      Some("""WITH e AS (SELECT event_type,
          CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(k) AS BIGINT) AS sum_k,
          CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k
        FROM e GROUP BY event_type""")),

    // ROLLUP grouping sets (subtotals + grand total; NULL grouping rows)
    Q("agg_rollup",
      (s, d) => t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity").cast("long")).as("sum_qty"))
        .select("l_returnflag", "l_linestatus", "cnt", "sum_qty"),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    // CUBE grouping sets (all 4 combinations incl. grand total) — completes
    // the grouping-set family next to ROLLUP
    Q("agg_cube",
      (s, d) => t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"), sum(cents(col("o_totalprice"))).as("price_cents"))
        .select("o_orderstatus", "o_orderpriority", "cnt", "price_cents"),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS price_cents
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    // running-frame window (ROWS UNBOUNDED PRECEDING — the frame-spec case
    // the reference never needs but an analytics engine must support)
    Q("w3_running_sum",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          sum(cents(col("o_totalprice"))).over(w).as("running_cents"))
      },
      Some("""SELECT o_orderkey, o_custkey,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
        FROM orders""")),

    // RANGE-frame window (value-based frame, not row-based): per-customer
    // sum of orders within the preceding 30 DAYS of each order — integer
    // day epochs keep the frame arithmetic engine-exact
    Q("w4_range_frame",
      (s, d) => {
        val days = datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
        val w = Window.partitionBy("o_custkey").orderBy(days)
          .rangeBetween(-30L, 0L)
        t(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          sum(cents(col("o_totalprice"))).over(w).as("trailing_30d_cents"))
      },
      Some("""SELECT o_orderkey, o_custkey,
          CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
            PARTITION BY o_custkey
            ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
            RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT)
          AS trailing_30d_cents
        FROM orders""")),

    // lead/lag/ntile — the remaining ranking-window family members: per
    // customer order history with previous/next order value and a
    // per-customer quartile. ntile is PARTITIONED like everything else in
    // the catalog — an unpartitioned ntile would funnel the whole table
    // through one task, the single-partition-window trap
    Q("w5_lead_lag_ntile",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        t(s, d, "orders").select(
          col("o_orderkey"), col("o_custkey"),
          lag(cents(col("o_totalprice")), 1).over(w).as("prev_cents"),
          lead(cents(col("o_totalprice")), 1).over(w).as("next_cents"),
          ntile(4).over(w).as("key_quartile"))
      },
      Some("""SELECT o_orderkey, o_custkey,
          lag(CAST(round(o_totalprice*100) AS BIGINT), 1) OVER
            (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_cents,
          lead(CAST(round(o_totalprice*100) AS BIGINT), 1) OVER
            (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_cents,
          CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS INT)
            AS key_quartile
        FROM orders""")),

    // exact interpolated percentiles (median + p95) per group — Spark's
    // `percentile` and DuckDB's `quantile_cont` both interpolate at
    // pos = p·(n−1) over the sorted values; on integer cent inputs the
    // double arithmetic is identical on both sides, so the gate can
    // hash-compare the raw doubles
    Q("agg_percentile",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(CAST(round(l_quantity*100) AS BIGINT), 0.5)").as("median_qty_cents"),
          expr("percentile(CAST(round(l_extendedprice*100) AS BIGINT), 0.95)").as("p95_price_cents"),
          count(lit(1)).as("cnt")),
      Some("""SELECT l_returnflag,
          quantile_cont(CAST(round(l_quantity*100) AS BIGINT), 0.5) AS median_qty_cents,
          quantile_cont(CAST(round(l_extendedprice*100) AS BIGINT), 0.95) AS p95_price_cents,
          count(*) AS cnt
        FROM lineitem GROUP BY 1""")),

    // MERGEABLE quantile sketch (the DDSketch/HDR shape in pure integer
    // arithmetic): binary-mantissa buckets, rank-covering upper edge —
    // deterministic and integer-exact unlike percentile_approx's
    // merge-order-dependent GK, and no per-group sort unlike exact
    // percentile; the oracle replays the whole sketch (bucketing via
    // length(bin(v)) — identical in both engines — cumulative rank rule,
    // upper-edge estimate) bit-for-bit
    Q("agg_quantile_sketch",
      (s, d) => graft.operators.Sketches.quantileSketch(
        t(s, d, "lineitem").select(col("l_returnflag"),
          expr("CAST(round(l_extendedprice*100) AS BIGINT)").as("price_cents")),
        "l_returnflag", "price_cents", qsPermille = Seq(500, 950, 990),
        mantissaBits = 6),
      Some("""WITH v AS (SELECT l_returnflag AS g,
            CAST(round(l_extendedprice*100) AS BIGINT) AS val FROM lineitem),
        b AS (SELECT g, greatest(length(bin(val)) - 1 - 6, 0) AS shift,
            val >> greatest(length(bin(val)) - 1 - 6, 0) AS bid, count(*) AS cnt
          FROM v GROUP BY 1, 2, 3),
        e AS (SELECT g, cnt, (bid << shift) AS lo,
            (((bid + 1) << shift) - 1) AS hi FROM b),
        c AS (SELECT g, hi, sum(cnt) OVER (PARTITION BY g ORDER BY lo) AS cum,
            sum(cnt) OVER (PARTITION BY g) AS tot FROM e)
        SELECT g AS l_returnflag, CAST(q.q AS BIGINT) AS q_permille,
          CAST(min(CASE WHEN cum * 1000 >= q.q * tot THEN hi END) AS BIGINT) AS est
        FROM c, (VALUES (500), (950), (990)) AS q(q) GROUP BY 1, 2""")),

    // WINSORIZE at sketch fences: every price clipped into its group's
    // [p1, p99] sketch-estimate range — the pre-training outlier clamp
    // with NO per-group sort (histogram pass + broadcast fences over a
    // second scan); the oracle replays fences and the clip row-for-row
    Q("agg_winsorize",
      (s, d) => graft.operators.Sketches.winsorize(
        t(s, d, "lineitem").select(col("l_returnflag"),
          expr("CAST(round(l_extendedprice*100) AS BIGINT)").as("price_cents")),
        "l_returnflag", "price_cents", loPermille = 10, hiPermille = 990,
        mantissaBits = 6)
        .select(col("l_returnflag"), col("price_cents"),
          col("price_cents_clipped")),
      Some("""WITH v AS (SELECT l_returnflag AS g,
            CAST(round(l_extendedprice*100) AS BIGINT) AS val FROM lineitem),
        b AS (SELECT g, greatest(length(bin(val)) - 1 - 6, 0) AS shift,
            val >> greatest(length(bin(val)) - 1 - 6, 0) AS bid, count(*) AS cnt
          FROM v GROUP BY 1, 2, 3),
        e AS (SELECT g, cnt, (bid << shift) AS lo,
            (((bid + 1) << shift) - 1) AS hi FROM b),
        c AS (SELECT g, hi, sum(cnt) OVER (PARTITION BY g ORDER BY lo) AS cum,
            sum(cnt) OVER (PARTITION BY g) AS tot FROM e),
        f AS (SELECT g,
            CAST(min(CASE WHEN cum * 1000 >= 10 * tot THEN hi END) AS BIGINT) AS flo,
            CAST(min(CASE WHEN cum * 1000 >= 990 * tot THEN hi END) AS BIGINT) AS fhi
          FROM c GROUP BY 1)
        SELECT v.g AS l_returnflag, v.val AS price_cents,
          least(greatest(v.val, f.flo), f.fhi) AS price_cents_clipped
        FROM v JOIN f ON f.g = v.g""")),

    // ROBUST MAD: median + median-absolute-deviation per group, both
    // from the mergeable quantile sketch (two passes, the median estimate
    // broadcast into the deviation projection) — the spread statistic a
    // single outlier cannot move, with no per-group sort; the oracle
    // replays BOTH bucket passes bit-for-bit
    Q("agg_robust_mad",
      (s, d) => graft.operators.Sketches.robustMad(
        t(s, d, "lineitem").select(col("l_returnflag"),
          expr("CAST(round(l_extendedprice*100) AS BIGINT)").as("price_cents")),
        "l_returnflag", "price_cents", mantissaBits = 6),
      Some("""WITH v AS (SELECT l_returnflag AS g,
            CAST(round(l_extendedprice*100) AS BIGINT) AS val FROM lineitem),
        b1 AS (SELECT g, greatest(length(bin(val)) - 1 - 6, 0) AS sh,
            val >> greatest(length(bin(val)) - 1 - 6, 0) AS bid, count(*) AS cnt
          FROM v GROUP BY 1, 2, 3),
        e1 AS (SELECT g, cnt, (bid << sh) AS lo,
            (((bid + 1) << sh) - 1) AS hi FROM b1),
        c1 AS (SELECT g, hi, sum(cnt) OVER (PARTITION BY g ORDER BY lo) AS cum,
            sum(cnt) OVER (PARTITION BY g) AS tot FROM e1),
        m1 AS (SELECT g, min(CASE WHEN cum * 1000 >= 500 * tot THEN hi END) AS med
          FROM c1 GROUP BY 1),
        dv AS (SELECT v.g, abs(v.val - m1.med) AS val
          FROM v JOIN m1 ON m1.g = v.g),
        b2 AS (SELECT g, greatest(length(bin(val)) - 1 - 6, 0) AS sh,
            val >> greatest(length(bin(val)) - 1 - 6, 0) AS bid, count(*) AS cnt
          FROM dv GROUP BY 1, 2, 3),
        e2 AS (SELECT g, cnt, (bid << sh) AS lo,
            (((bid + 1) << sh) - 1) AS hi FROM b2),
        c2 AS (SELECT g, hi, sum(cnt) OVER (PARTITION BY g ORDER BY lo) AS cum,
            sum(cnt) OVER (PARTITION BY g) AS tot FROM e2),
        m2 AS (SELECT g, min(CASE WHEN cum * 1000 >= 500 * tot THEN hi END) AS mad
          FROM c2 GROUP BY 1)
        SELECT m1.g AS l_returnflag, CAST(m1.med AS BIGINT) AS median_est,
          CAST(m2.mad AS BIGINT) AS mad_est
        FROM m1 JOIN m2 ON m2.g = m1.g""")),

    // MIN-MAX feature scaling: exact per-group [min, max] -> [0, 1000]
    // permille — one combinable stats pass + broadcast join-back (the
    // winsorize shape, exact instead of sketched)
    Q("agg_minmax_scale",
      (s, d) => graft.operators.Sketches.minMaxScale(
        t(s, d, "lineitem").select(col("l_returnflag"),
          expr("CAST(round(l_extendedprice*100) AS BIGINT)").as("price_cents")),
        "l_returnflag", "price_cents"),
      Some("""WITH v AS (SELECT l_returnflag AS g,
            CAST(round(l_extendedprice*100) AS BIGINT) AS val FROM lineitem),
        st AS (SELECT g, min(val) AS mn, max(val) AS mx FROM v GROUP BY 1)
        SELECT v.g AS l_returnflag, v.val AS price_cents,
          CASE WHEN st.mx = st.mn THEN 0
            ELSE ((v.val - st.mn) * 1000) // (st.mx - st.mn) END
            AS price_cents_permille
        FROM v JOIN st ON st.g = v.g""")),

    // INCREMENTAL quantile sketch: histogram state on even orderkeys
    // round-trips through parquet, the odd half folds in (counts add —
    // order-free, late data exact), the served quantiles must equal the
    // one-shot sketch over everything
    Q("agg_quantile_sketch_incremental",
      (s, d) => {
        val li = t(s, d, "lineitem").select(col("l_orderkey"),
          col("l_returnflag"),
          expr("CAST(round(l_extendedprice*100) AS BIGINT)").as("price_cents"))
        val S = graft.operators.Sketches
        val dir = java.nio.file.Files.createTempDirectory("graft-qs-state")
        S.quantileSketchHistogram(li.filter(col("l_orderkey") % 2 === 0),
            "l_returnflag", "price_cents", mantissaBits = 6)
          .write.mode("overwrite").parquet(dir.toString)
        val state = s.read.parquet(dir.toString)
        val folded = S.quantileSketchFold(state,
          S.quantileSketchHistogram(li.filter(col("l_orderkey") % 2 === 1),
            "l_returnflag", "price_cents", mantissaBits = 6))
        val out = S.quantileSketchOf(folded, Seq(500, 950, 990))
          .localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some("""WITH v AS (SELECT l_returnflag AS g,
            CAST(round(l_extendedprice*100) AS BIGINT) AS val FROM lineitem),
        b AS (SELECT g, greatest(length(bin(val)) - 1 - 6, 0) AS shift,
            val >> greatest(length(bin(val)) - 1 - 6, 0) AS bid, count(*) AS cnt
          FROM v GROUP BY 1, 2, 3),
        e AS (SELECT g, cnt, (bid << shift) AS lo,
            (((bid + 1) << shift) - 1) AS hi FROM b),
        c AS (SELECT g, hi, sum(cnt) OVER (PARTITION BY g ORDER BY lo) AS cum,
            sum(cnt) OVER (PARTITION BY g) AS tot FROM e)
        SELECT g AS l_returnflag, CAST(q.q AS BIGINT) AS q_permille,
          CAST(min(CASE WHEN cum * 1000 >= q.q * tot THEN hi END) AS BIGINT) AS est
        FROM c, (VALUES (500), (950), (990)) AS q(q) GROUP BY 1, 2""")),

    // HYPERLOGLOG distinct sketch: m = 2^p register maxima over the 60-bit
    // md5-prefix hash twin — fixed-size mergeable state (the complement to
    // the KMV text_distinct_sketch: HLL state is m bytes whatever the
    // cardinality and its fold is idempotent max), with the whole statistic
    // (zero registers, the 2^Q-rational inverse-power sum, the alpha-micro
    // integer estimate) replayed bit-for-bit by the oracle: register split
    // via shifts, rho via length(bin(rem)) — minimal binary rendering in
    // both engines — estimate in HUGEINT division with the SAME
    // single-sourced alpha constant
    Q("agg_hll_distinct",
      (s, d) => {
        val li = t(s, d, "lineitem").select(col("l_returnflag"),
          expr("CAST(conv(substr(md5(CAST(l_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT)")
            .as("h"))
        graft.operators.Sketches.hllSketch(li, "l_returnflag", "h",
          p = 6, hashBits = 60)
      },
      Some(s"""WITH e AS (SELECT l_returnflag AS g,
            CAST(list_sum(list_transform(range(1, 16),
              i -> CAST(strpos('0123456789abcdef',
                  substr(md5(CAST(l_orderkey AS VARCHAR)), i, 1)) - 1
                AS HUGEINT) << (4 * (15 - i)))) AS BIGINT) AS h
          FROM lineitem),
        r AS (SELECT g, h >> 54 AS reg,
            CASE WHEN (h & ((1::BIGINT << 54) - 1)) = 0 THEN 55
              ELSE 55 - length(bin(h & ((1::BIGINT << 54) - 1))) END AS rho
          FROM e),
        mx AS (SELECT g, reg, max(rho) AS rho FROM r GROUP BY 1, 2),
        st AS (SELECT g, count(*) AS nz,
            sum(1::HUGEINT << (55 - rho)) AS si FROM mx GROUP BY 1),
        tt AS (SELECT g, CAST(64 - nz AS BIGINT) AS zero_regs,
            si + (64 - nz)::HUGEINT * (1::HUGEINT << 55) AS siall FROM st)
        SELECT g AS l_returnflag, zero_regs, CAST(siall AS BIGINT) AS sum_inv,
          CAST((${graft.operators.Sketches.hllAlphaMicro(6)}::HUGEINT * 4096
              * (1::HUGEINT << 55)) // (siall * 1000000) AS BIGINT)
            AS est_distinct
        FROM tt""")),

    // INCREMENTAL HLL: nonzero registers persisted as relational
    // (group, reg, rho) rows, the odd half folded in TWICE — the fold is
    // an idempotent element-wise max, so the deliberate replay is exact by
    // construction (no txnApplied guard, unlike the count-additive
    // histogram fold) and the served estimate must equal the one-shot
    // sketch over everything
    Q("agg_hll_incremental",
      (s, d) => {
        val li = t(s, d, "lineitem").select(col("l_orderkey"),
          col("l_returnflag"),
          expr("CAST(conv(substr(md5(CAST(l_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT)")
            .as("h"))
        val S = graft.operators.Sketches
        val dir = java.nio.file.Files.createTempDirectory("graft-hll-state")
        S.hllRegisterState(li.filter(col("l_orderkey") % 2 === 0),
            "l_returnflag", "h", p = 6, hashBits = 60)
          .write.mode("overwrite").parquet(dir.toString)
        val state = s.read.parquet(dir.toString)
        val batch = S.hllRegisterState(li.filter(col("l_orderkey") % 2 === 1),
          "l_returnflag", "h", p = 6, hashBits = 60)
        val folded = S.hllFold(S.hllFold(state, batch), batch) // replay: max is idempotent
        val out = S.hllOf(folded, p = 6, hashBits = 60).localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some(s"""WITH e AS (SELECT l_returnflag AS g,
            CAST(list_sum(list_transform(range(1, 16),
              i -> CAST(strpos('0123456789abcdef',
                  substr(md5(CAST(l_orderkey AS VARCHAR)), i, 1)) - 1
                AS HUGEINT) << (4 * (15 - i)))) AS BIGINT) AS h
          FROM lineitem),
        r AS (SELECT g, h >> 54 AS reg,
            CASE WHEN (h & ((1::BIGINT << 54) - 1)) = 0 THEN 55
              ELSE 55 - length(bin(h & ((1::BIGINT << 54) - 1))) END AS rho
          FROM e),
        mx AS (SELECT g, reg, max(rho) AS rho FROM r GROUP BY 1, 2),
        st AS (SELECT g, count(*) AS nz,
            sum(1::HUGEINT << (55 - rho)) AS si FROM mx GROUP BY 1),
        tt AS (SELECT g, CAST(64 - nz AS BIGINT) AS zero_regs,
            si + (64 - nz)::HUGEINT * (1::HUGEINT << 55) AS siall FROM st)
        SELECT g AS l_returnflag, zero_regs, CAST(siall AS BIGINT) AS sum_inv,
          CAST((${graft.operators.Sketches.hllAlphaMicro(6)}::HUGEINT * 4096
              * (1::HUGEINT << 55)) // (siall * 1000000) AS BIGINT)
            AS est_distinct
        FROM tt""")),

    // QUANTILE TRANSFORM: per-row percentile features from the broadcast
    // sketch histogram — the 100 TB replacement for percent_rank()'s
    // per-group corpus sort, at 2^-6 rank resolution; the row recomputes
    // its covering bucket with the same bitlen arithmetic, so the oracle
    // replays every permille exactly
    Q("agg_quantile_transform",
      (s, d) => graft.operators.Sketches.quantileTransform(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
          col("l_returnflag"),
          expr("CAST(round(l_extendedprice*100) AS BIGINT)").as("price_cents")),
        "l_returnflag", "price_cents", mantissaBits = 6)
        .select(col("l_orderkey"), col("l_suppkey"), col("est_permille")),
      Some("""WITH v AS (SELECT l_orderkey, l_suppkey, l_returnflag AS g,
            CAST(round(l_extendedprice*100) AS BIGINT) AS val FROM lineitem),
        b AS (SELECT g, greatest(length(bin(val)) - 1 - 6, 0) AS shift,
            val >> greatest(length(bin(val)) - 1 - 6, 0) AS bid, count(*) AS cnt
          FROM v GROUP BY 1, 2, 3),
        e AS (SELECT g, cnt, (bid << shift) AS lo FROM b),
        c AS (SELECT g, lo, sum(cnt) OVER (PARTITION BY g ORDER BY lo) AS cum,
            sum(cnt) OVER (PARTITION BY g) AS tot FROM e)
        SELECT v.l_orderkey, v.l_suppkey,
          CAST((c.cum * 1000) // c.tot AS BIGINT) AS est_permille
        FROM v JOIN c ON v.g = c.g
          AND (val >> greatest(length(bin(val)) - 1 - 6, 0))
            << greatest(length(bin(val)) - 1 - 6, 0) = c.lo""")),

    // ROBUST OUTLIER FENCES (Tukey rule on sketch quantiles): per-group
    // quartile estimates from the mergeable histogram, integer fences
    // q_hi ± 1.5·IQR, and counts outside — no per-group sort, no floats;
    // the oracle replays sketch, fences, and counts bit-for-bit
    Q("agg_outlier_fences",
      (s, d) => graft.operators.Sketches.robustOutlierFences(
        t(s, d, "lineitem").select(col("l_returnflag"),
          expr("CAST(round(l_extendedprice*100) AS BIGINT)").as("price_cents")),
        "l_returnflag", "price_cents",
        lowPermille = 250, highPermille = 750, fencePermille = 1500L,
        mantissaBits = 6),
      Some("""WITH v AS (SELECT l_returnflag AS g,
            CAST(round(l_extendedprice*100) AS BIGINT) AS val FROM lineitem),
        b AS (SELECT g, greatest(length(bin(val)) - 1 - 6, 0) AS shift,
            val >> greatest(length(bin(val)) - 1 - 6, 0) AS bid, count(*) AS cnt
          FROM v GROUP BY 1, 2, 3),
        e AS (SELECT g, cnt, (bid << shift) AS lo,
            (((bid + 1) << shift) - 1) AS hi FROM b),
        c AS (SELECT g, hi, sum(cnt) OVER (PARTITION BY g ORDER BY lo) AS cum,
            sum(cnt) OVER (PARTITION BY g) AS tot FROM e),
        qq AS (SELECT g, CAST(q.q AS BIGINT) AS qp,
            CAST(min(CASE WHEN cum * 1000 >= q.q * tot THEN hi END) AS BIGINT) AS est
          FROM c, (VALUES (250), (750)) AS q(q) GROUP BY 1, 2),
        f AS (SELECT g, max(CASE WHEN qp = 250 THEN est END) AS q_low,
            max(CASE WHEN qp = 750 THEN est END) AS q_high FROM qq GROUP BY 1),
        f2 AS (SELECT g, q_low, q_high,
            q_low - (1500 * (q_high - q_low)) // 1000 AS fence_low,
            q_high + (1500 * (q_high - q_low)) // 1000 AS fence_high FROM f)
        SELECT v.g AS l_returnflag, q_low, q_high,
          CAST(fence_low AS BIGINT) AS fence_low,
          CAST(fence_high AS BIGINT) AS fence_high,
          CAST(sum(CASE WHEN val < fence_low THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
          CAST(sum(CASE WHEN val > fence_high THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
          count(*) AS n_rows
        FROM v JOIN f2 ON v.g = f2.g GROUP BY 1, 2, 3, 4, 5""")),

    // PIVOT: order counts per customer segment × order priority, the
    // wide-table reshaping step — oracle via conditional aggregation
    Q("agg_pivot",
      (s, d) => t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .select(col("c_mktsegment"),
          // a pivot cell with no rows is NULL in Spark but 0 under the
          // oracle's FILTER count — coalesce aligns the semantics
          coalesce(col("1-URGENT"), lit(0L)).cast("long").as("urgent"),
          coalesce(col("2-HIGH"), lit(0L)).cast("long").as("high"),
          coalesce(col("3-MEDIUM"), lit(0L)).cast("long").as("medium"),
          coalesce(col("4-NOT SPECIFIED"), lit(0L)).cast("long").as("notspec"),
          coalesce(col("5-LOW"), lit(0L)).cast("long").as("low")),
      Some("""SELECT c_mktsegment,
          CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT) AS urgent,
          CAST(count(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT) AS high,
          CAST(count(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT) AS medium,
          CAST(count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS notspec,
          CAST(count(*) FILTER (o_orderpriority = '5-LOW') AS BIGINT) AS low
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment""")),

    // MARKET-BASKET co-occurrence (association mining): part pairs bought
    // together in >= 2 orders, with integer-exact support and lift
    // (pair·N·1000 DIV (ca·cb), 1000 = independence) — duplicates
    // collapse in one combinable distinct, pairs come from a
    // basket-keyed self-equi-join (never cartesian; oversized baskets
    // refuse before the quadratic fan-out), item counts broadcast back
    Q("basket_cooccurrence",
      // packPairKeys: l_partkey is a catalog-bounded positive id (fits
      // unsigned int32 at any TPC-H scale factor in this harness); the
      // in-plan guard refuses loudly if that ever stops holding, and the
      // packed path's output is bit-identical (same oracle hash)
      (s, d) => graft.operators.Baskets.cooccurrence(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", minPairCount = 2L, packPairKeys = true),
      Some("""WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
          FROM lineitem),
        n AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS nb FROM bi),
        ic AS (SELECT i, CAST(count(*) AS BIGINT) AS ci FROM bi GROUP BY 1),
        p AS (SELECT a.i AS item_a, b.i AS item_b,
            CAST(count(*) AS BIGINT) AS pair_cnt
          FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
          GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT p.item_a, p.item_b, p.pair_cnt,
          ca.ci AS cnt_a, cb.ci AS cnt_b,
          p.pair_cnt * 1000 // n.nb AS support_permille,
          CAST((p.pair_cnt::HUGEINT * n.nb * 1000)
            // (ca.ci::HUGEINT * cb.ci) AS BIGINT) AS lift_permille
        FROM p JOIN ic ca ON ca.i = p.item_a
          JOIN ic cb ON cb.i = p.item_b, n""")),

    // SNAPSHOT RECONCILIATION (data-diff): the scenario mutations (%89
    // update, %83 insert, %97 delete) recovered as one full-outer-join
    // diff — per-key status + exactly which columns changed, null-safe;
    // unchanged keys (the overwhelming majority) are omitted
    Q("reconcile_diff",
      (s, d) => {
        val old = t(s, d, "customer").select(col("c_custkey"),
          trim(col("c_name")).as("name"), cents(col("c_acctbal")).as("bal"),
          trim(col("c_mktsegment")).as("seg"))
        val neu = old.filter(!(col("c_custkey") % 97 === 0))
          .withColumn("bal", when(col("c_custkey") % 89 === 0,
            col("bal") + 10000L).otherwise(col("bal")))
          .unionByName(old.filter(col("c_custkey") % 83 === 0)
            .withColumn("c_custkey", col("c_custkey") + 10000000L))
        graft.operators.Reconcile.diffSnapshots(old, neu,
          Seq("c_custkey"), Seq("name", "bal", "seg"))
      },
      Some("""WITH o AS (SELECT c_custkey AS k, trim(c_name) AS name,
            CAST(round(c_acctbal*100) AS BIGINT) AS bal,
            trim(c_mktsegment) AS seg FROM customer),
        n AS (SELECT k, name,
            CASE WHEN k % 89 = 0 THEN bal + 10000 ELSE bal END AS bal, seg
          FROM o WHERE k % 97 <> 0
          UNION ALL SELECT k + 10000000, name, bal, seg FROM o WHERE k % 83 = 0),
        j AS (SELECT o.k AS ok, n.k AS nk, o.bal AS obal, n.bal AS nbal,
            o.name AS oname, n.name AS nname, o.seg AS oseg, n.seg AS nseg
          FROM o FULL JOIN n ON o.k = n.k),
        di AS (SELECT coalesce(nk, ok) AS c_custkey,
            CASE WHEN ok IS NULL THEN 'inserted'
              WHEN nk IS NULL THEN 'deleted'
              WHEN (obal IS DISTINCT FROM nbal) OR (oname IS DISTINCT FROM nname)
                OR (oseg IS DISTINCT FROM nseg) THEN 'changed'
              ELSE 'unchanged' END AS status,
            list_sort(list_filter(
              [CASE WHEN obal IS DISTINCT FROM nbal THEN 'bal' END,
               CASE WHEN oname IS DISTINCT FROM nname THEN 'name' END,
               CASE WHEN oseg IS DISTINCT FROM nseg THEN 'seg' END],
              x -> x IS NOT NULL)) AS cc
          FROM j)
        SELECT c_custkey, status,
          CASE WHEN status = 'changed' THEN CAST(len(cc) AS BIGINT)
            ELSE 0 END AS n_changed_cols,
          CASE WHEN status = 'changed' THEN array_to_string(cc, ',')
            ELSE '' END AS changed_cols
        FROM di WHERE status <> 'unchanged'""")),

    // DATA-CONTRACT validation: five rules (not_null / min / max /
    // in_set / matches) compiled into conditional aggregates over ONE
    // scan — per-rule violation counts plus the MINIMUM violating value
    // as a deterministic sample; nulls violate only not_null (the
    // three-valued convention, so rules compose)
    Q("contract_violations",
      (s, d) => graft.operators.Profile.validate(t(s, d, "lineitem"), Seq(
        graft.operators.Profile.Rule("l_orderkey", "not_null"),
        graft.operators.Profile.Rule("l_partkey", "min", "100"),
        graft.operators.Profile.Rule("l_linenumber", "max", "3"),
        graft.operators.Profile.Rule("l_returnflag", "in_set", "A,N"),
        graft.operators.Profile.Rule("l_linestatus", "matches", "^O$"))),
      Some("""WITH s AS (SELECT
          CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v1,
          min(CASE WHEN l_orderkey IS NULL THEN l_orderkey::VARCHAR END) AS s1,
          CAST(sum(CASE WHEN l_partkey IS NOT NULL AND l_partkey < 100
            THEN 1 ELSE 0 END) AS BIGINT) AS v2,
          min(CASE WHEN l_partkey IS NOT NULL AND l_partkey < 100
            THEN l_partkey::VARCHAR END) AS s2,
          CAST(sum(CASE WHEN l_linenumber IS NOT NULL AND l_linenumber > 3
            THEN 1 ELSE 0 END) AS BIGINT) AS v3,
          min(CASE WHEN l_linenumber IS NOT NULL AND l_linenumber > 3
            THEN l_linenumber::VARCHAR END) AS s3,
          CAST(sum(CASE WHEN l_returnflag IS NOT NULL
            AND l_returnflag NOT IN ('A', 'N') THEN 1 ELSE 0 END) AS BIGINT) AS v4,
          min(CASE WHEN l_returnflag IS NOT NULL
            AND l_returnflag NOT IN ('A', 'N') THEN l_returnflag END) AS s4,
          CAST(sum(CASE WHEN l_linestatus IS NOT NULL
            AND NOT regexp_matches(l_linestatus, '^O$') THEN 1 ELSE 0 END)
            AS BIGINT) AS v5,
          min(CASE WHEN l_linestatus IS NOT NULL
            AND NOT regexp_matches(l_linestatus, '^O$') THEN l_linestatus END) AS s5
          FROM lineitem)
        SELECT 'l_orderkey' AS col_name, 'not_null' AS rule, '' AS param,
          v1 AS n_violations, s1 AS sample_violation FROM s
        UNION ALL SELECT 'l_partkey', 'min', '100', v2, s2 FROM s
        UNION ALL SELECT 'l_linenumber', 'max', '3', v3, s3 FROM s
        UNION ALL SELECT 'l_returnflag', 'in_set', 'A,N', v4, s4 FROM s
        UNION ALL SELECT 'l_linestatus', 'matches', '^O$', v5, s5 FROM s""")),

    // TPC-H Q5-shaped 6-way join (local supplier volume): revenue in
    // exact centi-cents (price cents x remaining-discount pct — no float
    // money), dims broadcast, the customer=supplier nation equi-predicate
    // riding the join — the Catalyst join-ordering exercise at oracle
    // fidelity
    Q("q5_local_volume",
      (s, d) => {
        val li = t(s, d, "lineitem").select(col("l_orderkey"),
          col("l_suppkey"),
          (cents(col("l_extendedprice")) *
            (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_cc"))
        val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
        val cust = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
        val supp = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
        val nat = t(s, d, "nation").select(col("n_nationkey"), col("n_name"),
          col("n_regionkey"))
        val reg = t(s, d, "region").select(col("r_regionkey"), col("r_name"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum(col("rev_cc")).as("revenue_cc"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT r_name, n_name,
          CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
            * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT)
            AS revenue_cc,
          count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2""")),

    // DATA-PROFILING census (the ANALYZE shape): per-column rows/nulls/
    // exact distincts/min/max in ONE pass — Spark plans the multi-column
    // distincts as one Expand + combinable partials; min/max rendered as
    // strings so heterogeneous columns share the report schema
    Q("profile_lineitem",
      (s, d) => graft.operators.Profile.columns(t(s, d, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_returnflag", "l_linestatus")),
      Some("""WITH s AS (SELECT count(*) AS n,
          count(l_orderkey) AS nn1, count(DISTINCT l_orderkey) AS nd1,
            min(l_orderkey)::VARCHAR AS mn1, max(l_orderkey)::VARCHAR AS mx1,
          count(l_partkey) AS nn2, count(DISTINCT l_partkey) AS nd2,
            min(l_partkey)::VARCHAR AS mn2, max(l_partkey)::VARCHAR AS mx2,
          count(l_suppkey) AS nn3, count(DISTINCT l_suppkey) AS nd3,
            min(l_suppkey)::VARCHAR AS mn3, max(l_suppkey)::VARCHAR AS mx3,
          count(l_linenumber) AS nn4, count(DISTINCT l_linenumber) AS nd4,
            min(l_linenumber)::VARCHAR AS mn4, max(l_linenumber)::VARCHAR AS mx4,
          count(l_returnflag) AS nn5, count(DISTINCT l_returnflag) AS nd5,
            min(l_returnflag)::VARCHAR AS mn5, max(l_returnflag)::VARCHAR AS mx5,
          count(l_linestatus) AS nn6, count(DISTINCT l_linestatus) AS nd6,
            min(l_linestatus)::VARCHAR AS mn6, max(l_linestatus)::VARCHAR AS mx6
          FROM lineitem)
        SELECT 'l_orderkey' AS col_name, CAST(n AS BIGINT) AS n_rows,
          CAST(n - nn1 AS BIGINT) AS n_nulls, CAST(nd1 AS BIGINT) AS n_distinct,
          mn1 AS min_value, mx1 AS max_value FROM s
        UNION ALL SELECT 'l_partkey', n, n - nn2, nd2, mn2, mx2 FROM s
        UNION ALL SELECT 'l_suppkey', n, n - nn3, nd3, mn3, mx3 FROM s
        UNION ALL SELECT 'l_linenumber', n, n - nn4, nd4, mn4, mx4 FROM s
        UNION ALL SELECT 'l_returnflag', n, n - nn5, nd5, mn5, mx5 FROM s
        UNION ALL SELECT 'l_linestatus', n, n - nn6, nd6, mn6, mx6 FROM s""")),

    // TRIANGLE census over the basket-affinity graph (edges = part pairs
    // bought together >= 2 times): per-node triangle counts via the
    // degree-orientation trick — each edge oriented from its (deg, id)-
    // smaller endpoint, so wedge generation is O(m^1.5) total and a hub's
    // quadratic wedge set lands on its spokes; the oracle replays the
    // orientation and the closure join exactly
    Q("graph_triangles",
      (s, d) => {
        val pairs = graft.operators.Baskets.cooccurrence(
          t(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey", minPairCount = 2L)
        graft.operators.Graph.triangles(pairs, "item_a", "item_b")
      },
      Some("""WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
          FROM lineitem),
        p AS (SELECT a.i AS item_a, b.i AS item_b
          FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
          GROUP BY 1, 2 HAVING count(*) >= 2),
        e AS (SELECT DISTINCT least(item_a, item_b) AS u,
            greatest(item_a, item_b) AS v FROM p WHERE item_a <> item_b),
        deg AS (SELECT id, count(*) AS dg FROM
          (SELECT u AS id FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
        o AS (SELECT CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND e.u < e.v)
              THEN e.u ELSE e.v END AS s,
            CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND e.u < e.v)
              THEN e.v ELSE e.u END AS d
          FROM e JOIN deg du ON du.id = e.u JOIN deg dv ON dv.id = e.v),
        od AS (SELECT o.s, o.d, deg.dg AS dd FROM o
          JOIN deg ON deg.id = o.d),
        tri AS (SELECT a.s AS x, a.d AS y, b.d AS z
          FROM od a JOIN od b ON a.s = b.s
            AND (a.dd < b.dd OR (a.dd = b.dd AND a.d < b.d))
          JOIN o c ON c.s = a.d AND c.d = b.d),
        verts AS (SELECT x AS id FROM tri
          UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
        SELECT id, CAST(count(*) AS BIGINT) AS tri_cnt
        FROM verts GROUP BY 1""")),

    // STREAMING basket maintenance — the eleventh maintainer (guarded
    // additive class): whole-basket micro-batches fold the three-relation
    // state under the pairs-last commit-order rule; the report served
    // from the persisted state must equal the one-shot mining (same
    // oracle as basket_cooccurrence)
    Q("streaming_baskets_ingest",
      (s, d) => {
        val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey"))
        val root = java.nio.file.Files.createTempDirectory("graft-sbk")
        val src = s"$root/src"
        li.filter(col("l_orderkey") % 2 === 0)
          .write.mode("append").parquet(src)
        val schema = s.read.parquet(src).schema
        graft.streaming.StreamingIngest.basketsIngest(s, src, schema,
          "l_orderkey", "l_partkey", 256,
          s"$root/pairs", s"$root/items", s"$root/totals", s"$root/ck")
        li.filter(col("l_orderkey") % 2 === 1)
          .write.mode("append").parquet(src)
        graft.streaming.StreamingIngest.basketsIngest(s, src, schema,
          "l_orderkey", "l_partkey", 256,
          s"$root/pairs", s"$root/items", s"$root/totals", s"$root/ck")
        val out = graft.operators.Baskets.cooccurrenceOf(
            new graft.store.VersionedTable(s, s"$root/pairs").read(),
            new graft.store.VersionedTable(s, s"$root/items").read(),
            new graft.store.VersionedTable(s, s"$root/totals").read(),
            minPairCount = 2L)
          .localCheckpoint(true)
        deleteDir(root.toFile)
        out
      },
      Some("""WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
          FROM lineitem),
        n AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS nb FROM bi),
        ic AS (SELECT i, CAST(count(*) AS BIGINT) AS ci FROM bi GROUP BY 1),
        p AS (SELECT a.i AS item_a, b.i AS item_b,
            CAST(count(*) AS BIGINT) AS pair_cnt
          FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
          GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT p.item_a, p.item_b, p.pair_cnt,
          ca.ci AS cnt_a, cb.ci AS cnt_b,
          p.pair_cnt * 1000 // n.nb AS support_permille,
          CAST((p.pair_cnt::HUGEINT * n.nb * 1000)
            // (ca.ci::HUGEINT * cb.ci) AS BIGINT) AS lift_permille
        FROM p JOIN ic ca ON ca.i = p.item_a
          JOIN ic cb ON cb.i = p.item_b, n""")),

    // INCREMENTAL basket co-occurrence: the even orders' (pairs, items,
    // totals) state round-trips through parquet, the odd orders fold in
    // (counts ADD per key — whole-basket batches by construction since
    // the split is on the basket key), and the report served from the
    // folded state must equal the one-shot mining over everything
    Q("basket_cooccurrence_incremental",
      (s, d) => {
        val B = graft.operators.Baskets
        val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey"))
        val (p0, i0, n0) = B.cooccurrenceState(
          li.filter(col("l_orderkey") % 2 === 0), "l_orderkey", "l_partkey")
        val root = java.nio.file.Files.createTempDirectory("graft-bsk-state")
        p0.write.parquet(s"$root/pairs")
        i0.write.parquet(s"$root/items")
        n0.write.parquet(s"$root/totals")
        val (pb, ib, nb) = B.cooccurrenceState(
          li.filter(col("l_orderkey") % 2 === 1), "l_orderkey", "l_partkey")
        val (p1, i1, n1) = B.cooccurrenceFold(
          s.read.parquet(s"$root/pairs"), s.read.parquet(s"$root/items"),
          s.read.parquet(s"$root/totals"), pb, ib, nb)
        val out = B.cooccurrenceOf(p1, i1, n1, minPairCount = 2L)
          .localCheckpoint(true)
        deleteDir(root.toFile)
        out
      },
      Some("""WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
          FROM lineitem),
        n AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS nb FROM bi),
        ic AS (SELECT i, CAST(count(*) AS BIGINT) AS ci FROM bi GROUP BY 1),
        p AS (SELECT a.i AS item_a, b.i AS item_b,
            CAST(count(*) AS BIGINT) AS pair_cnt
          FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
          GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT p.item_a, p.item_b, p.pair_cnt,
          ca.ci AS cnt_a, cb.ci AS cnt_b,
          p.pair_cnt * 1000 // n.nb AS support_permille,
          CAST((p.pair_cnt::HUGEINT * n.nb * 1000)
            // (ca.ci::HUGEINT * cb.ci) AS BIGINT) AS lift_permille
        FROM p JOIN ic ca ON ca.i = p.item_a
          JOIN ic cb ON cb.i = p.item_b, n""")))
}
