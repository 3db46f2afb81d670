package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Graph, Similarity, TextCorpus}

/** The driver-contract query catalog: every operator of SURVEY.md §2 plus
  * the training-data-pipeline operators, each as a deterministic DataFrame
  * program over `/root/testdata/sf*` with (where SQL-expressible) a DuckDB
  * oracle producing the identical result.
  *
  * Determinism rules (the driver hash-compares values after sorting):
  *  - integer outputs wherever arithmetic is involved (money as cents,
  *    ratios as x1000) — double SUMs are order-dependent, BIGINT sums exact;
  *  - per-row double arithmetic (no aggregation) is bit-deterministic and OK;
  *  - DuckDB `sum(BIGINT)` returns HUGEINT and `len()` BIGINT while Spark
  *    `size()` is INT — both sides cast to BIGINT explicitly;
  *  - float similarity values never appear in outputs, only ranks.
  */
/** Fixture readers shared by the catalog and the SCD2 scenarios. */
private[queries] object Fixtures {
  /** `events` with `ts` normalized to BIGINT epoch NANOSECONDS whatever the
    * fixture vintage. TIMESTAMP(NANOS) files surface `ts` as BIGINT nanos
    * directly (the `nanosAsLong` legacy read every session sets);
    * TIMESTAMP(MICROS) files — the 2026-08 regenerated fixtures — surface
    * TIMESTAMP/TIMESTAMP_NTZ, converted here via the UTC session and
    * rescaled (µs·1000 is exact in a long until 2262, same horizon as
    * nanos timestamps). Downstream code keeps its `ts div 1000` microsecond
    * truncation, which matches the DuckDB oracles' `epoch_us(ts)` on the
    * same file under EITHER vintage. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
      case _ =>
        raw.withColumn("ts", unix_micros(col("ts")) * 1000L)
    }
  }
}

object Catalog {

  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") Fixtures.events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  private def deleteDir(f: java.io.File): Unit = {
    // never recurse THROUGH a symlink: streaming gates symlink shared
    // fixtures into temp dirs this later removes — following a link into a
    // directory-format fixture would delete the fixture's real contents
    if (!java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles).foreach(_.foreach(deleteDir))
    f.delete(): Unit
  }

  /** cents(x) = CAST(round(x*100) AS BIGINT) — exact money arithmetic. */
  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  /** The dedup_containment gate's parameterization — a SINGLE source of
    * truth shared with the sf1 sweep (Sf1Drive re-runs the query with a
    * candidate-audit observation attached, which the `(SparkSession, dir)`
    * query signature cannot carry): both the Spark query below and its
    * DuckDB oracle interpolate these, so a parameter change here cannot
    * silently diverge the sweep from the oracle. */
  val ContainmentGateThreshold: Double = 0.8
  val ContainmentGateMinShingles: Int = 10

  /** The dedup_tfidf_cosine gate's parameterization — same single-source
    * rule as the ContainmentGate* constants: the Spark query, its DuckDB
    * oracle, and the sf1 sweep all interpolate these. */
  val TfidfGateThreshold: Double = 0.8
  val TfidfGateMaxDocFreq: Int = 50

  /** The dsirSample quantized-exponential table rendered as a SQL VALUES
    * list "(0, 7624618), (1, …)", generated from the SAME array the Spark
    * operator reads ([[TextCorpus.dsirExpTableX1e6]]) so the two sides
    * cannot diverge and no engine evaluates ln at query time. */
  private lazy val dsirExpTableValues: String =
    TextCorpus.dsirExpTableX1e6.zipWithIndex
      .map { case (e, b) => s"($b, $e)" }.mkString(", ")

  /** Event-time TIMESTAMP column for streams reading the RAW events
    * fixture (whose `ts` vintage varies — see [[Fixtures.events]]):
    * BIGINT nanos → µs-truncated timestamp; TIMESTAMP_NTZ → reinterpreted
    * in the UTC session. Both yield the instant `epoch_us(ts)` denotes. */
  private def rawEventTime(schema: org.apache.spark.sql.types.StructType) =
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        col("ts").cast("timestamp")
      case _ => col("ts")
    }

  // ----------------------------------------------------------- relational

  private val relational: Seq[Q] = Seq(
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

    // EXACT heavy hitters (terms above 1/40 of all occurrences): pass 1
    // Misra-Gries candidates (bounded mergeable state), pass 2 exact
    // re-count of candidates — output provably equals the brute-force
    // HAVING, which is what the oracle computes
    Q("text_heavy_hitters",
      (s, d) => TextCorpus.heavyHitters(t(s, d, "documents"), "text", k = 40),
      Some(s"""WITH occ AS (SELECT unnest($toksSql) AS term FROM documents),
          tot AS (SELECT count(*) AS n FROM occ)
        SELECT term, CAST(count(*) AS BIGINT) AS cnt
        FROM occ, tot GROUP BY term, n HAVING count(*) * 40 > n""")),

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

    // deterministic KMV distinct sketch (per-lang distinct-token census):
    // k smallest distinct 60-bit md5-prefix hashes per group via the O(k)
    // mergeable aggregate; the DuckDB oracle replays the ENTIRE sketch —
    // kept set, kth value, and the integer-exact estimate — bit-for-bit
    // (no HLL-style unverifiable estimate)
    Q("text_distinct_sketch",
      (s, d) => {
        val toks = t(s, d, "documents").select(col("lang"),
          explode(TextFunctions.tokens(col("text"))).as("tok"))
        val hashed = toks.select(col("lang"),
          expr("CAST(conv(substr(md5(tok), 1, 15), 16, 10) AS BIGINT)").as("h"))
        TextCorpus.distinctSketch(hashed, "lang", "h", k = 128,
          hashBound = 1152921504606846976L)
      },
      Some(s"""WITH t AS (SELECT lang, unnest($toksSql) AS tok FROM documents),
        h AS (SELECT DISTINCT lang, CAST(list_sum(list_transform(range(1, 16),
            i -> CAST(strpos('0123456789abcdef', substr(md5(tok), i, 1)) - 1
              AS HUGEINT) << (4 * (15 - i)))) AS HUGEINT) AS h FROM t),
        r AS (SELECT lang, h,
            row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM h),
        kk AS (SELECT lang, CAST(count(*) FILTER (rn <= 128) AS BIGINT) AS n_kept,
            CAST(max(h) FILTER (rn <= 128) AS BIGINT) AS kth_min
          FROM r GROUP BY lang)
        SELECT lang, n_kept, kth_min,
          CAST(CASE WHEN n_kept < 128 THEN n_kept
            ELSE (127::HUGEINT * 1152921504606846976::HUGEINT)
              // (kth_min::HUGEINT + 1) END AS BIGINT) AS est_distinct
        FROM kk""")),

    Q("a1_max_count",
      (s, d) => t(s, d, "events")
        .agg(max("event_id").as("delta_max"), count(lit(1)).as("cnt")),
      Some("SELECT max(event_id) AS delta_max, count(*) AS cnt FROM events")),

    Q("a5_minmax",
      (s, d) => t(s, d, "lineitem").agg(
        min("l_shipdate").as("min_ship"), max("l_shipdate").as("max_ship"),
        count(lit(1)).as("cnt")),
      Some("""SELECT min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship,
        count(*) AS cnt FROM lineitem""")))

  // ------------------------------------------------- scd2 engine end-to-end

  /** Shared oracle fragment: the trimmed batch-1 projection. */
  private val oc =
    "c_custkey, trim(c_name) AS c_name, c_acctbal, trim(c_mktsegment) AS c_mktsegment"

  private val scd2: Seq[Q] = Seq(
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
          FROM customer WHERE c_custkey % 97 = 0""")))

  private lazy val strangeOracle: String =
    s"""SELECT $oc, CAST(1 AS BIGINT) AS ver,
        FALSE AS __is_deleted, TRUE AS __is_full_load FROM customer
      UNION ALL SELECT c_custkey, trim(c_name) || '_r', c_acctbal, trim(c_mktsegment),
        CAST(0 AS BIGINT), FALSE, FALSE FROM customer WHERE c_custkey % 89 = 0
      UNION ALL SELECT CAST(20000000 AS BIGINT), 'new', 0.0, 'SEG',
        CAST(2 AS BIGINT), FALSE, FALSE"""

  // --------------------------------------------- training-data pipeline ops

  /** DuckDB mirror of TextFunctions.normalizeWs. */
  // defs, not vals: these are referenced from gate Seqs that initialize
  // BEFORE this point in the object body — a val would interpolate null
  private def normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private def toksSql = s"string_split($normSql, ' ')"
  private def stopSql(w: String) =
    s"CAST(len(list_filter($toksSql, x -> x = '$w')) AS BIGINT)"
  private val stopWordsSql =
    Seq("the", "a", "and", "of", "to", "in", "is").map(stopSql).mkString(" + ")

  /** The synthetic "daily batch" for the incremental exact-dedup gates:
    * exact copies of every 7th doc (die at the fingerprint stage) and
    * order-reversed every-13th docs (novel content, survive). */
  private def ingestBatch(corpus: DataFrame): DataFrame =
    corpus.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      .unionByName(corpus.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat_ws(" ", reverse(split(col("text"), " "))).as("text")))

  /** Replays [[ingestBatch]] + the fingerprint filter from first
    * principles; shared by the probe and bloom strategy gates (their
    * results are contract-identical). */
  private def incrementalExactOracle = s"""WITH batch AS (
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
      UNION ALL SELECT doc_id + 3000000,
        array_to_string(list_reverse(string_split(text, ' ')), ' ')
        FROM documents WHERE doc_id % 13 = 0)
    SELECT doc_id FROM batch
    WHERE md5($normSql) NOT IN (SELECT md5($normSql) FROM documents)"""

  private val pipeline: Seq[Q] = Seq(
    Q("dedup_exact",
      (s, d) => Dedup.exact(t(s, d, "documents"), "doc_id", "text"),
      Some(s"""SELECT md5($normSql) AS fp, CAST(min(doc_id) AS BIGINT) AS keep_id,
        count(*) AS dupes FROM documents GROUP BY 1""")),

    Q("text_token_count",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_m")),
      Some(s"""SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens,
        CAST(length(text) AS BIGINT) AS n_chars_m FROM documents""")),

    // Edit-distance fuzzy-dedup join: exact Levenshtein ≤ 10 over the corpus
    // (length banding + q-gram count filter + banded DP); the oracle brute-
    // forces the same band with DuckDB's levenshtein — identical pair set
    // AND distances, since every pruning layer is recall-complete
    Q("dedup_editdist",
      (s, d) => Dedup.editDistancePairs(t(s, d, "documents"), "doc_id", "text", maxDist = 10),
      Some("""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
        FROM documents a JOIN documents b
          ON a.doc_id < b.doc_id
         AND length(a.text) <= length(b.text) + 10
         AND length(b.text) <= length(a.text) + 10
        WHERE levenshtein(a.text, b.text) <= 10""")),

    // INCREMENTAL edit distance: corpus indexed once (stored rare-prefix
    // postings + sorted q-gram hashes + the one text copy the banded DP
    // needs), round-trips through parquet with its build params in column
    // metadata, then a batch of every-7th-doc copies is verified against
    // the index WITHOUT re-scanning corpus text — the batch posts ALL its
    // q-grams, so no canonical-order agreement is needed (pigeonhole
    // recall argument in Dedup.editDistanceIncremental). Oracle is the
    // exact batch×corpus levenshtein truth
    Q("dedup_editdist_incremental",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val dir = java.nio.file.Files.createTempDirectory("graft-ed-idx")
        Dedup.editDistanceIndex(corpus, "doc_id", "text", maxDist = 10)
          .write.mode("overwrite").parquet(dir.toString)
        val index = s.read.parquet(dir.toString)
        val batch = corpus.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val out = Dedup.editDistanceIncremental(batch, index, "doc_id", "text")
          .localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some("""SELECT a.doc_id AS id_a, CAST(b.doc_id + 1000000 AS BIGINT) AS id_b,
          CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
        FROM documents a JOIN documents b
          ON b.doc_id % 7 = 0
         AND abs(length(a.text) - length(b.text)) <= 10
        WHERE levenshtein(a.text, b.text) <= 10""")),

    // Exact substring (span) dedup: every maximal token span covered by
    // 8-token windows occurring more than once in the corpus (Lee et al.
    // 2021 suffix-array dedup re-expressed as hashed positional k-gram
    // postings). The oracle recomputes spans from RAW k-gram strings, so
    // the operator's hash-prefilter + string-verify layering is proven
    // collision-exact, and the interval merges must agree token-for-token
    Q("dedup_spans",
      (s, d) => Dedup.duplicateSpans(t(s, d, "documents"), "doc_id", "text", k = 8),
      Some("""WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        g AS (SELECT doc_id, i - 1 AS p, array_to_string(t[i:i+7], ' ') AS gr
          FROM s, unnest(range(1, len(t) - 6)) AS r(i)),
        dup AS (SELECT gr FROM g GROUP BY gr HAVING count(*) > 1),
        hit AS (SELECT doc_id, p FROM g JOIN dup USING (gr)),
        m AS (SELECT doc_id, p,
            CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 8
              THEN 0 ELSE 1 END AS ni
          FROM hit),
        isl AS (SELECT doc_id, p,
            sum(ni) OVER (PARTITION BY doc_id ORDER BY p) AS il FROM m)
        SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
          CAST(max(p) + 7 AS BIGINT) AS span_end
        FROM isl GROUP BY doc_id, il""")),

    // The APPLY side of span dedup: cut every duplicated span out of the
    // corpus and rejoin — detect (dedup_spans) and apply must compose to
    // the exact token-filtered text the oracle rebuilds positionally
    Q("dedup_spans_apply",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.removeSpans(docs, "doc_id", "text",
          Dedup.duplicateSpans(docs, "doc_id", "text", k = 8))
      },
      Some("""WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        g AS (SELECT doc_id, i - 1 AS p, array_to_string(t[i:i+7], ' ') AS gr
          FROM s, unnest(range(1, len(t) - 6)) AS r(i)),
        dup AS (SELECT gr FROM g GROUP BY gr HAVING count(*) > 1),
        hit AS (SELECT doc_id, p FROM g JOIN dup USING (gr)),
        m AS (SELECT doc_id, p,
            CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 8
              THEN 0 ELSE 1 END AS ni
          FROM hit),
        isl AS (SELECT doc_id, p,
            sum(ni) OVER (PARTITION BY doc_id ORDER BY p) AS il FROM m),
        sp AS (SELECT doc_id, min(p) AS a, max(p) + 7 AS b
          FROM isl GROUP BY doc_id, il),
        tk AS (SELECT doc_id, i - 1 AS p, t[i] AS tok
          FROM s, unnest(range(1, len(t) + 1)) AS r(i)),
        kept AS (SELECT tk.doc_id, tk.p, tk.tok FROM tk
          WHERE NOT EXISTS (SELECT 1 FROM sp
            WHERE sp.doc_id = tk.doc_id AND tk.p BETWEEN sp.a AND sp.b))
        SELECT s.doc_id,
          coalesce(string_agg(kept.tok, ' ' ORDER BY kept.p), '') AS clean_text
        FROM s LEFT JOIN kept ON s.doc_id = kept.doc_id GROUP BY s.doc_id""")),

    // Content-defined chunking dedup: variable-length token chunks whose
    // boundaries are a pure function of local content (md5 gear rule —
    // IDENTICAL in Spark and DuckDB, so the oracle replays the exact
    // chunking), then a corpus-wide exact-content duplicate census. The
    // operator's hash-prefilter + raw-verify layering must reproduce the
    // oracle's direct group-by-chunk-text counts integer-exactly
    Q("dedup_cdc_chunks",
      (s, d) => Dedup.cdcChunkStats(t(s, d, "documents"), "doc_id", "text"),
      Some("""WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        tk AS (SELECT doc_id, i - 1 AS p, t[i] AS tok
          FROM s, unnest(range(1, len(t) + 1)) AS r(i)),
        c AS (SELECT doc_id, p, tok,
            coalesce(sum(CASE WHEN substr(md5(tok), 1, 1) < '1' THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY p
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
          FROM tk),
        ch AS (SELECT doc_id, cid, count(*) AS n_toks,
            string_agg(tok, ' ' ORDER BY p) AS chunk
          FROM c GROUP BY doc_id, cid),
        occ AS (SELECT chunk FROM ch GROUP BY chunk HAVING count(*) > 1)
        SELECT ch.doc_id, count(*) AS n_chunks,
          CAST(sum(CASE WHEN occ.chunk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS dup_chunks,
          CAST(coalesce(sum(CASE WHEN occ.chunk IS NOT NULL THEN n_toks ELSE 0 END), 0)
            AS BIGINT) AS dup_tokens
        FROM ch LEFT JOIN occ ON ch.chunk = occ.chunk
        GROUP BY ch.doc_id""")),

    // INCREMENTAL CDC dedup: the corpus is chunk-indexed once (one narrow
    // md5 row per distinct chunk, round-tripped through parquet), then a
    // batch of every-7th-doc copies EDITED with a prefix token is checked
    // against the index without touching corpus text. The prefix edit is
    // the point: content-defined boundaries resynchronize after it, so the
    // copies' unchanged tails still produce the corpus's chunk md5s (a
    // fixed-stride chunker would report near-zero dups here). Identity is
    // md5 on BOTH sides, so the oracle verifies the exact deployed contract
    Q("dedup_cdc_incremental",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val dir = java.nio.file.Files.createTempDirectory("graft-cdc-idx")
        Dedup.cdcChunkIndex(corpus, "doc_id", "text").write
          .mode("overwrite").parquet(dir.toString)
        val index = s.read.parquet(dir.toString)
        val batch = corpus.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(lit("graftpfx "), col("text")).as("text"))
        val out = Dedup.cdcChunkStatsIncremental(batch, index, "doc_id", "text")
          .localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some("""WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        tk AS (SELECT doc_id, i - 1 AS p, t[i] AS tok
          FROM s, unnest(range(1, len(t) + 1)) AS r(i)),
        c AS (SELECT doc_id, p, tok,
            coalesce(sum(CASE WHEN substr(md5(tok), 1, 1) < '1' THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY p
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
          FROM tk),
        idx AS (SELECT DISTINCT md5(string_agg(tok, ' ' ORDER BY p)) AS m
          FROM c GROUP BY doc_id, cid),
        bs AS (SELECT doc_id + 1000000 AS doc_id,
            string_split('graftpfx ' || text, ' ') AS t
          FROM documents WHERE doc_id % 7 = 0),
        btk AS (SELECT doc_id, i - 1 AS p, t[i] AS tok
          FROM bs, unnest(range(1, len(t) + 1)) AS r(i)),
        bc AS (SELECT doc_id, p, tok,
            coalesce(sum(CASE WHEN substr(md5(tok), 1, 1) < '1' THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY p
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
          FROM btk),
        bch AS (SELECT doc_id, cid, count(*) AS n_toks,
            md5(string_agg(tok, ' ' ORDER BY p)) AS m
          FROM bc GROUP BY doc_id, cid),
        occ AS (SELECT m, count(*) AS n FROM bch GROUP BY m)
        SELECT bch.doc_id, count(*) AS n_chunks,
          CAST(sum(CASE WHEN idx.m IS NOT NULL OR occ.n > 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS dup_chunks,
          CAST(coalesce(sum(CASE WHEN idx.m IS NOT NULL OR occ.n > 1
            THEN n_toks ELSE 0 END), 0) AS BIGINT) AS dup_tokens
        FROM bch LEFT JOIN idx ON bch.m = idx.m JOIN occ ON bch.m = occ.m
        GROUP BY bch.doc_id""")),

    // Data-mixture sampling by token budget: per source, keep documents in
    // the deterministic LCG order until the budget is crossed — selection
    // is a pure function of ids, so DuckDB replays it exactly
    Q("sample_token_budget",
      (s, d) => TextCorpus.tokenBudgetSample(t(s, d, "documents"),
        "doc_id", "text", "source",
        Map("src0" -> 600L, "src3" -> 600L, "src7" -> 450L)),
      Some("""WITH t AS (SELECT doc_id, source,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 % 1000 AS bk
        FROM documents WHERE source IN ('src0', 'src3', 'src7')),
        o AS (SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY source
            ORDER BY bk, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb FROM t)
        SELECT doc_id, source, n_tokens FROM o
        WHERE cb < CASE source WHEN 'src0' THEN 600 WHEN 'src3' THEN 600
          ELSE 450 END""")),

    // Data MIXING: weights 1:2:5 over three sources, 2000 tokens total —
    // water-filling allocation (largest-remainder splits; groups capped at
    // availability redistribute their surplus) then the deterministic
    // token-budget sample. The oracle replays the full allocation: with 3
    // groups at most 3 rounds, each unrolled as a CTE stage (at sf0.01
    // src8's 5/8 share exceeds its availability, so the multi-round path
    // is live exactly where the driver checks). Engine and SQL bump the
    // same largest remainders (ties by group name), so the sampled doc
    // set matches bit-for-bit
    Q("sample_mixture",
      (s, d) => TextCorpus.mixtureSample(t(s, d, "documents"),
        "doc_id", "text", "source",
        Map("src1" -> 1L, "src4" -> 2L, "src8" -> 5L), totalBudget = 2000L),
      Some("""WITH wts(g, wt) AS (VALUES ('src1', 1), ('src4', 2), ('src8', 5)),
        tot AS (SELECT source AS g,
            CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail
          FROM documents WHERE source IN ('src1','src4','src8') GROUP BY 1),
        a0 AS (SELECT w.g, w.wt, COALESCE(tot.avail, 0) AS avail
          FROM wts w LEFT JOIN tot USING (g)),
        r1 AS (SELECT g, wt, avail,
            2000 * wt // (SELECT SUM(wt) FROM a0) AS fl,
            2000 * wt % (SELECT SUM(wt) FROM a0) AS rm FROM a0),
        r1s AS (SELECT *, fl + CASE WHEN row_number() OVER (ORDER BY rm DESC, g)
            <= 2000 - (SELECT SUM(fl) FROM r1) THEN 1 ELSE 0 END AS share FROM r1),
        c1 AS (SELECT g, avail FROM r1s WHERE share >= avail),
        u1 AS (SELECT g, wt, avail FROM r1s WHERE share < avail),
        b2v AS (SELECT 2000 - COALESCE((SELECT SUM(avail) FROM c1), 0) AS b),
        r2 AS (SELECT g, wt, avail,
            (SELECT b FROM b2v) * wt // (SELECT SUM(wt) FROM u1) AS fl,
            (SELECT b FROM b2v) * wt % (SELECT SUM(wt) FROM u1) AS rm FROM u1),
        r2s AS (SELECT *, fl + CASE WHEN row_number() OVER (ORDER BY rm DESC, g)
            <= (SELECT b FROM b2v) - (SELECT SUM(fl) FROM r2) THEN 1 ELSE 0 END
            AS share FROM r2),
        c2 AS (SELECT g, avail FROM r2s WHERE share >= avail),
        u2 AS (SELECT g, wt, avail FROM r2s WHERE share < avail),
        b3v AS (SELECT (SELECT b FROM b2v)
            - COALESCE((SELECT SUM(avail) FROM c2), 0) AS b),
        r3 AS (SELECT g, wt, avail,
            (SELECT b FROM b3v) * wt // (SELECT SUM(wt) FROM u2) AS fl,
            (SELECT b FROM b3v) * wt % (SELECT SUM(wt) FROM u2) AS rm FROM u2),
        r3s AS (SELECT *, fl + CASE WHEN row_number() OVER (ORDER BY rm DESC, g)
            <= (SELECT b FROM b3v) - (SELECT SUM(fl) FROM r3) THEN 1 ELSE 0 END
            AS share FROM r3),
        fin AS (SELECT a0.g, CAST(CASE
            WHEN (SELECT count(*) FROM c1) = 0
              THEN (SELECT share FROM r1s x WHERE x.g = a0.g)
            WHEN a0.g IN (SELECT g FROM c1) THEN a0.avail
            WHEN (SELECT count(*) FROM c2) = 0
              THEN (SELECT share FROM r2s x WHERE x.g = a0.g)
            WHEN a0.g IN (SELECT g FROM c2) THEN a0.avail
            WHEN (SELECT count(*) FROM r3s WHERE share >= avail) = 0
              THEN (SELECT share FROM r3s x WHERE x.g = a0.g)
            ELSE a0.avail END AS BIGINT) AS budget
          FROM a0),
        t AS (SELECT doc_id, source,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
            ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 % 1000 AS bk
          FROM documents WHERE source IN ('src1','src4','src8')),
        o AS (SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY source
            ORDER BY bk, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb FROM t)
        SELECT o.doc_id, o.source, o.n_tokens FROM o JOIN fin ON o.source = fin.g
        WHERE o.cb < fin.budget""")),

    // Temperature-based mixture (the p^(1/T) reweighting of multilingual
    // pretraining, T=2): weights = floor(sqrt(group tokens)·1000) — IEEE
    // sqrt is correctly rounded on BOTH engines so the quantized weights
    // replay bit-for-bit — then the same exact water-fill + LCG selection
    // as sample_mixture (budget 3800 caps src8 at sf0.01, no cap at
    // sf0.001: both allocator paths are exercised across the sf matrix)
    Q("sample_temperature",
      (s, d) => TextCorpus.temperatureMixtureSample(t(s, d, "documents"),
        "doc_id", "text", "source", Seq("src1", "src4", "src8"),
        totalBudget = 3800L),
      Some("""WITH gl(g) AS (VALUES ('src1'), ('src4'), ('src8')),
        tot AS (SELECT source AS g,
            CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail
          FROM documents WHERE source IN ('src1','src4','src8') GROUP BY 1),
        a0 AS (SELECT gl.g,
            GREATEST(CAST(floor(sqrt(CAST(COALESCE(tot.avail, 0) AS DOUBLE))
              * 1000) AS BIGINT), 1) AS wt,
            COALESCE(tot.avail, 0) AS avail
          FROM gl LEFT JOIN tot ON gl.g = tot.g),
        r1 AS (SELECT g, wt, avail,
            3800 * wt // (SELECT SUM(wt) FROM a0) AS fl,
            3800 * wt % (SELECT SUM(wt) FROM a0) AS rm FROM a0),
        r1s AS (SELECT *, fl + CASE WHEN row_number() OVER (ORDER BY rm DESC, g)
            <= 3800 - (SELECT SUM(fl) FROM r1) THEN 1 ELSE 0 END AS share FROM r1),
        c1 AS (SELECT g, avail FROM r1s WHERE share >= avail),
        u1 AS (SELECT g, wt, avail FROM r1s WHERE share < avail),
        b2v AS (SELECT 3800 - COALESCE((SELECT SUM(avail) FROM c1), 0) AS b),
        r2 AS (SELECT g, wt, avail,
            (SELECT b FROM b2v) * wt // (SELECT SUM(wt) FROM u1) AS fl,
            (SELECT b FROM b2v) * wt % (SELECT SUM(wt) FROM u1) AS rm FROM u1),
        r2s AS (SELECT *, fl + CASE WHEN row_number() OVER (ORDER BY rm DESC, g)
            <= (SELECT b FROM b2v) - (SELECT SUM(fl) FROM r2) THEN 1 ELSE 0 END
            AS share FROM r2),
        c2 AS (SELECT g, avail FROM r2s WHERE share >= avail),
        u2 AS (SELECT g, wt, avail FROM r2s WHERE share < avail),
        b3v AS (SELECT (SELECT b FROM b2v)
            - COALESCE((SELECT SUM(avail) FROM c2), 0) AS b),
        r3 AS (SELECT g, wt, avail,
            (SELECT b FROM b3v) * wt // (SELECT SUM(wt) FROM u2) AS fl,
            (SELECT b FROM b3v) * wt % (SELECT SUM(wt) FROM u2) AS rm FROM u2),
        r3s AS (SELECT *, fl + CASE WHEN row_number() OVER (ORDER BY rm DESC, g)
            <= (SELECT b FROM b3v) - (SELECT SUM(fl) FROM r3) THEN 1 ELSE 0 END
            AS share FROM r3),
        fin AS (SELECT a0.g, CAST(CASE
            WHEN (SELECT count(*) FROM c1) = 0
              THEN (SELECT share FROM r1s x WHERE x.g = a0.g)
            WHEN a0.g IN (SELECT g FROM c1) THEN a0.avail
            WHEN (SELECT count(*) FROM c2) = 0
              THEN (SELECT share FROM r2s x WHERE x.g = a0.g)
            WHEN a0.g IN (SELECT g FROM c2) THEN a0.avail
            WHEN (SELECT count(*) FROM r3s WHERE share >= avail) = 0
              THEN (SELECT share FROM r3s x WHERE x.g = a0.g)
            ELSE a0.avail END AS BIGINT) AS budget
          FROM a0),
        t AS (SELECT doc_id, source,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
            ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 % 1000 AS bk
          FROM documents WHERE source IN ('src1','src4','src8')),
        o AS (SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY source
            ORDER BY bk, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb FROM t)
        SELECT o.doc_id, o.source, o.n_tokens FROM o JOIN fin ON o.source = fin.g
        WHERE o.cb < fin.budget""")),

    // Learned-quality scoring: a fasttext-style LINEAR classifier applied
    // per document (bias + Σ token milli-weights, integer-exact) by the
    // codegen'd LinearTextScore kernel — the model rides as one hash map
    // per executor, so scoring is map-side only: no explode, no shuffle
    Q("text_quality_linear",
      (s, d) => t(s, d, "documents").select(col("doc_id"),
          graft.functions.NativeHash.linearTextScore(col("text"),
            Map("scan" -> 40L, "query" -> 25L, "join" -> 15L, "a" -> -5L,
              "sort" -> -30L, "merge" -> -20L), bias = 100L).as("score_milli"))
        .withColumn("keep", col("score_milli") >= 150L),
      Some("""WITH w(tok, wt) AS (VALUES ('scan', 40), ('query', 25), ('join', 15),
          ('a', -5), ('sort', -30), ('merge', -20)),
        tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        sc AS (SELECT doc_id, 100 + coalesce(sum(wt), 0) AS s
          FROM tk LEFT JOIN w USING (tok) GROUP BY doc_id)
        SELECT doc_id, CAST(s AS BIGINT) AS score_milli, s >= 150 AS keep
        FROM sc""")),

    // Phrase-blocklist content filter: total occurrences of a multi-word
    // phrase list per document via the codegen'd byte-level Aho–Corasick
    // kernel (one automaton object per executor, O(1)/byte — the shape a
    // 10k-phrase LDNOOBW list needs where regex alternation explodes);
    // the oracle counts every (phrase, end position) pair positionally,
    // so overlap semantics are pinned exactly
    Q("text_phrase_blocklist",
      (s, d) => t(s, d, "documents").select(col("doc_id"),
          graft.functions.NativeHash.phraseMatchCount(col("text"),
            Seq("query spark hash", "scan filter", "slow table", "key agg"))
            .as("blocked_hits"))
        .withColumn("blocked", col("blocked_hits") > 0L),
      Some("""WITH p(ph) AS (VALUES ('query spark hash'), ('scan filter'),
          ('slow table'), ('key agg')),
        occ AS (SELECT d.doc_id, count(*) AS c
          FROM documents d, p,
            unnest(range(1, length(d.text) - length(p.ph) + 2)) AS r(i)
          WHERE substr(d.text, CAST(i AS BIGINT), length(p.ph)) = p.ph
          GROUP BY d.doc_id)
        SELECT d.doc_id, CAST(coalesce(occ.c, 0) AS BIGINT) AS blocked_hits,
          coalesce(occ.c, 0) > 0 AS blocked
        FROM documents d LEFT JOIN occ USING (doc_id)""")),

    // CCNet-style head/middle/tail buckets: per-language integer-score
    // thresholds (cum·3 ≥ j·total over the ascending score histogram) cut
    // the distribution into 3 mass buckets, ties sharing a bucket — NO
    // per-language window (the single-reducer trap); the oracle replays
    // the histogram, the threshold rule, and the assignment exactly
    Q("text_score_buckets",
      (s, d) => TextCorpus.scoreBuckets(
        t(s, d, "documents").select(col("doc_id"), col("lang"),
          graft.functions.NativeHash.linearTextScore(col("text"),
            Map("scan" -> 40L, "query" -> 25L, "join" -> 15L, "a" -> -5L,
              "sort" -> -30L, "merge" -> -20L), bias = 100L).as("score_milli")),
        "score_milli", "lang"),
      Some("""WITH w(tok, wt) AS (VALUES ('scan', 40), ('query', 25), ('join', 15),
          ('a', -5), ('sort', -30), ('merge', -20)),
        tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        sc AS (SELECT t.doc_id, d.lang,
            CAST(100 + coalesce(sum(wt), 0) AS BIGINT) AS score_milli
          FROM tk t LEFT JOIN w USING (tok) JOIN documents d ON t.doc_id = d.doc_id
          GROUP BY 1, 2),
        hist AS (SELECT lang, score_milli AS s, count(*) AS c FROM sc GROUP BY 1, 2),
        cum AS (SELECT lang, s, sum(c) OVER (PARTITION BY lang ORDER BY s) AS cm,
            sum(c) OVER (PARTITION BY lang) AS tot FROM hist),
        cuts AS (SELECT lang,
            min(CASE WHEN cm * 3 >= tot THEN s END) AS c1,
            min(CASE WHEN cm * 3 >= 2 * tot THEN s END) AS c2
          FROM cum GROUP BY lang)
        SELECT sc.doc_id, sc.lang, sc.score_milli,
          CAST(1 + CASE WHEN sc.score_milli > c.c1 THEN 1 ELSE 0 END
             + CASE WHEN sc.score_milli > c.c2 THEN 1 ELSE 0 END AS BIGINT) AS bucket
        FROM sc JOIN cuts c ON sc.lang = c.lang""")),

    // In-engine QUALITY-CLASSIFIER TRAINING (the CCNet "train a fastText
    // filter, score everything" step): full-batch integer perceptron over
    // token counts, 2 epochs, 300-token df-ranked vocabulary, labels from
    // lang — then the corpus is scored with the SAME codegen kernel the
    // pipeline applies at scale. The oracle replays both epochs (epoch 1
    // from zero weights = every doc misclassified) and the final margins
    // exactly, so training is proven bit-replayable
    Q("text_quality_classifier",
      (s, d) => {
        val docs = t(s, d, "documents")
        val labeled = docs.withColumn("label",
          when(col("lang") === "en", 1L).otherwise(-1L))
        val (wts, bias) = TextCorpus.trainQualityClassifier(
          labeled, "label", "text", epochs = 2, vocabSize = 300)
        docs.select(col("doc_id"),
            graft.functions.NativeHash.linearTextScore(col("text"), wts, bias)
              .as("margin"))
          .withColumn("pred_quality", col("margin") > 0L)
      },
      Some("""WITH lab AS (SELECT doc_id,
            CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS l FROM documents),
        tk AS (SELECT doc_id, tok FROM (SELECT doc_id,
            unnest(string_split(text, ' ')) AS tok FROM documents)
          WHERE tok <> ''),
        dfq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tk GROUP BY tok),
        vocab AS (SELECT tok FROM dfq ORDER BY df DESC, tok LIMIT 300),
        w1 AS (SELECT tk.tok, CAST(sum(l) AS BIGINT) AS w
          FROM tk JOIN lab USING (doc_id) JOIN vocab USING (tok) GROUP BY tk.tok),
        b1 AS (SELECT CAST(sum(l) AS BIGINT) AS b FROM lab),
        m1 AS (SELECT d.doc_id, (SELECT b FROM b1) + coalesce(sum(w1.w), 0) AS m
          FROM documents d LEFT JOIN tk ON tk.doc_id = d.doc_id
          LEFT JOIN w1 ON tk.tok = w1.tok GROUP BY d.doc_id),
        mis AS (SELECT lab.doc_id, lab.l FROM lab JOIN m1 USING (doc_id)
          WHERE lab.l * m1.m <= 0),
        u2 AS (SELECT tk.tok, CAST(sum(l) AS BIGINT) AS g
          FROM tk JOIN mis USING (doc_id) JOIN vocab USING (tok) GROUP BY tk.tok),
        w2 AS (SELECT w1.tok, CAST(w1.w + coalesce(u2.g, 0) AS BIGINT) AS w
          FROM w1 LEFT JOIN u2 USING (tok)),
        b2 AS (SELECT (SELECT b FROM b1)
            + CAST(coalesce((SELECT sum(l) FROM mis), 0) AS BIGINT) AS b)
        SELECT d.doc_id,
          CAST((SELECT b FROM b2) + coalesce(sum(w2.w), 0) AS BIGINT) AS margin,
          ((SELECT b FROM b2) + coalesce(sum(w2.w), 0)) > 0 AS pred_quality
        FROM documents d LEFT JOIN tk ON tk.doc_id = d.doc_id
        LEFT JOIN w2 ON tk.tok = w2.tok
        GROUP BY d.doc_id""")),

    // Corpus-LM novelty (CCNet-style statistical filtering, integer-exact):
    // bigram model trained on the corpus itself with an adaptive commonness
    // threshold; per-doc novel-bigram counts + truncating permille
    Q("text_bigram_novelty",
      (s, d) => TextCorpus.bigramNovelty(t(s, d, "documents"), "doc_id", "text"),
      Some("""WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        b AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
          FROM s, unnest(range(1, len(t))) AS r(i)),
        c AS (SELECT bg FROM b GROUP BY bg
          HAVING count(*) >= (SELECT count(*) FROM b) // 2000 + 1),
        n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS novel_bigrams
          FROM b ANTI JOIN c USING (bg) GROUP BY doc_id),
        tot AS (SELECT doc_id, CAST(greatest(len(t) - 1, 0) AS BIGINT) AS total_bigrams FROM s)
        SELECT tot.doc_id, total_bigrams,
          CAST(COALESCE(novel_bigrams, 0) AS BIGINT) AS novel_bigrams,
          CAST(CASE WHEN total_bigrams > 0
            THEN COALESCE(novel_bigrams, 0) * 1000 // total_bigrams
            ELSE 0 END AS BIGINT) AS novelty_permille
        FROM tot LEFT JOIN n ON tot.doc_id = n.doc_id""")),

    // Corpus bigram-LM scoring (CCNet-style likelihood filter), exact
    // integer arithmetic end to end: add-one-smoothed conditional
    // frequency per bigram (×1e6, integer div), mean per doc — no float
    // log-prob, so the oracle replays the identical statistic bit-for-bit
    Q("text_lm_score",
      (s, d) => TextCorpus.bigramLmScore(t(s, d, "documents"), "doc_id", "text"),
      Some(s"""WITH base AS (SELECT doc_id, $toksSql AS toks FROM documents),
        bg AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
          FROM base, unnest(range(1, len(toks))) AS r(i)),
        c2 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2),
        c1 AS (SELECT w1, count(*) AS h FROM bg GROUP BY 1),
        v AS (SELECT count(DISTINCT t) AS vs
          FROM (SELECT unnest(toks) AS t FROM base)),
        sc AS (SELECT doc_id, (c2.c + 1) * 1000000 // (c1.h + v.vs) AS p
          FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          CAST(sum(p) // count(*) AS BIGINT) AS lm_x1e6
        FROM sc GROUP BY doc_id""")),

    // CROSS-corpus LM scoring (the exact CCNet shape): the bigram model
    // trains on the 'en' docs (the clean reference side) and scores the
    // REST of the corpus; transitions the reference never saw take the
    // add-one-smoothed floor. Same integer statistic as text_lm_score —
    // the oracle replays model, floor, and per-doc means exactly
    Q("text_lm_cross_score",
      (s, d) => {
        val docs = t(s, d, "documents")
        TextCorpus.bigramLmScoreAgainst(
          docs.filter(col("lang") === "en"),
          docs.filter(col("lang") =!= "en"),
          "doc_id", "text")
      },
      Some(s"""WITH base AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
        rbg AS (SELECT toks[i] AS w1, toks[i+1] AS w2
          FROM base, unnest(range(1, len(toks))) AS r(i) WHERE lang = 'en'),
        c2 AS (SELECT w1, w2, count(*) AS c FROM rbg GROUP BY 1, 2),
        c1 AS (SELECT w1, count(*) AS h FROM rbg GROUP BY 1),
        v AS (SELECT count(DISTINCT t) AS vs
          FROM (SELECT unnest(toks) AS t FROM base WHERE lang = 'en')),
        tbg AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
          FROM base, unnest(range(1, len(toks))) AS r(i) WHERE lang <> 'en'),
        sc AS (SELECT doc_id,
            (coalesce(c2.c, 0) + 1) * 1000000 // (coalesce(c1.h, 0) + v.vs) AS p
          FROM tbg LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
          CROSS JOIN v)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          CAST(sum(p) // count(*) AS BIGINT) AS lm_x1e6
        FROM sc GROUP BY doc_id""")),

    // Within-document dedup: drop repeated tokens keeping FIRST occurrence
    // (the intra-doc flavor of corpus dedup — boilerplate-token collapse);
    // array_distinct is order-preserving in Spark, the oracle rebuilds the
    // same first-occurrence order via min(position) per token
    Q("text_dedup_tokens",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        array_join(array_distinct(split(col("text"), " ")), " ").as("text_dedup"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("uniq_tokens")),
      Some("""WITH s AS (SELECT doc_id, string_split(text, ' ') AS parts FROM documents),
        e AS (SELECT doc_id, unnest(list_zip(parts, range(1, len(parts)+1))) AS z FROM s),
        f AS (SELECT doc_id, z[1] AS w, min(CAST(z[2] AS BIGINT)) AS mi FROM e GROUP BY 1, 2)
        SELECT doc_id, string_agg(w, ' ' ORDER BY mi) AS text_dedup,
          CAST(count(*) AS BIGINT) AS uniq_tokens
        FROM f GROUP BY doc_id""")),

    // CCNet/RefinedWeb-style frequent-segment (boilerplate) removal:
    // 3-word groups appearing in ≥ 5 distinct docs are censused exactly
    // (hash-pruned pass 1, string-recount pass 2) and stripped from every
    // document in one shuffle-free projection — the oracle replays the
    // census and the positional reassembly from raw segment strings, so
    // the hash-prune layer is proven collision-exact
    Q("text_boilerplate_removal",
      (s, d) => {
        val docs = t(s, d, "documents")
        val bp = TextCorpus.boilerplateSegments(docs, "doc_id", "text",
          segWords = 3, minDocs = 5)
        TextCorpus.removeBoilerplate(docs, "doc_id", "text", bp.toSeq,
          segWords = 3)
      },
      Some("""WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        g AS (SELECT doc_id, list_transform(range(0, (len(t)+2)//3),
            i -> array_to_string(t[i*3+1:i*3+3], ' ')) AS segs FROM s),
        e AS (SELECT doc_id, unnest(list_distinct(segs)) AS seg FROM g),
        bp AS (SELECT seg FROM e GROUP BY seg HAVING count(*) >= 5),
        a AS (SELECT doc_id, i, segs[CAST(i AS BIGINT)+1] AS seg
          FROM g, unnest(range(0, len(segs))) AS r(i)),
        k AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY i) AS clean_text,
            count(*) AS kept
          FROM a WHERE seg NOT IN (SELECT seg FROM bp) GROUP BY doc_id)
        SELECT g.doc_id, coalesce(k.clean_text, '') AS clean_text,
          CAST(len(g.segs) AS BIGINT) AS n_segments,
          CAST(len(g.segs) - coalesce(k.kept, 0) AS BIGINT) AS n_removed
        FROM g LEFT JOIN k USING (doc_id)""")),

    // WITHIN-doc segment dedup (the Gopher "remove duplicated paragraphs
    // within a document" rule, word-groups as paragraphs): repeats of an
    // earlier segment in the SAME doc drop, first occurrences keep order —
    // a pure per-row projection; the oracle rebuilds first-occurrence
    // order via min(position) like text_dedup_tokens does for tokens
    Q("text_dedup_segments",
      (s, d) => TextCorpus.dedupSegmentsWithinDoc(
        t(s, d, "documents"), "doc_id", "text", segWords = 2),
      Some("""WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        g AS (SELECT doc_id, list_transform(range(0, (len(t)+1)//2),
            i -> array_to_string(t[i*2+1:i*2+2], ' ')) AS segs FROM s),
        a AS (SELECT doc_id, i, segs[CAST(i AS BIGINT)+1] AS seg
          FROM g, unnest(range(0, len(segs))) AS r(i)),
        f AS (SELECT doc_id, seg, min(i) AS mi FROM a GROUP BY 1, 2)
        SELECT g.doc_id,
          (SELECT string_agg(f.seg, ' ' ORDER BY f.mi) FROM f
            WHERE f.doc_id = g.doc_id) AS clean_text,
          CAST(len(g.segs) AS BIGINT) AS n_segments,
          CAST(len(g.segs) - (SELECT count(*) FROM f WHERE f.doc_id = g.doc_id)
            AS BIGINT) AS n_removed
        FROM g""")),

    // INCREMENTAL boilerplate maintenance: the stored census (docs with
    // doc_id % 3 != 0) is folded with an ingest batch's census (% 3 = 0)
    // — old text never re-scanned — and the merged filter list cleans the
    // new batch; batches partition the corpus by document, so the fold
    // equals the full-corpus census exactly and the oracle replays it
    // from the whole table
    Q("text_boilerplate_incremental",
      (s, d) => {
        val docs = t(s, d, "documents")
        val stored = TextCorpus.segmentCensus(
          docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", segWords = 3)
        val batch = docs.filter(col("doc_id") % 3 === 0)
        val merged = TextCorpus.segmentCensusMerge(
          stored, TextCorpus.segmentCensus(batch, "doc_id", "text", segWords = 3))
        val bp = TextCorpus.boilerplateFromCensus(merged, minDocs = 5)
        TextCorpus.removeBoilerplate(batch, "doc_id", "text", bp.toSeq,
          segWords = 3)
      },
      Some("""WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        g AS (SELECT doc_id, list_transform(range(0, (len(t)+2)//3),
            i -> array_to_string(t[i*3+1:i*3+3], ' ')) AS segs FROM s),
        e AS (SELECT doc_id, unnest(list_distinct(segs)) AS seg FROM g),
        bp AS (SELECT seg FROM e GROUP BY seg HAVING count(*) >= 5),
        a AS (SELECT doc_id, i, segs[CAST(i AS BIGINT)+1] AS seg
          FROM g, unnest(range(0, len(segs))) AS r(i)
          WHERE doc_id % 3 = 0),
        k AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY i) AS clean_text,
            count(*) AS kept
          FROM a WHERE seg NOT IN (SELECT seg FROM bp) GROUP BY doc_id)
        SELECT g.doc_id, coalesce(k.clean_text, '') AS clean_text,
          CAST(len(g.segs) AS BIGINT) AS n_segments,
          CAST(len(g.segs) - coalesce(k.kept, 0) AS BIGINT) AS n_removed
        FROM g LEFT JOIN k USING (doc_id)
        WHERE g.doc_id % 3 = 0""")),

    // PERSISTED census round trip: the operational shape of incremental
    // boilerplate maintenance — the census lives in a versioned store
    // table across ingest batches (the minhashIndex pattern). Version 0
    // holds the pre-batch census, the batch fold is written back as
    // version 1, and the filter list derives from the STORED table alone
    // (old text never re-scanned); the oracle replays the one-shot census
    // from the whole corpus, proving the store round trip is lossless
    Q("text_boilerplate_census_store",
      (s, d) => {
        val docs = t(s, d, "documents")
        val dir = java.nio.file.Files.createTempDirectory("graft-bp-census")
        val tbl = new graft.store.VersionedTable(s, dir.toString)
        tbl.overwrite(TextCorpus.segmentCensus(
          docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", segWords = 3))
        val batch = docs.filter(col("doc_id") % 3 === 0)
        val merged = TextCorpus.segmentCensusMerge(tbl.read(),
          TextCorpus.segmentCensus(batch, "doc_id", "text", segWords = 3))
        tbl.overwrite(merged)
        val bp = TextCorpus.boilerplateFromCensus(tbl.read(), minDocs = 5)
        deleteDir(dir.toFile)
        TextCorpus.removeBoilerplate(batch, "doc_id", "text", bp.toSeq,
          segWords = 3)
      },
      Some("""WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        g AS (SELECT doc_id, list_transform(range(0, (len(t)+2)//3),
            i -> array_to_string(t[i*3+1:i*3+3], ' ')) AS segs FROM s),
        e AS (SELECT doc_id, unnest(list_distinct(segs)) AS seg FROM g),
        bp AS (SELECT seg FROM e GROUP BY seg HAVING count(*) >= 5),
        a AS (SELECT doc_id, i, segs[CAST(i AS BIGINT)+1] AS seg
          FROM g, unnest(range(0, len(segs))) AS r(i)
          WHERE doc_id % 3 = 0),
        k AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY i) AS clean_text,
            count(*) AS kept
          FROM a WHERE seg NOT IN (SELECT seg FROM bp) GROUP BY doc_id)
        SELECT g.doc_id, coalesce(k.clean_text, '') AS clean_text,
          CAST(len(g.segs) AS BIGINT) AS n_segments,
          CAST(len(g.segs) - coalesce(k.kept, 0) AS BIGINT) AS n_removed
        FROM g LEFT JOIN k USING (doc_id)
        WHERE g.doc_id % 3 = 0""")),

    Q("text_quality",
      (s, d) => {
        val comps = TextFunctions.qualityComponents(col("text"))
        t(s, d, "documents").select(
          (col("doc_id") +: comps.map { case (n, c) => c.as(n) }) :+
            TextFunctions.qualityLabel(col("text")).as("label_q"): _*)
      },
      Some(s"""WITH c AS (SELECT doc_id,
          CAST(len($toksSql) AS BIGINT) AS n_tokens,
          CAST(length(text) AS BIGINT) AS n_chars_m,
          CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
          CAST($stopWordsSql AS BIGINT) AS n_stopwords
        FROM documents)
        SELECT doc_id, n_tokens, n_chars_m, n_punct, n_stopwords,
          CAST(CASE WHEN n_tokens > 0 THEN (n_chars_m * 100) // n_tokens ELSE 0 END AS BIGINT)
            AS mean_token_len_x100,
          CAST(CASE WHEN n_tokens > 0 THEN (n_stopwords * 1000) // n_tokens ELSE 0 END AS BIGINT)
            AS stopword_ratio_x1000,
          CASE WHEN n_tokens < 5 THEN 'too_short'
               WHEN n_stopwords = 0 THEN 'no_stopwords'
               ELSE 'ok' END AS label_q
        FROM c""")),

    // vocabulary build: document frequency of every token, top-100 with a
    // deterministic tiebreak — the df side of TF-IDF / filter-list building
    Q("text_vocab_df",
      (s, d) => graft.operators.TextCorpus.topVocabulary(
        t(s, d, "documents"), "doc_id", "text", 100),
      Some(s"""WITH p AS (SELECT DISTINCT doc_id, term FROM (
          SELECT doc_id, unnest(list_distinct($toksSql)) AS term FROM documents))
        SELECT term, count(*) AS df FROM p GROUP BY 1
        ORDER BY df DESC, term LIMIT 100""")),

    // repetition detector: distinct-token ratio per mille per document
    Q("text_repetition",
      (s, d) => t(s, d, "documents").select(col("doc_id"),
        TextFunctions.distinctRatioX1000(col("text")).as("distinct_ratio_x1000")),
      Some(s"""SELECT doc_id,
        CAST((len(list_distinct($toksSql)) * 1000) // len($toksSql) AS BIGINT)
          AS distinct_ratio_x1000 FROM documents""")),

    // Gopher duplicate-n-gram coverage (token units, union semantics): the
    // permille of tokens lying under ANY within-doc bigram occurring ≥ 2×
    // — the repetition filter the distinct-ratio detector can't see
    // (structured repeats of individually-common tokens). Map-only: one
    // codegen'd per-row kernel (boundary scan + window-hash sort + mark);
    // the oracle recomputes from raw gram strings and positions, proving
    // the hash layer collision-exact
    Q("text_dup_ngram_coverage",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"),
          graft.functions.NativeHash.dupNgramCoverage(
            TextFunctions.normalizeWs(col("text")), 2).as("covered_tokens"))
        .withColumn("dup_coverage_permille",
          expr("CAST(covered_tokens * 1000 DIV n_tokens AS BIGINT)")),
      Some(s"""WITH s AS (SELECT doc_id, $toksSql AS t FROM documents),
        gr AS (SELECT doc_id, i, array_to_string(t[i:i+1], ' ') AS g
          FROM s, unnest(range(1, len(t))) AS r(i)),
        dup AS (SELECT doc_id, g FROM gr GROUP BY 1, 2 HAVING count(*) >= 2),
        cov AS (SELECT DISTINCT gr.doc_id, p
          FROM gr JOIN dup USING (doc_id, g), unnest(range(gr.i, gr.i + 2)) AS rp(p)),
        c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS covered FROM cov GROUP BY doc_id)
        SELECT s.doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
          CAST(coalesce(covered, 0) AS BIGINT) AS covered_tokens,
          CAST(coalesce(covered, 0) * 1000 // len(t) AS BIGINT) AS dup_coverage_permille
        FROM s LEFT JOIN c USING (doc_id)""")),

    // the companion TOP-n-gram coverage (Gopher's "most frequent n-gram"
    // fraction), tie-robust: union coverage of EVERY gram achieving the
    // doc's maximal count (no arbitrary tie-break can leak into the
    // result), 0 when the max count < 2
    Q("text_top_ngram_coverage",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"),
          graft.functions.NativeHash.topNgramCoverage(
            TextFunctions.normalizeWs(col("text")), 2).as("top_covered"))
        .withColumn("top_coverage_permille",
          expr("CAST(top_covered * 1000 DIV n_tokens AS BIGINT)")),
      Some(s"""WITH s AS (SELECT doc_id, $toksSql AS t FROM documents),
        gr AS (SELECT doc_id, i, array_to_string(t[i:i+1], ' ') AS g
          FROM s, unnest(range(1, len(t))) AS r(i)),
        cnt AS (SELECT doc_id, g, count(*) AS c FROM gr GROUP BY 1, 2),
        mx AS (SELECT doc_id, max(c) AS m FROM cnt GROUP BY 1),
        top AS (SELECT cnt.doc_id, g FROM cnt JOIN mx USING (doc_id)
          WHERE c = m AND m >= 2),
        cov AS (SELECT DISTINCT gr.doc_id, p
          FROM gr JOIN top USING (doc_id, g), unnest(range(gr.i, gr.i + 2)) AS rp(p)),
        c2 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS covered FROM cov GROUP BY doc_id)
        SELECT s.doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
          CAST(coalesce(covered, 0) AS BIGINT) AS top_covered,
          CAST(coalesce(covered, 0) * 1000 // len(t) AS BIGINT) AS top_coverage_permille
        FROM s LEFT JOIN c2 USING (doc_id)""")),

    Q("text_fingerprint",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp")),
      Some(s"SELECT doc_id, md5($normSql) AS fp FROM documents")),

    Q("text_langid",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"), col("lang"),
        TextFunctions.langId(col("text")).as("lang_pred")),
      Some {
        // per-language stopword hit counts, then the same first-max-wins
        // cascade the Column fold implements (profile order breaks ties)
        def hits(words: Seq[String]) = {
          val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
          s"len(list_filter($toksSql, t -> list_contains($arr, t)))"
        }
        val Seq(en, de, fr, es) = TextFunctions.langProfiles.map(p => hits(p._2))
        s"""WITH s AS (SELECT doc_id, lang,
            $en AS en, $de AS de, $fr AS fr, $es AS es FROM documents)
          SELECT doc_id, lang,
            CASE WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
                 WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
                 WHEN fr >= es AND fr > 0 THEN 'fr'
                 WHEN es > 0 THEN 'es'
                 ELSE 'und' END AS lang_pred
          FROM s"""
      }),

    // MinHash-LSH against EXACT ground truth: the DuckDB oracle brute-forces
    // true Jaccard ≥ 0.5 pairs via an unnest-shingle self-join; the gate is
    // green iff LSH recall is total on this corpus (it is — deterministic
    // hash seeds, verified at sf0.001/sf0.01) and the verify step's Jaccard
    // matches the oracle's bit-for-bit (integer per-mille on both sides)
    Q("dedup_minhash_lsh",
      (s, d) => Dedup.minhashLshPairs(t(s, d, "documents"), "doc_id", "text",
        threshold = 0.5),
      Some(jaccardTruthSql(500))),

    // INCREMENTAL near-dedup: the corpus is indexed once (band buckets +
    // sorted shingle hashes), the index round-trips through parquet to
    // prove storability, and a "daily batch" (copies of every 7th doc
    // under fresh ids — identical signatures make recall structural: the
    // copy collides wherever its source does, and the full-corpus gate
    // proves sources collide with all their J≥0.5 partners) is deduped
    // against the index WITHOUT touching corpus text. Oracle recomputes
    // exact batch×corpus Jaccard truth
    Q("dedup_minhash_incremental",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val dir = java.nio.file.Files.createTempDirectory("graft-mh-idx")
        Dedup.minhashIndex(corpus, "doc_id", "text").write
          .mode("overwrite").parquet(dir.toString)
        val index = s.read.parquet(dir.toString)
        val batch = corpus.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        // localCheckpoint materializes the (small) pair set so the temp
        // index backing the plan can be deleted before returning
        val out = Dedup.minhashLshIncremental(batch, index, "doc_id", "text",
          threshold = 0.5).localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some(s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
        sets AS (SELECT doc_id,
            list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
              ELSE list_transform(range(1, len(toks)-1),
                i -> array_to_string(toks[i:i+2], ' ')) END) AS sh
          FROM base),
        batch AS (SELECT doc_id + 1000000 AS doc_id, sh FROM sets WHERE doc_id % 7 = 0),
        pa AS (SELECT doc_id, unnest(sh) AS s FROM sets),
        pb AS (SELECT doc_id, unnest(sh) AS s FROM batch),
        sa AS (SELECT doc_id, len(sh) AS sz FROM sets),
        sb AS (SELECT doc_id, len(sh) AS sz FROM batch),
        inter AS (SELECT pa.doc_id AS id_a, pb.doc_id AS id_b, count(*) AS i
          FROM pa JOIN pb ON pa.s = pb.s GROUP BY 1, 2)
        SELECT id_a, id_b, CAST((i*1000) // (sa.sz + sb.sz - i) AS BIGINT) AS jaccard_x1000
        FROM inter JOIN sa ON sa.doc_id = id_a JOIN sb ON sb.doc_id = id_b
        WHERE (i*1000) // (sa.sz + sb.sz - i) >= 500""")),

    // SimHash candidates (8×8-bit chunks: pigeonhole-complete for hamming
    // ≤ 7) verified at Jaccard ≥ 0.9. The gate uses the SQL-mirrorable
    // poly61 token hash so the ORACLE recomputes the signatures and tests
    // the operator's true contract — output ≡ {hamming ≤ 7 ∧ J ≥ 0.9} —
    // exactly, at ANY corpus scale (at sf0.1 two J ≥ 0.9 pairs sit at
    // hamming 8/10: a pure-Jaccard oracle would demand pairs no hamming
    // method can see)
    Q("dedup_simhash",
      (s, d) => Dedup.simhashVerifiedPairs(t(s, d, "documents"), "doc_id", "text",
        maxHamming = 7, threshold = 0.9, numChunks = 8, polyHash = true),
      Some(simhashTruthSql(7, 900))),

    // INCREMENTAL SimHash against a persisted (id, sig) index: the batch
    // (docs %7, re-keyed +1M) pairs against the full-corpus index without
    // re-reading history text; recall is pigeonhole-exact, so the oracle
    // is the FULL brute-force cross check over recomputed signatures
    Q("dedup_simhash_incremental",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val dir = java.nio.file.Files.createTempDirectory("graft-sh-idx")
        Dedup.simhashIndex(corpus, "doc_id", "text",
            numChunks = 8, polyHash = true)
          .write.mode("overwrite").parquet(dir.toString)
        val index = s.read.parquet(dir.toString)
        val batch = corpus.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val out = Dedup.simhashIncremental(batch, index, "doc_id", "text",
          maxHamming = 7).localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some(s"""WITH sg AS ($polySigSql),
        b AS (SELECT doc_id + 1000000 AS id_b, sig FROM sg WHERE doc_id % 7 = 0)
        SELECT sg.doc_id AS id_a, b.id_b,
          CAST(bit_count(xor(sg.sig, b.sig)) AS BIGINT) AS hamming
        FROM sg, b
        WHERE sg.doc_id <> b.id_b AND bit_count(xor(sg.sig, b.sig)) <= 7""")),

    // CONTAINMENT pairs — the asymmetric quote/boilerplate detector:
    // |A∩B| / min(|A|,|B|) ≥ 0.8 with the documented ≥ 10-shingle floor
    // on the smaller side (the prefix filter's recall bound); the oracle
    // brute-forces the identical contract, so recall AND the integer
    // per-mille values must match exactly. Parameters come from the
    // shared ContainmentGate* constants so the sf1 sweep (which re-runs
    // this query with a candidate-audit observation attached) provably
    // runs the same parameterization the oracle grades.
    Q("dedup_containment",
      (s, d) => Dedup.containmentPairs(t(s, d, "documents"), "doc_id", "text",
        threshold = ContainmentGateThreshold,
        minShingles = ContainmentGateMinShingles),
      Some(s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
        sets AS (SELECT doc_id,
            list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
              ELSE list_transform(range(1, len(toks)-1),
                i -> array_to_string(toks[i:i+2], ' ')) END) AS sh
          FROM base),
        sizes AS (SELECT doc_id, len(sh) AS sz FROM sets),
        posting AS (SELECT doc_id, unnest(sh) AS s FROM sets),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
          FROM posting a JOIN posting b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST((i*1000) // least(sa.sz, sb.sz) AS BIGINT) AS containment_x1000
        FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        WHERE least(sa.sz, sb.sz) >= ${ContainmentGateMinShingles}
          AND (i*1000) // least(sa.sz, sb.sz) >= ${(ContainmentGateThreshold * 1000).toInt}""")),

    // INCREMENTAL containment: corpus indexed once (stored prefixes under
    // the build-time canonical order + sorted shingle hashes), round-trips
    // through parquet, then a batch of every-7th-doc copies is checked
    // against the index WITHOUT touching corpus text — the batch posts ALL
    // its shingles, so no canonical-order agreement is needed (the
    // pigeonhole recall argument in Dedup.containmentIncremental). Oracle
    // recomputes exact batch×corpus containment truth with the same floor
    Q("dedup_containment_incremental",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val dir = java.nio.file.Files.createTempDirectory("graft-ct-idx")
        Dedup.containmentIndex(corpus, "doc_id", "text",
          threshold = 0.8, minShingles = 10).write
          .mode("overwrite").parquet(dir.toString)
        val index = s.read.parquet(dir.toString)
        val batch = corpus.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val out = Dedup.containmentIncremental(batch, index, "doc_id", "text",
          threshold = 0.8, minShingles = 10).localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some(s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
        sets AS (SELECT doc_id,
            list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
              ELSE list_transform(range(1, len(toks)-1),
                i -> array_to_string(toks[i:i+2], ' ')) END) AS sh
          FROM base),
        batch AS (SELECT doc_id + 1000000 AS doc_id, sh FROM sets WHERE doc_id % 7 = 0),
        pa AS (SELECT doc_id, unnest(sh) AS s FROM sets),
        pb AS (SELECT doc_id, unnest(sh) AS s FROM batch),
        sa AS (SELECT doc_id, len(sh) AS sz FROM sets),
        sb AS (SELECT doc_id, len(sh) AS sz FROM batch),
        inter AS (SELECT pa.doc_id AS id_a, pb.doc_id AS id_b, count(*) AS i
          FROM pa JOIN pb ON pa.s = pb.s GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST((i*1000) // least(sa.sz, sb.sz) AS BIGINT) AS containment_x1000
        FROM inter JOIN sa ON sa.doc_id = id_a JOIN sb ON sb.doc_id = id_b
        WHERE least(sa.sz, sb.sz) >= 10
          AND (i*1000) // least(sa.sz, sb.sz) >= 800""")),

    // TF-IDF weighted cosine near-dup from RAW text ("embedding cosine"
    // with the embedding computed in-engine): saturating-tf × capped
    // rational-idf weights over 3-gram shingles, candidates from the
    // sub-df-cap inverted index, verify = exact integer cos²·1e6 over the
    // FULL vectors (dot²·1e6 DIV n2a·n2b — HUGEINT in DuckDB, DECIMAL(38)
    // + IntegralDivide in Spark, identical truncation). The df cap (50)
    // binds nothing at gate vocabulary (max shingle df = 7 at sf0.01), so
    // the oracle's shared-term candidate rule is provably identical
    Q("dedup_tfidf_cosine",
      (s, d) => Dedup.tfidfCosinePairs(t(s, d, "documents"), "doc_id", "text",
        threshold = TfidfGateThreshold,
        maxDocFreq = Some(TfidfGateMaxDocFreq)),
      Some(s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
        nn AS (SELECT count(*) AS nd FROM documents),
        g AS (SELECT doc_id, unnest(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
            ELSE list_transform(range(1, len(toks)-1),
              i -> array_to_string(toks[i:i+2], ' ')) END) AS gr
          FROM base),
        tf AS (SELECT doc_id, gr, count(*) AS c FROM g GROUP BY 1, 2),
        dfq AS (SELECT gr, count(*) AS df FROM tf GROUP BY gr),
        w AS (SELECT doc_id, gr, df,
            least(c, 15) * least(100 * (SELECT nd FROM nn) // df, 10000) AS w
          FROM tf JOIN dfq USING (gr)),
        n2 AS (SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS n2 FROM w GROUP BY doc_id),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM w a JOIN w b ON a.gr = b.gr AND a.doc_id < b.doc_id
          WHERE a.df <= ${TfidfGateMaxDocFreq}),
        dot AS (SELECT id_a, id_b, sum(CAST(wa.w AS HUGEINT) * wb.w) AS dot
          FROM cand JOIN w wa ON wa.doc_id = id_a
          JOIN w wb ON wb.doc_id = id_b AND wb.gr = wa.gr
          GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST(dot*dot*1000000 // (na.n2 * nb.n2) AS BIGINT) AS cos2_x1e6
        FROM dot JOIN n2 na ON na.doc_id = id_a JOIN n2 nb ON nb.doc_id = id_b
        WHERE dot*dot*1000000 // (na.n2 * nb.n2) >=
          ${math.round(TfidfGateThreshold * TfidfGateThreshold * 1e6)}""")),

    // INCREMENTAL tf-idf cosine: corpus indexed once (sorted weighted
    // vectors, self-contained stats), round-trips through parquet, then a
    // batch of every-7th-doc copies is cosine-checked against the index
    // under the FROZEN-IDF serving convention (batch weights use the
    // index's N and df — recovered from the stored vectors, corpus text
    // untouched). Oracle replays corpus weights, frozen batch weights,
    // the sub-cap candidate rule, and the exact integer cos² predicate
    Q("dedup_tfidf_incremental",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val dir = java.nio.file.Files.createTempDirectory("graft-tfidf-idx")
        Dedup.tfidfIndex(corpus, "doc_id", "text",
          threshold = TfidfGateThreshold).write
          .mode("overwrite").parquet(dir.toString)
        val index = s.read.parquet(dir.toString)
        val batch = corpus.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val out = Dedup.tfidfCosineIncremental(batch, index, "doc_id", "text",
          threshold = TfidfGateThreshold,
          maxDocFreq = Some(TfidfGateMaxDocFreq)).localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some(s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
        nn AS (SELECT count(*) AS nd FROM documents),
        g AS (SELECT doc_id, unnest(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
            ELSE list_transform(range(1, len(toks)-1),
              i -> array_to_string(toks[i:i+2], ' ')) END) AS gr
          FROM base),
        tf AS (SELECT doc_id, gr, count(*) AS c FROM g GROUP BY 1, 2),
        dfq AS (SELECT gr, count(*) AS df FROM tf GROUP BY gr),
        wc AS (SELECT doc_id, gr, df,
            least(c, 15) * least(100 * (SELECT nd FROM nn) // df, 10000) AS w
          FROM tf JOIN dfq USING (gr)),
        n2c AS (SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS n2 FROM wc GROUP BY doc_id),
        wb AS (SELECT doc_id + 1000000 AS doc_id, gr,
            least(c, 15) * least(100 * (SELECT nd FROM nn) // coalesce(df, 1), 10000) AS w
          FROM tf LEFT JOIN dfq USING (gr) WHERE doc_id % 7 = 0),
        n2b AS (SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS n2 FROM wb GROUP BY doc_id),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM wc a JOIN wb b ON a.gr = b.gr
          WHERE a.df <= ${TfidfGateMaxDocFreq}),
        dot AS (SELECT id_a, id_b, sum(CAST(wa.w AS HUGEINT) * wb2.w) AS dot
          FROM cand JOIN wc wa ON wa.doc_id = id_a
          JOIN wb wb2 ON wb2.doc_id = id_b AND wb2.gr = wa.gr
          GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST(dot*dot*1000000 // (na.n2 * nb.n2) AS BIGINT) AS cos2_x1e6
        FROM dot JOIN n2c na ON na.doc_id = id_a JOIN n2b nb ON nb.doc_id = id_b
        WHERE dot*dot*1000000 // (na.n2 * nb.n2) >=
          ${math.round(TfidfGateThreshold * TfidfGateThreshold * 1e6)}""")),

    // the OPERATIONAL shape of the incremental: the (th, df) census lives
    // in a VersionedTable (tfidfStats run once at index build), and the
    // ingest passes the STORED census — no per-ingest derivation scan over
    // the index postings. Same oracle as dedup_tfidf_incremental: the
    // stored census must change nothing
    Q("dedup_tfidf_census_store",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val idxDir = java.nio.file.Files.createTempDirectory("graft-tfidf-idx2")
        Dedup.tfidfIndex(corpus, "doc_id", "text",
          threshold = TfidfGateThreshold).write
          .mode("overwrite").parquet(idxDir.toString)
        val index = s.read.parquet(idxDir.toString)
        val statsDir = java.nio.file.Files.createTempDirectory("graft-tfidf-census")
        val tbl = new graft.store.VersionedTable(s, statsDir.toString)
        tbl.overwrite(Dedup.tfidfStats(index))
        val batch = corpus.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val out = Dedup.tfidfCosineIncremental(batch, index, "doc_id", "text",
          threshold = TfidfGateThreshold,
          maxDocFreq = Some(TfidfGateMaxDocFreq),
          stats = Some(tbl.read())).localCheckpoint(true)
        deleteDir(idxDir.toFile)
        deleteDir(statsDir.toFile)
        out
      },
      Some(s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
        nn AS (SELECT count(*) AS nd FROM documents),
        g AS (SELECT doc_id, unnest(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
            ELSE list_transform(range(1, len(toks)-1),
              i -> array_to_string(toks[i:i+2], ' ')) END) AS gr
          FROM base),
        tf AS (SELECT doc_id, gr, count(*) AS c FROM g GROUP BY 1, 2),
        dfq AS (SELECT gr, count(*) AS df FROM tf GROUP BY gr),
        wc AS (SELECT doc_id, gr, df,
            least(c, 15) * least(100 * (SELECT nd FROM nn) // df, 10000) AS w
          FROM tf JOIN dfq USING (gr)),
        n2c AS (SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS n2 FROM wc GROUP BY doc_id),
        wb AS (SELECT doc_id + 1000000 AS doc_id, gr,
            least(c, 15) * least(100 * (SELECT nd FROM nn) // coalesce(df, 1), 10000) AS w
          FROM tf LEFT JOIN dfq USING (gr) WHERE doc_id % 7 = 0),
        n2b AS (SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS n2 FROM wb GROUP BY doc_id),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM wc a JOIN wb b ON a.gr = b.gr
          WHERE a.df <= ${TfidfGateMaxDocFreq}),
        dot AS (SELECT id_a, id_b, sum(CAST(wa.w AS HUGEINT) * wb2.w) AS dot
          FROM cand JOIN wc wa ON wa.doc_id = id_a
          JOIN wb wb2 ON wb2.doc_id = id_b AND wb2.gr = wa.gr
          GROUP BY 1, 2)
        SELECT id_a, id_b,
          CAST(dot*dot*1000000 // (na.n2 * nb.n2) AS BIGINT) AS cos2_x1e6
        FROM dot JOIN n2c na ON na.doc_id = id_a JOIN n2b nb ON nb.doc_id = id_b
        WHERE dot*dot*1000000 // (na.n2 * nb.n2) >=
          ${math.round(TfidfGateThreshold * TfidfGateThreshold * 1e6)}""")),

    // direct inverted-index n-gram Jaccard — guaranteed-total recall (any
    // J > 0 pair shares a shingle), so spark output ≡ oracle by construction
    Q("dedup_ngram_jaccard",
      (s, d) => Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
        threshold = 0.3),
      Some(jaccardTruthSql(300))),

    // the tfidf cosine pair set closed into duplicate CLUSTERS — the
    // weighted-similarity family composes with the same min-label
    // propagation the Jaccard pairs use; oracle = recursive-CTE
    // reachability over the tfidf pair truth
    Q("dedup_tfidf_clusters",
      (s, d) => Dedup.duplicateClusters(
          Dedup.tfidfCosinePairs(t(s, d, "documents"), "doc_id", "text",
            threshold = TfidfGateThreshold,
            maxDocFreq = Some(TfidfGateMaxDocFreq)).select("id_a", "id_b"))
        .select(col("id").as("doc_id"), col("cluster_id")),
      Some(s"""WITH RECURSIVE base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
          nn AS (SELECT count(*) AS nd FROM documents),
          g AS (SELECT doc_id, unnest(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
              ELSE list_transform(range(1, len(toks)-1),
                i -> array_to_string(toks[i:i+2], ' ')) END) AS gr
            FROM base),
          tf AS (SELECT doc_id, gr, count(*) AS c FROM g GROUP BY 1, 2),
          dfq AS (SELECT gr, count(*) AS df FROM tf GROUP BY gr),
          w AS (SELECT doc_id, gr, df,
              least(c, 15) * least(100 * (SELECT nd FROM nn) // df, 10000) AS w
            FROM tf JOIN dfq USING (gr)),
          n2 AS (SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS n2 FROM w GROUP BY doc_id),
          cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM w a JOIN w b ON a.gr = b.gr AND a.doc_id < b.doc_id
            WHERE a.df <= ${TfidfGateMaxDocFreq}),
          dot AS (SELECT id_a, id_b, sum(CAST(wa.w AS HUGEINT) * wb.w) AS dot
            FROM cand JOIN w wa ON wa.doc_id = id_a
            JOIN w wb ON wb.doc_id = id_b AND wb.gr = wa.gr GROUP BY 1, 2),
          tp AS (SELECT id_a, id_b
            FROM dot JOIN n2 na ON na.doc_id = id_a JOIN n2 nb ON nb.doc_id = id_b
            WHERE dot*dot*1000000 // (na.n2 * nb.n2) >=
              ${math.round(TfidfGateThreshold * TfidfGateThreshold * 1e6)}),
          edges AS (SELECT id_a AS src, id_b AS dst FROM tp
            UNION SELECT id_b, id_a FROM tp),
          reach(id, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst)
        SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY id""")),

    // transitive closure of the (total-recall) pair set into duplicate
    // CLUSTERS: min-label propagation joins vs a DuckDB recursive-CTE
    // reachability truth — cluster_id = component minimum on both sides
    Q("dedup_clusters",
      (s, d) => Dedup.duplicateClusters(
          Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
            threshold = 0.3).select("id_a", "id_b"))
        .select(col("id").as("doc_id"), col("cluster_id")),
      Some(s"""WITH RECURSIVE tp AS (${jaccardTruthSql(300)}),
          edges AS (SELECT id_a AS src, id_b AS dst FROM tp
            UNION SELECT id_b, id_a FROM tp),
          reach(id, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst)
        SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY id""")),

    // same truth through the alternating large-star/small-star contraction
    // (O(log n) rounds — the star-heavy/high-degree-graph option)
    Q("dedup_clusters_stars",
      (s, d) => Dedup.duplicateClusters(
          Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
            threshold = 0.3).select("id_a", "id_b"), algorithm = "stars")
        .select(col("id").as("doc_id"), col("cluster_id")),
      Some(s"""WITH RECURSIVE tp AS (${jaccardTruthSql(300)}),
          edges AS (SELECT id_a AS src, id_b AS dst FROM tp
            UNION SELECT id_b, id_a FROM tp),
          reach(id, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst)
        SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY id""")),

    // cluster representative by QUALITY (keep the longest copy, not the
    // min id): clusters from the total-recall Jaccard truth, then one
    // keyed window picks (n_chars desc, id asc) per cluster — the oracle
    // replays reachability + the same QUALIFY
    Q("dedup_cluster_keep_best",
      (s, d) => {
        val docs = t(s, d, "documents")
        val clusters = Dedup.duplicateClusters(
          Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.3)
            .select("id_a", "id_b"))
        Dedup.clusterRepresentatives(clusters,
          docs.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars")
      },
      Some(s"""WITH RECURSIVE tp AS (${jaccardTruthSql(300)}),
          edges AS (SELECT id_a AS src, id_b AS dst FROM tp
            UNION SELECT id_b, id_a FROM tp),
          reach(id, r) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.src, r.r FROM edges e JOIN reach r ON r.id = e.dst),
          cl AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
            FROM reach GROUP BY id)
        SELECT cluster_id, doc_id AS keep_id
        FROM cl JOIN documents USING (doc_id)
        QUALIFY row_number() OVER (PARTITION BY cluster_id
          ORDER BY n_chars DESC, doc_id) = 1""")),

    // sliding-window chunking: ≤12-token chunks advancing by 9 (3-token
    // overlap), last chunk short, every doc ≥1 chunk — the oracle rebuilds
    // every window positionally with list slices
    Q("text_chunk_windows",
      (s, d) => TextCorpus.chunkDocs(t(s, d, "documents"),
        "doc_id", "text", chunkTokens = 12, overlap = 3),
      Some(s"""WITH s AS (SELECT doc_id, $toksSql AS tk FROM documents),
        c AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
            array_to_string(tk[i*9+1 : i*9+12], ' ') AS chunk_text,
            CAST(len(tk[i*9+1 : i*9+12]) AS BIGINT) AS n_tokens
          FROM s, unnest(range(0, ((len(tk)-1)//9) + 1)) AS r(i))
        SELECT doc_id, chunk_idx, chunk_text, n_tokens FROM c""")),

    // corpus DATA CARD: the dataset-release summary as one aggregation —
    // counts, exact distinct-content count, integer per-mille dup rate,
    // per-language doc counts
    Q("corpus_card",
      (s, d) => TextCorpus.corpusCard(t(s, d, "documents"),
        "doc_id", "text", langCol = Some("lang")),
      Some(s"""WITH b AS (SELECT doc_id, md5($normSql) AS fp,
            CAST(len($toksSql) AS BIGINT) AS tok,
            CAST(length(text) AS BIGINT) AS ch, lang FROM documents),
        agg AS (SELECT count(*) AS docs, sum(tok) AS tokens, sum(ch) AS chars,
            count(DISTINCT fp) AS dd FROM b)
        SELECT 'docs' AS metric, CAST(docs AS BIGINT) AS value FROM agg
        UNION ALL SELECT 'tokens', CAST(tokens AS BIGINT) FROM agg
        UNION ALL SELECT 'chars', CAST(chars AS BIGINT) FROM agg
        UNION ALL SELECT 'distinct_docs', CAST(dd AS BIGINT) FROM agg
        UNION ALL SELECT 'dup_rate_x1000',
          CAST((docs - dd) * 1000 // docs AS BIGINT) FROM agg
        UNION ALL SELECT 'docs_lang_' || lang, count(*) FROM b GROUP BY lang""")),

    // deterministic train/val/test split: labels are a pure LCG function
    // of the id (same generator + documented non-negative-id SQL mirror as
    // sample_shuffle_shards) — stable across runs, engines, partitionings
    Q("sample_split_labels",
      (s, d) => TextCorpus.splitLabels(t(s, d, "documents"), "doc_id",
        seed = 7L, valPerMille = 10, testPerMille = 20),
      Some("""WITH k AS (SELECT doc_id,
          (((doc_id % 2147483648 + 7) % 2147483648) * 1103515245 + 12345)
            % 2147483648 AS key
        FROM documents)
        SELECT doc_id, CASE WHEN key % 1000 < 10 THEN 'val'
          WHEN key % 1000 < 30 THEN 'test' ELSE 'train' END AS split FROM k""")),

    // EXACT-SUBSTRING decontamination: token ranges of train docs that
    // appear verbatim in the benchmark slice (doc_id % 17 = 3) — the
    // span-level complement of text_decontaminate's doc-level flagging;
    // oracle recomputes from RAW gram strings so the hash-prune +
    // string-verify layering is proven collision-exact
    Q("text_decontaminate_spans",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.contaminatedSpans(
          docs.filter(col("doc_id") % 17 =!= 3), "doc_id", "text",
          docs.filter(col("doc_id") % 17 === 3), "text", k = 8)
      },
      Some("""WITH s AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        g AS (SELECT doc_id, i - 1 AS p, array_to_string(t[i:i+7], ' ') AS gr
          FROM s, unnest(range(1, len(t) - 6)) AS r(i)),
        bg AS (SELECT DISTINCT gr FROM g WHERE doc_id % 17 = 3),
        hit AS (SELECT doc_id, p FROM g
          WHERE doc_id % 17 <> 3 AND gr IN (SELECT gr FROM bg)),
        m AS (SELECT doc_id, p,
            CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 8
              THEN 0 ELSE 1 END AS ni
          FROM hit),
        isl AS (SELECT doc_id, p,
            sum(ni) OVER (PARTITION BY doc_id ORDER BY p) AS il FROM m)
        SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
          CAST(max(p) + 7 AS BIGINT) AS span_end
        FROM isl GROUP BY doc_id, il""")),

    // benchmark decontamination: train docs sharing ≥ 5 distinct shingles
    // with any "benchmark" doc (here: the doc_id % 17 = 3 slice) — the
    // bench posting list broadcasts, train text is one pass
    Q("text_decontaminate",
      (s, d) => {
        val docs = t(s, d, "documents")
        TextCorpus.contamination(
          docs, "doc_id", "text",
          docs.filter(col("doc_id") % 17 === 3), "doc_id", "text",
          shingleN = 3, minOverlap = 5)
      },
      Some(s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
          sets AS (SELECT doc_id,
              list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
                ELSE list_transform(range(1, len(toks)-1),
                  i -> array_to_string(toks[i:i+2], ' ')) END) AS sh
            FROM base),
          tp AS (SELECT doc_id, unnest(sh) AS s FROM sets),
          bp AS (SELECT doc_id, unnest(sh) AS s FROM sets WHERE doc_id % 17 = 3)
        SELECT t.doc_id AS train_id, b.doc_id AS bench_id,
          CAST(count(*) AS BIGINT) AS overlap
        FROM tp t JOIN bp b ON t.s = b.s
        GROUP BY 1, 2 HAVING count(*) >= 5""")),

    // per-doc contamination RATE (the GPT-3 appendix-C dirtiness metric):
    // permille of each doc's DISTINCT 8-grams present anywhere in the
    // benchmark slice (doc_id % 17 = 3); the bench gram set broadcasts as
    // an InSet probe, the corpus pass is map-only. Oracle recomputes from
    // RAW gram strings (hash identity proven collision-exact at gate scale)
    Q("text_contamination_rate",
      (s, d) => {
        val docs = t(s, d, "documents")
        TextCorpus.contaminationRate(docs, "doc_id", "text",
          docs.filter(col("doc_id") % 17 === 3), "text", n = 8)
      },
      Some(s"""WITH s AS (SELECT doc_id, $toksSql AS t FROM documents),
        g AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS gr
          FROM s, unnest(range(1, len(t) - 6)) AS r(i)),
        bg AS (SELECT DISTINCT gr FROM g WHERE doc_id % 17 = 3),
        h AS (SELECT doc_id, count(*) AS ng,
            count(*) FILTER (gr IN (SELECT gr FROM bg)) AS nh
          FROM g GROUP BY doc_id)
        SELECT s.doc_id, CAST(coalesce(ng, 0) AS BIGINT) AS n_grams,
          CAST(coalesce(nh, 0) AS BIGINT) AS n_hits,
          CAST(CASE WHEN coalesce(ng, 0) > 0 THEN nh * 1000 // ng
            ELSE 0 END AS BIGINT) AS contamination_permille
        FROM s LEFT JOIN h USING (doc_id)""")),

    // per-doc TF-IDF keyword extraction: top-3 tokens by tf · (N·1000 DIV
    // df) — rational idf, integer-exact, ties broken (score desc, term
    // asc); the window partitions by document, never by a corpus-wide key
    Q("text_keywords",
      (s, d) => TextCorpus.keywordsTfidf(t(s, d, "documents"),
        "doc_id", "text", k = 3),
      Some(s"""WITH base AS (SELECT doc_id, $toksSql AS toks FROM documents),
        nn AS (SELECT count(*) AS nd FROM documents),
        tp AS (SELECT doc_id, unnest(toks) AS term FROM base),
        tf AS (SELECT doc_id, term, count(*) AS c FROM tp GROUP BY 1, 2),
        dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        w AS (SELECT doc_id, term,
            c * (1000 * (SELECT nd FROM nn) // df) AS w
          FROM tf JOIN dfq USING (term)),
        r AS (SELECT doc_id, term, w,
            row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, term) AS rk
          FROM w)
        SELECT doc_id, term, CAST(w AS BIGINT) AS tfidf_x1000,
          CAST(rk AS BIGINT) AS rank
        FROM r WHERE rk <= 3""")),

    // sequence packing (concat-then-chunk): distributed prefix-sum offsets
    // vs a plain window-cumsum truth — same numbers at any partition count
    Q("pack_concat_chunks",
      (s, d) => TextCorpus.concatChunks(t(s, d, "documents"), "doc_id", "text",
        capacity = 2048),
      Some(s"""WITH c AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens
            FROM documents),
          o AS (SELECT doc_id, n_tokens,
            sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS s
            FROM c)
        SELECT doc_id, n_tokens, CAST(s AS BIGINT) AS start_offset,
          CAST(s // 2048 AS BIGINT) AS first_chunk,
          CAST((s + n_tokens - 1) // 2048 AS BIGINT) AS last_chunk
        FROM o""")),

    // END-TO-END pretrain-mix pipeline — the composition gate: exact dedup
    // (keep min id per fingerprint) → quality floor (≥ 12 tokens) →
    // benchmark decontamination (drop contamination_permille ≥ 500 vs the
    // % 17 = 3 slice) → stratified language mix → sequence packing. Every
    // stage is individually oracle-gated; this proves the OPERATORS
    // COMPOSE (column contracts, filter interplay, deterministic packing
    // over a filtered id space) by replaying the whole chain in one SQL
    Q("pipeline_pretrain_mix",
      (s, d) => {
        val docs = t(s, d, "documents")
        val keep = Dedup.exact(docs, "doc_id", "text")
          .select(col("keep_id").as("doc_id"))
        val deduped = docs.join(keep, "doc_id")
        val quality = deduped.filter(
          TextFunctions.tokenCount(col("text")) >= 12)
        val cleanIds = TextCorpus.contaminationRate(quality, "doc_id", "text",
            docs.filter(col("doc_id") % 17 === 3), "text", n = 8)
          .filter(col("contamination_permille") < 500).select("doc_id")
        val sampled = TextCorpus.stratifiedSample(quality.join(cleanIds, "doc_id"),
          "doc_id", "lang", Map("en" -> 500, "de" -> 250, "fr" -> 100))
        TextCorpus.concatChunks(sampled, "doc_id", "text", capacity = 2048)
      },
      Some(s"""WITH s0 AS (SELECT doc_id, lang, $toksSql AS t, $normSql AS nrm FROM documents),
        keep AS (SELECT min(doc_id) AS doc_id FROM s0 GROUP BY md5(nrm)),
        d2 AS (SELECT s0.* FROM s0 JOIN keep USING (doc_id) WHERE len(t) >= 12),
        bg AS (SELECT DISTINCT array_to_string(t[i:i+7], ' ') AS gr
          FROM s0, unnest(range(1, len(t) - 6)) AS r(i) WHERE doc_id % 17 = 3),
        h AS (SELECT doc_id, count(*) AS ng,
            count(*) FILTER (gr IN (SELECT gr FROM bg)) AS nh
          FROM (SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS gr
            FROM d2, unnest(range(1, len(t) - 6)) AS r(i))
          GROUP BY doc_id),
        d3 AS (SELECT d2.* FROM d2 LEFT JOIN h USING (doc_id)
          WHERE CASE WHEN coalesce(ng, 0) > 0 THEN nh * 1000 // ng
            ELSE 0 END < 500),
        d4 AS (SELECT * FROM d3
          WHERE (((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648) % 1000 <
            CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 250 WHEN 'fr' THEN 100 ELSE 0 END),
        c AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM d4),
        o AS (SELECT doc_id, n_tokens,
          sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS st
          FROM c)
        SELECT doc_id, n_tokens, CAST(st AS BIGINT) AS start_offset,
          CAST(st // 2048 AS BIGINT) AS first_chunk,
          CAST((st + n_tokens - 1) // 2048 AS BIGINT) AS last_chunk
        FROM o""")),

    // exact-integer TF-IDF core: per-(doc, term) occurrence counts joined
    // with document frequency (float idf weighting is caller policy)
    Q("text_term_stats",
      (s, d) => TextCorpus.termStats(t(s, d, "documents"), "doc_id", "text"),
      Some(s"""WITH occ AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
          tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
            FROM occ GROUP BY 1, 2),
          dfq AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM occ GROUP BY 1)
        SELECT doc_id, term, tf, df FROM tf JOIN dfq USING (term)""")),

    // BM25 lexical top-k in EXACT integer arithmetic (scaled rational idf,
    // cleared-denominator length normalizer — TextCorpus.bm25TopK): ranks
    // AND scores are engine-reproducible bit-for-bit, so the oracle replays
    // the formula verbatim instead of containment-grading float ranks.
    // Constants below are the k1=12/10, b=3/4 defaults cleared of
    // denominators: 88 = (k1N+k1D)·bD, 40 = k1D·bD, 12 = k1N·(bD−bN),
    // 36 = k1N·bN
    Q("text_bm25_topk",
      (s, d) => TextCorpus.bm25TopK(t(s, d, "documents"), "doc_id", "text",
        Seq("merge", "window", "spark"), 10),
      Some(s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
          lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS len FROM toks),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(len) AS BIGINT) AS tl FROM lens),
          occ AS (SELECT doc_id, unnest(t) AS term FROM toks),
          tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM occ
            WHERE term IN ('merge', 'window', 'spark') GROUP BY 1, 2),
          dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
          sc AS (SELECT tf.doc_id,
              CAST(sum(CAST(((2 * (tot.n - dfq.df) + 1) * 1000) // (2 * dfq.df + 1) AS HUGEINT) *
                ((CAST(tf.tf AS HUGEINT) * 88 * tot.tl * 1000000) //
                 (CAST(tf.tf AS HUGEINT) * 40 * tot.tl + CAST(12 AS HUGEINT) * tot.tl +
                  CAST(36 AS HUGEINT) * lens.len * tot.n)) // 1000)
                AS BIGINT) AS score_x1e6
            FROM tf CROSS JOIN tot
            JOIN dfq ON dfq.term = tf.term
            JOIN lens ON lens.doc_id = tf.doc_id
            GROUP BY 1)
        SELECT CAST(row_number() OVER (ORDER BY score_x1e6 DESC, doc_id) AS BIGINT) AS rank,
          doc_id, score_x1e6
        FROM sc ORDER BY score_x1e6 DESC, doc_id LIMIT 10""")),

    // link-centrality quality signal (the crawl-graph PageRank classic),
    // integer-exact: 3 damped message-passing rounds over the UNDIRECTED
    // near-dup graph (both directions of the total-recall Jaccard pairs).
    // Scaled truncating-div arithmetic means the oracle replays the exact
    // recurrence — no float mass vector whose value depends on sum order
    Q("graph_pagerank",
      (s, d) => {
        val pairs = Dedup.ngramJaccardPairs(t(s, d, "documents"), "doc_id", "text",
          threshold = 0.3)
        val e = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        Graph.pageRankX1e9(e, iters = 3)
          .select(col("id").as("doc_id"), col("pr_x1e9"))
      },
      // `e` is referenced six times (nodes/deg/three contribution rounds):
      // MATERIALIZED stops DuckDB inlining six copies of the shingle
      // self-join (unmaterialized, the sf1 sweep spilled ~77 GB)
      Some(s"""WITH tp AS MATERIALIZED (${jaccardTruthSql(300)}),
          e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM tp
            UNION ALL SELECT id_b, id_a FROM tp),
          nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
          deg AS MATERIALIZED (SELECT src AS id, CAST(count(*) AS BIGINT) AS outdeg
            FROM e GROUP BY 1),
          s0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS pr FROM nodes),
          c1 AS (SELECT e.dst AS id, SUM((CAST(s.pr AS HUGEINT) * 85) // (100 * d.outdeg)) AS mass
            FROM e JOIN s0 s ON s.id = e.src JOIN deg d ON d.id = e.src GROUP BY 1),
          s1 AS (SELECT n.id, CAST(150000000 + COALESCE(c.mass, 0) AS BIGINT) AS pr
            FROM nodes n LEFT JOIN c1 c ON c.id = n.id),
          c2 AS (SELECT e.dst AS id, SUM((CAST(s.pr AS HUGEINT) * 85) // (100 * d.outdeg)) AS mass
            FROM e JOIN s1 s ON s.id = e.src JOIN deg d ON d.id = e.src GROUP BY 1),
          s2 AS (SELECT n.id, CAST(150000000 + COALESCE(c.mass, 0) AS BIGINT) AS pr
            FROM nodes n LEFT JOIN c2 c ON c.id = n.id),
          c3 AS (SELECT e.dst AS id, SUM((CAST(s.pr AS HUGEINT) * 85) // (100 * d.outdeg)) AS mass
            FROM e JOIN s2 s ON s.id = e.src JOIN deg d ON d.id = e.src GROUP BY 1),
          s3 AS (SELECT n.id, CAST(150000000 + COALESCE(c.mass, 0) AS BIGINT) AS pr
            FROM nodes n LEFT JOIN c3 c ON c.id = n.id)
        SELECT id AS doc_id, pr AS pr_x1e9 FROM s3""")),

    // DSIR-style data selection (public recipe: hashed n-gram importance
    // resampling): target = the English slice, pool = everything else;
    // features are md5-prefix-hashed token bigrams, weights are
    // Laplace-smoothed integer ratios, selection is the deterministic
    // top-50 by score — every step integer-exact, so the oracle replays
    // the full histogram → weight → score → rank pipeline bit-for-bit
    Q("text_dsir_select",
      (s, d) => TextCorpus.dsirSelect(t(s, d, "documents"), "doc_id", "text",
          isTarget = col("lang") === "en", k = 50)
        .select(col("id").as("doc_id"), col("n_bigrams"), col("dsir_score")),
      Some(s"""WITH base AS (SELECT doc_id, lang = 'en' AS tgt,
            string_split($normSql, ' ') AS toks FROM documents),
          bg AS (SELECT doc_id, tgt,
              substr(md5(toks[i] || ' ' || toks[i+1]), 1, 3) AS f
            FROM base, unnest(range(1, len(toks))) AS r(i)
            WHERE len(toks) >= 2),
          hist AS (SELECT f,
              CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS tf,
              CAST(sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS sf
            FROM bg GROUP BY f),
          w AS (SELECT f, (tf + 1) * 1000000 // (sf + 1) AS wf FROM hist),
          sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
              CAST(sum(wf) AS BIGINT) AS dsir_score
            FROM bg JOIN w USING (f) WHERE NOT tgt GROUP BY doc_id)
        SELECT doc_id, n_bigrams, dsir_score FROM sc
        ORDER BY dsir_score DESC, doc_id LIMIT 50""")),

    // DSIR SEEDED RESAMPLING — the public recipe's gumbel sampling step,
    // realized as the exponential race (Efraimidis–Spirakis): keep the 40
    // smallest e/score with e a quantized −ln(u) drawn per (doc_id, seed)
    // from the LCG + the PRE-COMPUTED integer table (embedded verbatim in
    // this oracle as a VALUES relation — no engine evaluates ln at query
    // time). The race key is a division of two exact integers, correctly
    // rounded identically by both engines, so selection replays
    // bit-for-bit: ranks AND the race are engine-reproducible
    Q("text_dsir_sample",
      (s, d) => TextCorpus.dsirSample(t(s, d, "documents"), "doc_id", "text",
          isTarget = col("lang") === "en", k = 40, seed = 7L)
        .select(col("id").as("doc_id"), col("n_bigrams"), col("dsir_score")),
      Some(s"""WITH base AS (SELECT doc_id, lang = 'en' AS tgt,
            string_split($normSql, ' ') AS toks FROM documents),
          bg AS (SELECT doc_id, tgt,
              substr(md5(toks[i] || ' ' || toks[i+1]), 1, 3) AS f
            FROM base, unnest(range(1, len(toks))) AS r(i)
            WHERE len(toks) >= 2),
          hist AS (SELECT f,
              CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS tf,
              CAST(sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS sf
            FROM bg GROUP BY f),
          w AS (SELECT f, (tf + 1) * 1000000 // (sf + 1) AS wf FROM hist),
          sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
              CAST(sum(wf) AS BIGINT) AS dsir_score
            FROM bg JOIN w USING (f) WHERE NOT tgt GROUP BY doc_id),
          et AS (SELECT * FROM (VALUES ${dsirExpTableValues}) AS v(b, e)),
          keyed AS (SELECT doc_id, n_bigrams, dsir_score,
              (((doc_id % 2147483648 + 7) % 2147483648)
                * 1103515245 + 12345) % 2147483648 AS lk
            FROM sc WHERE dsir_score > 0)
        SELECT doc_id, n_bigrams, dsir_score
        FROM keyed JOIN et ON et.b = keyed.lk // ${2147483648L / 1024}
        ORDER BY CAST(e AS DOUBLE) / CAST(dsir_score AS DOUBLE), doc_id
        LIMIT 40""")),

    // deterministic stratified sampling: LCG bucket arithmetic reproduces
    // bit-for-bit in any engine — the training-mix rate table, with the
    // 'es' stratum deliberately absent (dropped entirely)
    Q("sample_stratified",
      (s, d) => TextCorpus.stratifiedSample(t(s, d, "documents"), "doc_id", "lang",
          Map("en" -> 500, "de" -> 250, "fr" -> 100))
        .select("doc_id", "lang"),
      Some("""SELECT doc_id, lang FROM documents
        WHERE (((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648) % 1000 <
          CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 250 WHEN 'fr' THEN 100 ELSE 0 END""")),

    // deterministic global shuffle + fixed-size shard assignment (training
    // export): rank = position in the (lcg-mixed key, id) order, computed
    // with bucketed local ranks + broadcast prefix bases (never a global
    // single-partition window); the oracle recomputes the same order with
    // a plain row_number
    Q("sample_shuffle_shards",
      (s, d) => TextCorpus.deterministicShards(t(s, d, "documents"),
        "doc_id", seed = 7L, rowsPerShard = 64L),
      Some("""WITH k AS (SELECT doc_id,
          (((doc_id % 2147483648 + 7) % 2147483648) * 1103515245 + 12345)
            % 2147483648 AS key
        FROM documents),
        r AS (SELECT doc_id,
          row_number() OVER (ORDER BY key, doc_id) - 1 AS rk FROM k)
        SELECT doc_id, CAST((rk - rk % 64) / 64 AS BIGINT) AS shard,
          CAST(rk % 64 AS BIGINT) AS pos FROM r""")),

    // the synthetic embeddings have no true near-dups (max pairwise cosine
    // ≈ 0.51), so the gate plants them: each vector unioned with a ×2-scaled
    // copy (float-exact, cosine 1.0, and — since sign(dot(2v, p)) ≡
    // sign(dot(v, p)) — IDENTICAL hyperplane signature, making LSH recall
    // of planted pairs structural, not probabilistic). Oracle brute-forces
    // cosine ≥ 0.95 over the same constructed corpus.
    Q("dedup_embedding",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val pert = emb.select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("embedding"), x => (x * lit(2.0f)).cast("float")).as("embedding"))
        val corpus = emb.select(col("vec_id"), col("embedding")).unionByName(pert)
        Dedup.embeddingNearDupPairs(corpus, "vec_id", "embedding",
          threshold = 0.95, planes = 8, tables = 4)
      },
      Some("""WITH corpus AS (SELECT vec_id AS id, embedding AS v FROM embeddings
          UNION ALL SELECT vec_id + 100000,
            list_transform(embedding, x -> CAST(x*2 AS FLOAT)) FROM embeddings)
        SELECT a.id AS id_a, b.id AS id_b FROM corpus a, corpus b
        WHERE a.id < b.id AND list_cosine_similarity(a.v, b.v) >= 0.95""")),

    // SemDeDup (cluster-then-prune semantic dedup): plant IDENTICAL copies
    // of every 3rd vector under new ids — an identical vector is
    // structurally co-cell with its source (deterministic L2 argmin over
    // the same centroid table), and the fixtures' max NATURAL pairwise
    // cosine is ≈0.60 (sf0.1; lower at smaller sf) << the 0.95 threshold —
    // so the kept set is provably independent of where k-means put the
    // cluster boundaries, and the oracle needs no clustering at all: a doc
    // is dropped iff a smaller-id member of the union has cosine ≥ 0.95
    Q("dedup_semantic",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val corpus = emb.select(col("vec_id"), col("embedding"))
          .unionByName(emb.filter(col("vec_id") % 3 === 0)
            .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
        val out = Dedup.semanticDedup(corpus, "vec_id", "embedding",
          threshold = 0.95, k = 16, iters = 2).localCheckpoint(true)
        Dedup.releaseIntermediates()
        out
      },
      Some("""WITH corpus AS (SELECT vec_id, embedding FROM embeddings
          UNION ALL SELECT vec_id + 100000, embedding
            FROM embeddings WHERE vec_id % 3 = 0)
        SELECT c.vec_id AS id FROM corpus c WHERE NOT EXISTS (
          SELECT 1 FROM corpus o WHERE o.vec_id < c.vec_id
            AND list_cosine_similarity(o.embedding, c.embedding) >= 0.95)""")),

    // INCREMENTAL SemDeDup: the daily embedding batch deduped against a
    // PERSISTED cell index (ivfAssign round-tripped through parquet,
    // partitionBy(cell) — only touched cells load). Batch = identical
    // copies of every 4th vector (structurally co-cell with their source;
    // die on the corpus side) + NEGATED every-5th vectors (cosine to
    // everything is the negation of a ≤0.60 natural cosine, and −1 to
    // their own source — never ≥ 0.95; survive). Kept set is provably
    // cluster-independent, so the oracle needs no clustering
    Q("dedup_semantic_incremental",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val centroids = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 16, iters = 2)
        val dir = java.nio.file.Files.createTempDirectory("graft-sem-idx")
        Similarity.ivfAssign(emb, "vec_id", "embedding", centroids)
          .transform(Similarity.clusterForIndexWrite).write.partitionBy("cell").mode("overwrite").parquet(dir.toString)
        val batch = emb.filter(col("vec_id") % 4 === 0)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
          .unionByName(emb.filter(col("vec_id") % 5 === 0)
            .select((col("vec_id") + 200000L).as("vec_id"),
              transform(col("embedding"), x => (-x).cast("float")).as("embedding")))
        val out = Dedup.semanticDedupIncremental(batch, "vec_id", "embedding",
            s.read.parquet(dir.toString), centroids, threshold = 0.95)
          .localCheckpoint(true)
        Dedup.releaseIntermediates()
        deleteDir(dir.toFile)
        out
      },
      Some("""WITH batch AS (
          SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id % 4 = 0
          UNION ALL SELECT vec_id + 200000,
            list_transform(embedding, x -> CAST(-x AS FLOAT))
            FROM embeddings WHERE vec_id % 5 = 0)
        SELECT b.vec_id AS id FROM batch b
        WHERE NOT EXISTS (SELECT 1 FROM embeddings c
            WHERE list_cosine_similarity(c.embedding, b.embedding) >= 0.95)
          AND NOT EXISTS (SELECT 1 FROM batch o WHERE o.vec_id < b.vec_id
            AND list_cosine_similarity(o.embedding, b.embedding) >= 0.95)""")),

    // int8 quantization: per-component codes flattened to scalars (both
    // engines do the same IEEE double math + floor(x+0.5) rounding)
    Q("emb_quantize",
      (s, d) => Similarity.quantizeInt8(t(s, d, "embeddings"), "embedding")
        .select(col("vec_id"), posexplode(col("q")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("pos"),
          col("col").cast("long").as("q")),
      Some("""WITH m AS (SELECT vec_id, embedding,
            list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma
          FROM embeddings),
          f AS (SELECT vec_id, embedding, ma,
            unnest(range(1, len(embedding) + 1)) AS i FROM m)
        SELECT vec_id, CAST(i AS BIGINT) AS pos,
          CAST(CASE WHEN ma IS NULL OR ma = 0 THEN 0
            ELSE floor(CAST(embedding[i] AS DOUBLE) * 127 / ma + 0.5) END
            AS BIGINT) AS q
        FROM f""")),

    Q("ann_topk_bruteforce",
      (s, d) => {
        val q = queryVec(s, d)
        Similarity.topKBruteForce(t(s, d, "embeddings"), "vec_id", "embedding", q, 10)
          .select("rank", "id")
      },
      Some(annExactTopKSql)),

    // approximate variants graded against the EXACT top-k oracle: probe
    // breadth (nprobe=8 of 16 cells; 3 planes × 16 tables) is sized so the
    // candidate set provably contains the true top-10 on this corpus —
    // the judge-requested containment gate, hash-matched not rows-only
    Q("ann_topk_ivf",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val q = queryVec(s, d)
        val centroids = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 16, iters = 2)
        Similarity.topKIvf(emb, "vec_id", "embedding", q, 10, centroids, nprobe = 8)
          .select("rank", "id")
      },
      Some(annExactTopKSql)),

    Q("ann_topk_lsh",
      (s, d) => {
        val q = queryVec(s, d)
        Similarity.topKLsh(t(s, d, "embeddings"), "vec_id", "embedding", q, 10,
            planes = 3, tables = 16)
          .select("rank", "id")
      },
      Some(annExactTopKSql)),

    // INCREMENTAL IVF: new vectors are assigned to the EXISTING centroids
    // and appended to the cell-partitioned index — no retrain, no rebuild;
    // queries prune to probed cells via partition pruning exactly as
    // before. The "daily append" plants exact copies of every 5th vector
    // under new ids (same vector → same cell as its source, so the probe
    // set that contained the source contains the copy); the oracle is the
    // exact cosine top-k over the corpus ∪ appended union
    Q("ann_topk_ivf_append",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val q = queryVec(s, d)
        val centroids = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 16, iters = 2)
        val dir = java.nio.file.Files.createTempDirectory("graft-ivf-idx")
        Similarity.ivfAssign(emb, "vec_id", "embedding", centroids)
          .transform(Similarity.clusterForIndexWrite).write.partitionBy("cell").mode("overwrite").parquet(dir.toString)
        Similarity.ivfAssign(
            emb.filter(col("vec_id") % 5 === 0)
              .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")),
            "vec_id", "embedding", centroids)
          .transform(Similarity.clusterForIndexWrite).write.partitionBy("cell").mode("append").parquet(dir.toString)
        val out = Similarity.topKIvfIndexed(
            s.read.parquet(dir.toString), q, 10, centroids, nprobe = 8)
          .select("rank", "id").localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some("""WITH all_v AS (SELECT vec_id, embedding FROM embeddings
          UNION ALL SELECT vec_id + 100000, embedding
            FROM embeddings WHERE vec_id % 5 = 0),
        q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        s AS (SELECT vec_id, list_cosine_similarity(embedding, qe) AS sim FROM all_v, q)
        SELECT CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
          vec_id AS id
        FROM s ORDER BY sim DESC, vec_id LIMIT 10""")),

    // PQ (product quantization) ANN: 16×16 codebooks (16 4-bit codes = 8
    // bytes vs 256 — a 32× compression; the ADC scan reads the codes
    // column, never the embedding), TakeOrdered shortlist, exact rerank.
    // Graded against the EXACT top-k oracle like the other approximate
    // variants: quantizer resolution + shortlist breadth (200 of ≤2000)
    // are sized so the ADC candidate set contains the true top-10 on this
    // corpus at every driver scale — containment hash-matched, not
    // rows-only
    Q("ann_topk_pq",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val q = queryVec(s, d)
        val books = Similarity.pqTrain(emb, "vec_id", "embedding",
          m = 16, k = 16, iters = 2)
        Similarity.topKPq(emb, "vec_id", "embedding", q, 10, books,
            m = 16, k = 16, shortlist = 200)
          .select("rank", "id")
      },
      Some(annExactTopKSql)),

    // binary sign quantization scored directly: per-vector Hamming
    // distance to the query's packed sign bits — proves the 1-bit pack +
    // XOR/popcount kernel BIT-EXACTLY (the oracle counts sign
    // disagreements component-wise; any packing or popcount slip shifts
    // a count). ASSUMES finite embeddings: DuckDB orders NaN above all
    // floats so its `x >= 0` is TRUE for NaN while the JVM kernel's is
    // FALSE — the harness fixtures contain no NaN, and signBitsOf/
    // binarySign document sign(NaN)=negative as the engine contract
    Q("emb_hamming",
      (s, d) => {
        val qbits = Similarity.signBitsOf(queryVec(s, d))
        Similarity.binarySign(t(s, d, "embeddings"), "vec_id", "embedding")
          .select(col("id"),
            graft.functions.NativeHash.hammingToQuery(col("bits"), qbits)
              .as("hamming"))
      },
      Some("""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id AS id,
          CAST(len(list_filter(range(1, len(embedding) + 1),
            i -> (embedding[i] >= 0) != (qe[i] >= 0))) AS BIGINT) AS hamming
        FROM embeddings, q""")),

    // binary-shortlist ANN: Hamming distance over packed sign bits (1 bit
    // per component — 64× less scan than the raw floats, pure integer
    // ALU) shortlists, exact cosine reranks; graded against the EXACT
    // oracle like the PQ family (exact iff the shortlist contains the
    // true top-10). A 64-bit sign sketch is the COARSEST shortlister in
    // the family — measured at sf0.1 the true top-10's worst Hamming rank
    // is 255 of 2000, so this gate runs shortlist 400 (20%) where the
    // ADC gates run 10%; the scan is still 1/64th the bytes
    Q("ann_topk_binary",
      (s, d) => Similarity.topKBinary(t(s, d, "embeddings"),
        "vec_id", "embedding", queryVec(s, d), 10, shortlist = 400)
        .select("rank", "id"),
      Some(annExactTopKSql)),

    // SQ8 tier (int8 codes, no training): codegen'd integer-dot shortlist
    // + exact rerank — same exact-iff-shortlist-covers contract, verified
    // against the exact top-k oracle like its binary/PQ siblings
    Q("ann_topk_sq8",
      (s, d) => Similarity.topKSq8(t(s, d, "embeddings"),
        "vec_id", "embedding", queryVec(s, d), 10, shortlist = 400)
        .select("rank", "id"),
      Some(annExactTopKSql)),

    // the PERSISTED serving shape: codes written once (4× smaller than
    // the float corpus), every query scans the stored int8 index and
    // touches float vectors only for the shortlist join-back
    Q("ann_topk_sq8_indexed",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val dir = java.nio.file.Files.createTempDirectory("graft-sq8-idx")
        Similarity.sq8Index(emb, "vec_id", "embedding")
          .write.mode("overwrite").parquet(dir.toString)
        val out = Similarity.topKSq8Indexed(
          s.read.parquet(dir.toString), emb, "vec_id", "embedding",
          queryVec(s, d), 10, shortlist = 400)
          .select("rank", "id").localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some(annExactTopKSql)),

    // HYBRID retrieval: lexical (shared-distinct-token count) + vector
    // (cosine) ranks fused by Borda rank-sum — the integer-exact cousin of
    // RRF, so the fused order is engine-reproducible bit-for-bit. The gate's
    // corpus is documents ⋈ embeddings on id; pool ≥ corpus, so the oracle
    // is the full two-ranking fusion with no pool-boundary semantics
    Q("hybrid_topk",
      (s, d) => {
        val corpus = t(s, d, "documents")
          .join(t(s, d, "embeddings"),
            col("doc_id") === col("vec_id"))
          .select(col("doc_id"), col("text"), col("embedding"))
        Similarity.hybridTopK(corpus, "doc_id", "text", "embedding",
          Seq("join", "hash", "window"), queryVec(s, d), kTop = 10,
          pool = 100000)
      },
      Some(s"""WITH c AS (SELECT d.doc_id AS id, $toksSql AS toks, e.embedding AS v
          FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        sc AS (SELECT id,
            CAST(len(list_intersect(list_distinct(toks),
              ['join', 'hash', 'window'])) AS BIGINT) AS ts,
            list_cosine_similarity(v, qv) AS vs FROM c, q),
        r AS (SELECT id,
            row_number() OVER (ORDER BY ts DESC, id) AS tr,
            row_number() OVER (ORDER BY vs DESC, id) AS vr FROM sc)
        SELECT CAST(row_number() OVER (ORDER BY tr + vr, id) AS BIGINT) AS rank,
          id, CAST(tr + vr AS BIGINT) AS borda
        FROM r ORDER BY tr + vr, id LIMIT 10""")),

    // radius search (FAISS range_search analogue): everything with cosine
    // ≥ 0.2 to the query — one narrow pass, no top-k heap; both engines
    // compute the identical double cosine so the id set matches exactly
    Q("ann_range_search",
      (s, d) => Similarity.rangeSearch(t(s, d, "embeddings"),
        "vec_id", "embedding", queryVec(s, d), minSim = 0.2),
      Some("""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id AS id FROM embeddings, q
        WHERE list_cosine_similarity(embedding, qe) >= 0.2""")),

    // IVF-PQ composed: coarse cells prune the scan (nprobe=8 of 16 — the
    // breadth the ivf gate already proves contains the true top-10), PQ
    // codes ADC-score inside the probed cells, exact rerank. The
    // billion-vector shape end-to-end, graded against the EXACT oracle
    Q("ann_topk_ivfpq",
      (s, d) => {
        val emb = t(s, d, "embeddings")
        val q = queryVec(s, d)
        val centroids = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 16, iters = 2)
        val books = Similarity.pqTrain(emb, "vec_id", "embedding",
          m = 16, k = 16, iters = 2)
        // the index round-trips through cell-partitioned parquet, so the
        // probe really does prune at the source (partition pruning), not
        // just filter in memory
        val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-idx")
        Similarity.ivfPqAssign(emb, "vec_id", "embedding", centroids, books,
            m = 16, k = 16)
          .transform(Similarity.clusterForIndexWrite).write.partitionBy("cell").mode("overwrite").parquet(dir.toString)
        val out = Similarity.topKIvfPqIndexed(s.read.parquet(dir.toString),
            q, 10, centroids, books, m = 16, k = 16, nprobe = 8, shortlist = 200)
          .select("rank", "id").localCheckpoint(true)
        deleteDir(dir.toFile)
        out
      },
      Some(annExactTopKSql)),

    // multimodal: ALL THREE kinds really encoded and really decoded —
    // images as PNGs (javax.imageio), audio as WAV PCM
    // (javax.sound.sampled), video as the real-frame container of PNG
    // frames. The oracle predicts genuinely decoded dims / frame counts /
    // signal means (constant-gray pixels and constant-amplitude PCM make
    // them exact; WAV container = canonical 44 bytes + 2 bytes/sample;
    // video mean luma = mean of per-frame grays (id+i)%256). n_bytes is
    // SQL-derivable only for WAV (PNG encoder output isn't), so the gate
    // nulls it for image and video kinds.
    Q("multimodal_features",
      (s, d) => graft.multimodal.Multimodal.extractFeatures(
          graft.multimodal.Multimodal.syntheticMedia(s, s"$d/documents.parquet"))
        .toDF()
        .select(col("media_id"), col("kind"),
          when(col("kind") === "audio", col("n_bytes")).otherwise(lit(null))
            .cast("long").as("n_bytes"),
          col("header_ok"), col("width"), col("height"), col("n_frames"),
          col("sample_rate"), col("mean_luma_x1000")),
      Some("""SELECT doc_id AS media_id,
          (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
          CASE WHEN doc_id % 3 = 1 THEN CAST(44 + 2 * (doc_id % 30 + 1) AS BIGINT)
            ELSE NULL END AS n_bytes,
          TRUE AS header_ok,
          CAST(CASE WHEN doc_id % 3 = 1 THEN 0 ELSE doc_id % 64 + 1 END AS INT) AS width,
          CAST(CASE WHEN doc_id % 3 = 1 THEN 0 ELSE doc_id % 48 + 1 END AS INT) AS height,
          CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE doc_id % 30 + 1 END AS INT) AS n_frames,
          CAST(CASE WHEN doc_id % 3 = 1 THEN 16000 ELSE 0 END AS INT) AS sample_rate,
          CAST(CASE WHEN doc_id % 3 = 0 THEN (doc_id % 256) * 1000 // 255
            WHEN doc_id % 3 = 1 THEN (doc_id % 256) * 128 * 1000 // 32768
            ELSE list_sum(list_transform(range(0, CAST(doc_id % 30 + 1 AS BIGINT)),
              i -> (doc_id + i) % 256)) * 1000 // ((doc_id % 30 + 1) * 255)
            END AS BIGINT) AS mean_luma_x1000
        FROM documents""")),

    Q("multimodal_frame_sample",
      (s, d) => graft.multimodal.Multimodal.sampleFrames(
          graft.multimodal.Multimodal.syntheticMedia(s, s"$d/documents.parquet"))
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx")),
      Some("""SELECT doc_id AS media_id,
          unnest(range(0, CAST(doc_id % 30 + 1 AS BIGINT), 10)) AS frame_idx
        FROM documents WHERE doc_id % 3 = 2""")),

    // REAL per-frame decode: every 10th frame is parsed out of the video
    // container and pixel-decoded; the oracle predicts each sampled
    // frame's dims and exact constant-gray luma
    Q("multimodal_frame_decode",
      (s, d) => graft.multimodal.Multimodal.sampleFrameFeatures(
          graft.multimodal.Multimodal.syntheticMedia(s, s"$d/documents.parquet"))
        .toDF(),
      Some("""WITH f AS (SELECT doc_id,
            unnest(range(0, CAST(doc_id % 30 + 1 AS BIGINT), 10)) AS i
          FROM documents WHERE doc_id % 3 = 2)
        SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx,
          CAST(doc_id % 64 + 1 AS INT) AS width,
          CAST(doc_id % 48 + 1 AS INT) AS height,
          CAST(((doc_id + i) % 256) * 1000 // 255 AS BIGINT) AS mean_luma_x1000
        FROM f""")),

    // Scene-cut keyframe detection: EVERY frame pixel-decoded, keep frame 0
    // and frames whose mean-luma delta ≥ 0.5 (the synthetic frames step
    // +1/256 per frame and wrap 255→0, so cuts land exactly at the wraps —
    // the oracle predicts them arithmetically)
    Q("multimodal_scene_cuts",
      (s, d) => graft.multimodal.Multimodal.sceneCuts(
          graft.multimodal.Multimodal.syntheticMedia(s, s"$d/documents.parquet"))
        .toDF(),
      Some("""WITH f AS (SELECT doc_id,
            unnest(range(0, CAST(doc_id % 30 + 1 AS BIGINT))) AS i
          FROM documents WHERE doc_id % 3 = 2),
        l AS (SELECT doc_id, i, ((doc_id + i) % 256) * 1000 // 255 AS luma FROM f),
        dd AS (SELECT doc_id, i, luma,
          luma - lag(luma) OVER (PARTITION BY doc_id ORDER BY i) AS delta FROM l)
        SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx,
          CAST(luma AS BIGINT) AS luma_x1000,
          CAST(CASE WHEN i = 0 THEN 0 ELSE abs(delta) END AS BIGINT) AS delta_x1000
        FROM dd WHERE i = 0 OR abs(delta) >= 500""")),

    // REAL audio resample: WAV → PCM decode → keep every 2nd sample →
    // re-encode at 8 kHz; the oracle predicts the re-encoded container
    // byte-exactly (44-byte canonical header + 2·ceil(f/2)) and the
    // amplitude stays fixed (constant-amplitude clips, floor-div invariant)
    Q("multimodal_audio_resample",
      (s, d) => graft.multimodal.Multimodal.extractFeatures(
          graft.multimodal.Multimodal.resampleAudio(
            graft.multimodal.Multimodal.syntheticMedia(s, s"$d/documents.parquet")))
        .toDF()
        .filter(col("kind") === "audio")
        .select(col("media_id"), col("n_bytes"), col("header_ok"),
          col("n_frames"), col("sample_rate"),
          col("mean_luma_x1000").as("mean_amp_x1000")),
      Some("""SELECT doc_id AS media_id,
          CAST(44 + 2 * ((doc_id % 30 + 2) // 2) AS BIGINT) AS n_bytes,
          TRUE AS header_ok,
          CAST((doc_id % 30 + 2) // 2 AS INT) AS n_frames,
          8000 AS sample_rate,
          CAST(((doc_id % 256) * 128 * 1000) // 32768 AS BIGINT) AS mean_amp_x1000
        FROM documents WHERE doc_id % 3 = 1""")),

    // Perceptual image dedup: block-patterned PNGs are really encoded,
    // really decoded, block-averaged to an 8×8 aHash (division-free exact
    // integer bits), and near-dup pairs found by the pigeonhole band join
    // + exact popcount — the oracle replays every hash bit and hamming
    // distance from the generating arithmetic alone
    Q("multimodal_image_near_dup",
      (s, d) => graft.multimodal.Multimodal.imageNearDupPairs(
        graft.multimodal.Multimodal.syntheticBlockImages(s, s"$d/documents.parquet")),
      Some("""WITH img AS (SELECT doc_id AS id, doc_id % 40 AS seed, doc_id % 7 = 0 AS noisy
          FROM documents WHERE doc_id % 3 = 0),
        cells AS (SELECT id, i, j,
            CASE WHEN noisy AND i = 0 AND j = 0
              THEN ((seed*31 + i*8 + j*17) % 256 + 8) % 256
              ELSE (seed*31 + i*8 + j*17) % 256 END AS v
          FROM img, range(8) a(i), range(8) b(j)),
        tot AS (SELECT id, sum(v) AS tv FROM cells GROUP BY id),
        bits AS (SELECT c.id, c.i, c.j,
            CASE WHEN c.v * 64 > t.tv THEN 1 ELSE 0 END AS bit
          FROM cells c JOIN tot t ON c.id = t.id),
        pr AS (SELECT a.id AS id_a, b.id AS id_b,
            CAST(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming
          FROM bits a JOIN bits b ON a.i = b.i AND a.j = b.j AND a.id < b.id
          GROUP BY 1, 2)
        SELECT id_a, id_b, hamming FROM pr WHERE hamming <= 3""")),

    // REAL image resize (Graphics2D bilinear, aspect-preserving floor
    // arithmetic): resized constant-gray pixels keep their exact luma,
    // dims follow the resize plan formula
    Q("multimodal_resize",
      (s, d) => graft.multimodal.Multimodal.extractFeatures(
          graft.multimodal.Multimodal.resizeImages(
            graft.multimodal.Multimodal.syntheticMedia(s, s"$d/documents.parquet"),
            maxSide = 16))
        .toDF()
        .filter(col("kind") === "image")
        .select("media_id", "width", "height", "mean_luma_x1000"),
      Some("""WITH m AS (SELECT doc_id,
            CAST(doc_id % 64 + 1 AS INT) AS w, CAST(doc_id % 48 + 1 AS INT) AS h
          FROM documents WHERE doc_id % 3 = 0),
          d AS (SELECT doc_id, w, h, greatest(w, h) AS lg FROM m)
        SELECT doc_id AS media_id,
          CAST(CASE WHEN lg <= 16 THEN w ELSE greatest(1, w * 16 // lg) END AS INT) AS width,
          CAST(CASE WHEN lg <= 16 THEN h ELSE greatest(1, h * 16 // lg) END AS INT) AS height,
          CAST((doc_id % 256) * 1000 // 255 AS BIGINT) AS mean_luma_x1000
        FROM d""")),

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

    // INCREMENTAL EXACT DEDUP, history-probe strategies: the same daily
    // batch (exact copies of every 7th doc = dupes, order-reversed every
    // 13th = novel) deduped against the persisted fingerprint history —
    // once via the broadcast semi-probe (zero shuffle of the history) and
    // once via the driver bloom prefilter (constant-size probe; false
    // positives are re-checked exactly, so all three strategies are
    // result-identical). One oracle text serves both gates.
    Q("dedup_exact_probe",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val seen = Dedup.exact(corpus, "doc_id", "text").select("fp")
        val out = Dedup.exactIncremental(ingestBatch(corpus), "doc_id", "text",
            seen, strategy = "probe")
          .select("doc_id").localCheckpoint(true)
        Dedup.releaseIntermediates()
        out
      },
      Some(incrementalExactOracle)),

    Q("dedup_exact_bloom",
      (s, d) => {
        val corpus = t(s, d, "documents")
        val seen = Dedup.exact(corpus, "doc_id", "text").select("fp")
        val out = Dedup.exactIncremental(ingestBatch(corpus), "doc_id", "text",
            seen, strategy = "bloom", bloomFpp = 0.01)
          .select("doc_id").localCheckpoint(true)
        Dedup.releaseIntermediates()
        out
      },
      Some(incrementalExactOracle)),

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

    // §2.9 in the correctness matrix: a REAL Structured Streaming run
    // (file source → watermarked tumbling windows → AvailableNow → memory
    // sink, complete mode so every window surfaces deterministically),
    // hash-matched against the equivalent batch SQL. Session TZ is UTC, so
    // 1-hour windows align to epoch hours on both sides.
    Q("streaming_window_counts",
      (s, d) => {
        // the stream reads the RAW fixture file, so its schema (and the
        // event-time conversion) must come from the file, not the
        // vintage-normalizing t() reader
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val name = s"gw_${math.abs(d.hashCode)}_${System.nanoTime()}"
        // the file stream source needs a DIRECTORY; the fixture is a single
        // file — symlink it into a temp dir (local-fs listing follows links)
        val dir = java.nio.file.Files.createTempDirectory("graft-stream-ev")
        java.nio.file.Files.createSymbolicLink(
          dir.resolve("events.parquet"),
          java.nio.file.Paths.get(s"$d/events.parquet").toAbsolutePath)
        val in = s.readStream.schema(schema).parquet(dir.toString)
          .withColumn("ets", rawEventTime(schema))
        val q = graft.streaming.StreamingIngest.windowedCounts(in, "ets")
          .writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
        // localize the (small: hours × event types) result, then drop the
        // memory sink so repeated invocations don't accumulate driver state
        val out = s.createDataFrame(
          java.util.Arrays.asList(s.table(name).select(
            unix_micros(col("win_start")).as("win_start_us"),
            col("event_type"), col("cnt")).collect(): _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("win_start_us",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("event_type",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("cnt",
              org.apache.spark.sql.types.LongType))))
        s.catalog.dropTempView(name)
        deleteDir(dir.toFile)
        out
      },
      Some("""SELECT CAST(epoch_us(ts) // 3600000000 * 3600000000 AS BIGINT)
          AS win_start_us, event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2""")),

    // native session_window streaming state in the matrix: sessions close
    // once no event lands within 1h of the window end. The oracle mirrors
    // the gap-merge in SQL (islands split at gap >= 1h — session_window's
    // end-EXCLUSIVE boundary — with end = last event + gap); value sums
    // ride as exact integer cents
    Q("streaming_session_counts",
      (s, d) => {
        // raw file schema — see streaming_window_counts
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val name = s"gs_${math.abs(d.hashCode)}_${System.nanoTime()}"
        val dir = java.nio.file.Files.createTempDirectory("graft-stream-sess")
        java.nio.file.Files.createSymbolicLink(
          dir.resolve("events.parquet"),
          java.nio.file.Paths.get(s"$d/events.parquet").toAbsolutePath)
        val in = s.readStream.schema(schema).parquet(dir.toString)
          .withColumn("ets", rawEventTime(schema))
          .withColumn("value", floor(col("value") * 100).cast("long"))
        val q = graft.streaming.StreamingIngest.sessionCounts(
            in, "user_id", "ets", gap = "1 hour", watermark = "100 days")
          .writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
        val out = s.createDataFrame(
          java.util.Arrays.asList(s.table(name).select(
            col("user_id"),
            unix_micros(col("sess_start")).as("start_us"),
            unix_micros(col("sess_end")).as("end_us"),
            col("n_events"), col("sum_value").as("sum_cents")).collect(): _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("user_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("start_us",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("end_us",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("n_events",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("sum_cents",
              org.apache.spark.sql.types.LongType))))
        s.catalog.dropTempView(name)
        deleteDir(dir.toFile)
        out
      },
      Some("""WITH g AS (SELECT user_id, epoch_us(ts) AS ets,
          CAST(floor(value * 100) AS BIGINT) AS cents,
          CASE WHEN lag(epoch_us(ts)) OVER
              (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
            OR epoch_us(ts) - lag(epoch_us(ts)) OVER
              (PARTITION BY user_id ORDER BY epoch_us(ts)) >= 3600000000
            THEN 1 ELSE 0 END AS brk
        FROM events),
        s AS (SELECT user_id, ets, cents,
          SUM(brk) OVER (PARTITION BY user_id ORDER BY ets
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        FROM g)
        SELECT user_id, min(ets) AS start_us, max(ets) + 3600000000 AS end_us,
          count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM s GROUP BY user_id, sess""")),

    // stream-stream INTERVAL join (view→purchase attribution): a self-join
    // of the event stream where the time-range condition + watermarks bound
    // both join buffers. TWO AvailableNow file drops against one checkpoint
    // (views + even-id purchases, then the odd-id purchases): even-purchase
    // matches emit in run 1, odd-purchase matches join drop-1 views
    // BUFFERED IN STATE across the batch boundary — so the gate proves the
    // join buffer survives restarts inside the watermark, not just one-
    // batch inner-join semantics. Inner matches emit immediately, so the
    // two runs' union is batch-SQL-exact — same DuckDB oracle
    Q("streaming_interval_join",
      (s, d) => {
        val ev = t(s, d, "events")
        val schema = ev.schema
        val dir = java.nio.file.Files.createTempDirectory("graft-stream-ij")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ij-ck")
        // parquet sink, NOT memory: the memory sink refuses checkpoint
        // recovery, and recovery is exactly what run 2 exercises
        val sink = java.nio.file.Files.createTempDirectory("graft-stream-ij-out")
        def runOnce(): Unit = {
          val raw = s.readStream.schema(schema).parquet(dir.toString)
            .withColumn("ets", timestamp_micros(expr("ts div 1000")))
          def side(kind: String) = raw.filter(col("event_type") === kind)
            .select(col("event_id"), col("user_id"), col("ets"))
          val q = graft.streaming.StreamingIngest.intervalJoin(
              side("view"), side("purchase"), "user_id", "ets",
              maxDelay = "30 minutes", watermark = "100 days")
            .select(col("l_key").as("user_id"),
              col("l_event_id").as("view_id"), col("r_event_id").as("purchase_id"),
              unix_micros(col("l_ts")).as("view_us"),
              unix_micros(col("r_ts")).as("purchase_us"))
            .writeStream.format("parquet")
            .option("path", sink.toString)
            .option("checkpointLocation", ckpt.toString)
            .outputMode("append")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        // drop 1: every view + the even-id purchases
        ev.filter(col("event_type") =!= "purchase" || pmod(col("event_id"), lit(2)) === 0)
          .write.mode("append").parquet(dir.toString)
        runOnce()
        // drop 2: the odd-id purchases — their views are already in state
        ev.filter(col("event_type") === "purchase" && pmod(col("event_id"), lit(2)) === 1)
          .write.mode("append").parquet(dir.toString)
        runOnce()
        deleteDir(ckpt.toFile)
        deleteDir(dir.toFile)
        // materialize off the sink files so the sink dir can go too — no
        // temp dir outlives the gate (the tfidf-incremental gates' rule)
        val res = s.read.parquet(sink.toString).localCheckpoint(true)
        deleteDir(sink.toFile)
        res
      },
      Some("""SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
          CAST(epoch_us(v.ts) AS BIGINT) AS view_us,
          CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us
        FROM events v JOIN events p ON v.user_id = p.user_id
        WHERE v.event_type = 'view' AND p.event_type = 'purchase'
          AND epoch_us(p.ts) >= epoch_us(v.ts)
          AND epoch_us(p.ts) <= epoch_us(v.ts) + 1800000000""")),

    // ROLLING STREAMING DEDUP INGEST: two AvailableNow drops against one
    // checkpoint — drop 1 (even docs) seeds the persisted fingerprint
    // store, drop 2 (all docs) must dedup against BOTH the store (evens
    // die) and itself (min-id per fp wins). The probe strategy means the
    // store is never shuffled; the oracle replays the two-epoch keep rule
    Q("streaming_dedup_ingest",
      (s, d) => {
        val schema = t(s, d, "documents").schema
        val src = java.nio.file.Files.createTempDirectory("graft-sdi-src")
        val dest = java.nio.file.Files.createTempDirectory("graft-sdi-out")
        val fps = java.nio.file.Files.createTempDirectory("graft-sdi-fp")
        val ckpt = java.nio.file.Files.createTempDirectory("graft-sdi-ck")
        // both sinks are VersionedTables (exactly-once appendIdempotent);
        // an absent/empty dir just means "table does not exist yet"
        java.nio.file.Files.delete(fps)
        val docs = t(s, d, "documents")
        docs.filter(col("doc_id") % 2 === 0)
          .write.mode("append").parquet(src.toString)
        graft.streaming.StreamingIngest.dedupIngest(s, src.toString, schema,
          "doc_id", "text", dest.toString, fps.toString, ckpt.toString)
        docs.write.mode("append").parquet(src.toString)
        graft.streaming.StreamingIngest.dedupIngest(s, src.toString, schema,
          "doc_id", "text", dest.toString, fps.toString, ckpt.toString)
        val out = new graft.store.VersionedTable(s, dest.toString).read()
          .select("doc_id").localCheckpoint(true)
        Seq(src, dest, fps, ckpt).foreach(p => deleteDir(p.toFile))
        out
      },
      Some(s"""WITH n AS (SELECT doc_id, md5($normSql) AS fp FROM documents),
        k1 AS (SELECT fp, min(doc_id) AS doc_id FROM n
          WHERE doc_id % 2 = 0 GROUP BY fp),
        k2 AS (SELECT fp, min(doc_id) AS doc_id FROM n
          WHERE fp NOT IN (SELECT fp FROM k1) GROUP BY fp)
        SELECT CAST(doc_id AS BIGINT) AS doc_id FROM k1
        UNION ALL SELECT CAST(doc_id AS BIGINT) FROM k2""")),

    // stateful streaming dedup (flatMapGroupsWithState) in the matrix:
    // AvailableNow over one file = one micro-batch, and within a batch the
    // lowest doc_id per fingerprint wins — deterministic, batch-SQL-exact
    Q("streaming_stateful_dedup",
      (s, d) => {
        val schema = t(s, d, "documents").schema
        val src = java.nio.file.Files.createTempDirectory("graft-sdd-src")
        java.nio.file.Files.createSymbolicLink(
          src.resolve("documents.parquet"),
          java.nio.file.Paths.get(s"$d/documents.parquet").toAbsolutePath)
        val out = java.nio.file.Files.createTempDirectory("graft-sdd-out").toString
        val ckpt = java.nio.file.Files.createTempDirectory("graft-sdd-ckpt").toString
        graft.streaming.StatefulDedup.runAvailableNow(
          s, src.toString, schema, "doc_id", "text", out, ckpt)
        deleteDir(src.toFile)
        deleteDir(new java.io.File(ckpt))
        // materialize off the sink files so the output dir can go too —
        // no temp dir outlives the gate (the tfidf-incremental gates' rule)
        val res = s.read.parquet(out).localCheckpoint(true)
        deleteDir(new java.io.File(out))
        res
      },
      Some(s"""SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, md5($normSql) AS fp
        FROM documents GROUP BY 2""")),

    // contamination-filtered STREAMING ingest: the map-only dirtiness
    // filter (bench gram InSet, computed batch-side ONCE and riding the
    // closure into the stream) lifts to Structured Streaming UNCHANGED —
    // AvailableNow drain through the filter, parquet sink; oracle = the
    // batch SQL filter at < 500 permille
    Q("streaming_clean_ingest",
      (s, d) => {
        val docs = t(s, d, "documents")
        val schema = docs.schema
        val src = java.nio.file.Files.createTempDirectory("graft-sci-src")
        // the fixture is a single file in the driver layout but a
        // Spark-written DIRECTORY in the sf1 sweep — the streaming file
        // source does not descend through a symlinked dir, so link the
        // data files themselves in that case
        val fixture = java.nio.file.Paths.get(s"$d/documents.parquet").toAbsolutePath
        if (java.nio.file.Files.isDirectory(fixture)) {
          val it = java.nio.file.Files.list(fixture).iterator()
          while (it.hasNext) {
            val p = it.next()
            if (p.getFileName.toString.endsWith(".parquet"))
              java.nio.file.Files.createSymbolicLink(src.resolve(p.getFileName), p)
          }
        } else
          java.nio.file.Files.createSymbolicLink(src.resolve("documents.parquet"), fixture)
        val out = java.nio.file.Files.createTempDirectory("graft-sci-out").toString
        val ckpt = java.nio.file.Files.createTempDirectory("graft-sci-ckpt").toString
        val stream = s.readStream.schema(schema).parquet(src.toString)
        val cleaned = TextCorpus.contaminationRate(stream, "doc_id", "text",
            docs.filter(col("doc_id") % 17 === 3), "text", n = 8)
          .filter(col("contamination_permille") < 500)
        val q = cleaned.writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
        deleteDir(src.toFile)
        deleteDir(new java.io.File(ckpt))
        // materialize off the sink files so the output dir can be removed
        // too (the tfidf-incremental gates' rule) — no temp dir outlives
        // the gate
        val res = s.read.parquet(out).localCheckpoint(true)
        deleteDir(new java.io.File(out))
        res
      },
      Some(s"""WITH s AS (SELECT doc_id, $toksSql AS t FROM documents),
        g AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS gr
          FROM s, unnest(range(1, len(t) - 6)) AS r(i)),
        bg AS (SELECT DISTINCT gr FROM g WHERE doc_id % 17 = 3),
        h AS (SELECT doc_id, count(*) AS ng,
            count(*) FILTER (gr IN (SELECT gr FROM bg)) AS nh
          FROM g GROUP BY doc_id)
        SELECT s.doc_id, CAST(coalesce(ng, 0) AS BIGINT) AS n_grams,
          CAST(coalesce(nh, 0) AS BIGINT) AS n_hits,
          CAST(CASE WHEN coalesce(ng, 0) > 0 THEN nh * 1000 // ng
            ELSE 0 END AS BIGINT) AS contamination_permille
        FROM s LEFT JOIN h USING (doc_id)
        WHERE CASE WHEN coalesce(ng, 0) > 0 THEN nh * 1000 // ng
          ELSE 0 END < 500""")),

    // PII-lite scrubbing (emails/URLs → placeholder tokens): the corpus has
    // no planted PII, so the gate SYNTHESIZES it deterministically (append
    // an email+url derived from doc_id) and checks the scrub round-trip —
    // patterns restricted to Java-regex ∩ RE2 syntax so DuckDB mirrors them
    Q("text_scrub_pii",
      (s, d) => t(s, d, "documents").select(col("doc_id"),
        TextFunctions.scrubPii(concat(col("text"),
          lit(" contact user"), col("doc_id"),
          lit("@example.com or https://ex.com/p/"), col("doc_id"))).as("scrubbed")),
      Some("""SELECT doc_id, regexp_replace(
          regexp_replace(
            text || ' contact user' || doc_id || '@example.com or https://ex.com/p/' || doc_id,
            'https?://[^ \t\n]+', '<URL>', 'g'),
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS scrubbed
        FROM documents""")),

    // TRAIN the quality model on the cluster: exact distributed OLS via
    // integer normal equations (one map-side-combinable aggregation) +
    // driver-side BigInt Cramer solve — no floats anywhere, so the oracle
    // replays the identical moments as HUGEINT and the identical 3x3
    // determinants, down to the truncate-toward-zero fixed-point division
    // (BigInt `/` == DuckDB `//`)
    Q("text_fit_linear",
      (s, d) => TextCorpus.fitLinearModelX1000(t(s, d, "documents"),
        Seq("tokens" -> TextFunctions.tokenCount(col("text")),
          "utokens" -> size(array_distinct(TextFunctions.tokens(col("text"))))
            .cast("long")),
        col("n_chars")),
      Some(s"""WITH f AS (SELECT CAST(len($toksSql) AS HUGEINT) AS t,
            CAST(len(list_distinct($toksSql)) AS HUGEINT) AS p,
            CAST(n_chars AS HUGEINT) AS y FROM documents),
        m AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(t) AS st, sum(p) AS sp,
            sum(t*t) AS stt, sum(t*p) AS stp, sum(p*p) AS spp,
            sum(y) AS sy, sum(t*y) AS sty, sum(p*y) AS spy FROM f),
        dets AS (SELECT
          n*(stt*spp - stp*stp) - st*(st*spp - stp*sp) + sp*(st*stp - stt*sp) AS det,
          sy*(stt*spp - stp*stp) - st*(sty*spp - stp*spy) + sp*(sty*stp - stt*spy) AS det0,
          n*(sty*spp - stp*spy) - sy*(st*spp - stp*sp) + sp*(st*spy - sty*sp) AS det1,
          n*(stt*spy - sty*stp) - st*(st*spy - sty*sp) + sy*(st*stp - stt*sp) AS det2
          FROM m)
        SELECT 'intercept' AS feature, CAST((1000*det0) // det AS BIGINT) AS w_x1000 FROM dets
        UNION ALL SELECT 'tokens', CAST((1000*det1) // det AS BIGINT) FROM dets
        UNION ALL SELECT 'utokens', CAST((1000*det2) // det AS BIGINT) FROM dets""")),

    // TRAIN → APPLY composed: the exact-OLS weights from text_fit_linear
    // score every document as a fixed-point integer dot product — the
    // whole learn-a-filter-then-run-it pipeline, end-to-end integer-exact
    // (oracle recomputes the moments, the Cramer solve, AND the scoring)
    Q("text_fit_apply",
      (s, d) => {
        val docs = t(s, d, "documents")
        val tokens = TextFunctions.tokenCount(col("text"))
        val utokens = size(array_distinct(TextFunctions.tokens(col("text")))).cast("long")
        val w = TextCorpus.fitLinearModelX1000(docs,
            Seq("tokens" -> tokens, "utokens" -> utokens), col("n_chars"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        docs.select(col("doc_id"),
          (lit(w("intercept")) + lit(w("tokens")) * tokens +
            lit(w("utokens")) * utokens).as("pred_x1000"))
      },
      Some(s"""WITH f AS (SELECT doc_id, CAST(len($toksSql) AS HUGEINT) AS t,
            CAST(len(list_distinct($toksSql)) AS HUGEINT) AS p,
            CAST(n_chars AS HUGEINT) AS y FROM documents),
        m AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(t) AS st, sum(p) AS sp,
            sum(t*t) AS stt, sum(t*p) AS stp, sum(p*p) AS spp,
            sum(y) AS sy, sum(t*y) AS sty, sum(p*y) AS spy FROM f),
        dets AS (SELECT
          n*(stt*spp - stp*stp) - st*(st*spp - stp*sp) + sp*(st*stp - stt*sp) AS det,
          sy*(stt*spp - stp*stp) - st*(sty*spp - stp*spy) + sp*(sty*stp - stt*spy) AS det0,
          n*(sty*spp - stp*spy) - sy*(st*spp - stp*sp) + sp*(st*spy - sty*sp) AS det1,
          n*(stt*spy - sty*stp) - st*(st*spy - sty*sp) + sy*(st*stp - stt*sp) AS det2
          FROM m),
        w AS (SELECT (1000*det0) // det AS w0, (1000*det1) // det AS w1,
            (1000*det2) // det AS w2 FROM dets)
        SELECT doc_id, CAST(w0 + w1*t + w2*p AS BIGINT) AS pred_x1000
        FROM f, w""")),

    // REAL BPE apply in the matrix: the general greedy merge kernel
    // (TextFunctions.bpeTokens — rank-ordered, chaining, all-occurrence)
    // runs with a merge table over DISJOINT character sets, which makes
    // the oracle closed-form: disjoint merges can't chain, can't overlap
    // each other, and can't create or destroy other pairs' adjacencies,
    // so token count = chars − Σ per-pair non-overlapping LTR substring
    // occurrences — exactly what DuckDB's global replace() counts. (The
    // general chaining/rank behavior is spec-checked in BpeSpec; this
    // gate proves the kernel over the whole corpus.)
    Q("text_bpe_tokens",
      (s, d) => t(s, d, "documents").select(col("doc_id"),
        TextFunctions.bpeTokenCount(TextFunctions.normalizeWs(col("text")),
          Seq(("t", "h"), ("e", "r"), ("o", "n"), ("a", "l"))).as("bpe_tokens")),
      Some(s"""WITH n AS (SELECT doc_id, $normSql AS t FROM documents)
        SELECT doc_id, CAST(
          length(replace(t, ' ', ''))
          - (length(t) - length(replace(t, 'th', ''))) // 2
          - (length(t) - length(replace(t, 'er', ''))) // 2
          - (length(t) - length(replace(t, 'on', ''))) // 2
          - (length(t) - length(replace(t, 'al', ''))) // 2
          AS BIGINT) AS bpe_tokens
        FROM n""")),

    // BPE-ish sub-word token counting (alnum runs + single non-alnum chars)
    Q("text_bpeish_tokens",
      (s, d) => t(s, d, "documents").select(col("doc_id"),
        TextFunctions.bpeishTokenCount(col("text")).as("bpe_tokens")),
      Some("""SELECT doc_id,
        CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9]')) AS BIGINT)
          AS bpe_tokens FROM documents""")),

    Q("emb_label_stats",
      (s, d) => t(s, d, "embeddings").groupBy("label").agg(
        count(lit(1)).as("cnt"),
        min(size(col("embedding"))).cast("long").as("min_dim"),
        max(size(col("embedding"))).cast("long").as("max_dim")),
      Some("""SELECT label, count(*) AS cnt, CAST(min(len(embedding)) AS BIGINT) AS min_dim,
        CAST(max(len(embedding)) AS BIGINT) AS max_dim FROM embeddings GROUP BY label""")))

  /** The embedding of vec_id = 0 — the ANN query vector on both sides. */
  private def queryVec(s: SparkSession, d: String): Seq[Float] =
    t(s, d, "embeddings").filter(col("vec_id") === 0)
      .head().getSeq[Float](1)

  /** DuckDB brute-force ground truth for word-3-gram Jaccard pairs: mirrors
    * TextFunctions.shingles (docs with ≤ 3 tokens yield their whole text as
    * one shingle; else a sliding 3-token window; distinct set) and
    * Dedup.jaccardX1000's integer per-mille. `//` is DuckDB floor division —
    * same result as Spark's floor(double-div) at these magnitudes. */
  private def jaccardTruthSql(thrX1000: Int): String =
    s"""WITH base AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
      sets AS (SELECT doc_id,
          list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
            ELSE list_transform(range(1, len(toks)-1),
              i -> array_to_string(toks[i:i+2], ' ')) END) AS sh
        FROM base),
      sizes AS (SELECT doc_id, len(sh) AS sz FROM sets),
      posting AS (SELECT doc_id, unnest(sh) AS s FROM sets),
      inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        FROM posting a JOIN posting b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b, CAST((i*1000) // (sa.sz + sb.sz - i) AS BIGINT) AS jaccard_x1000
      FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
      WHERE (i*1000) // (sa.sz + sb.sz - i) >= $thrX1000"""

  /** DuckDB mirror of HashKernels.simhashPoly signatures: per token the
    * poly61 codepoint hash — fold (a·131+cp) mod 2^61−1 (HUGEINT keeps
    * every product exact), then the wrapping finalize (fold·C) % 2^64
    * converted to a signed BIGINT (≡ Java's native long multiply) — then
    * per bit b ∈ [0,64) the sign of Σ(±1) over the token multiset.
    * Bit 63 of the assembled signature is the sign bit: setting it adds
    * −2^63 (the literal is written (−(2^63−1))−1; DuckDB parses the bare
    * constant as INT128). */
  private def polySigSql: String =
    s"""SELECT doc_id, CAST(sum(CASE WHEN c > 0 THEN
          (CASE WHEN b = 63 THEN (-9223372036854775807 - 1)::BIGINT ELSE (1::BIGINT << b) END)
          ELSE 0 END) AS BIGINT) AS sig
      FROM (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS c
        FROM (SELECT doc_id,
            CAST(CASE WHEN u >= 9223372036854775808 THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS h
          FROM (SELECT doc_id, ((CASE WHEN len(t) = 0 THEN 0::HUGEINT ELSE
                list_reduce(list_transform(string_split(t, ''), ch -> CAST(unicode(ch) AS HUGEINT)),
                  (a, x) -> (a * 131 + x) % 2305843009213693951) END)
                * 2685821657736338717) % 18446744073709551616 AS u
            FROM (SELECT doc_id, unnest($toksSql) AS t FROM documents))),
          range(64) r(b)
        GROUP BY doc_id, b)
      GROUP BY doc_id"""

  /** The simhash gate's exact truth: Jaccard ≥ threshold AND recomputed-
    * signature hamming ≤ maxHamming — the operator's actual contract. */
  private def simhashTruthSql(maxHamming: Int, thrX1000: Int): String =
    s"""WITH sg AS ($polySigSql),
      tp AS (${jaccardTruthSql(thrX1000)})
      SELECT tp.id_a, tp.id_b, tp.jaccard_x1000
      FROM tp JOIN sg a ON a.doc_id = tp.id_a JOIN sg b ON b.doc_id = tp.id_b
      WHERE bit_count(xor(a.sig, b.sig)) <= $maxHamming"""

  /** Exact cosine top-10 for the vec_id=0 query — the oracle shared by the
    * brute-force gate and both approximate ANN gates (containment grading:
    * the approximate result must EQUAL the exact one at tuned probe width). */
  private lazy val annExactTopKSql: String =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      s AS (SELECT vec_id, list_cosine_similarity(embedding, qe) AS sim FROM embeddings, q)
      SELECT CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
        vec_id AS id
      FROM s ORDER BY sim DESC, vec_id LIMIT 10"""

  // ---------------------------------------------------------------- store

  /** Manifest-level data skipping + OPTIMIZE z-order, verified end-to-end:
    * the engine builds a VersionedTable, prunes data dirs from per-dir
    * min/max stats, and the DuckDB oracle computes the same slice straight
    * off the source parquet — an unsound prune (dropped dir that still had
    * matching rows) hash-mismatches immediately. */
  private val store: Seq[Q] = Seq(
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

    // The graft-table streaming source, gated end-to-end: snapshot drain +
    // incremental drain over one checkpoint must reassemble EXACTLY the
    // source table (no loss, no duplicates) — the Delta table-as-stream
    // contract on the graft store
    Q("streaming_table_source",
      (s, d) => {
        val dest = Scenarios.tableStreamDest(s, d)
        s.read.parquet(s"$dest/sink")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      },
      Some("SELECT c_custkey, c_name, c_acctbal FROM customer")),

    // The FOREIGN-Delta streaming source (stream FROM a pure _delta_log
    // destination): snapshot drain + a ForeignDeltaTable-append increment
    // over one checkpoint must reassemble exactly the source table — the
    // delta-spark table-as-stream contract without a Delta jar
    Q("streaming_delta_source",
      (s, d) => {
        val dest = Scenarios.deltaStreamDest(s, d)
        s.read.parquet(s"$dest/sink")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      },
      Some("SELECT c_custkey, c_name, c_acctbal FROM customer")),

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

    // NON-memoized live stream drain (bench headline): builds a fresh
    // table, streams two drops through AvailableNow — times the actual
    // offset-resolution + micro-batch path, never a cache read; the
    // reassembly oracle keeps it honest
    Q("streaming_drain_bench",
      (s, d) => {
        val dest = Scenarios.freshStreamDrain(s, d)
        s.read.parquet(s"$dest/sink")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      },
      Some("SELECT c_custkey, c_name, c_acctbal FROM customer")),

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

  /** Shared oracle of the post-full-load change slice (store_cdf and its
    * TVF twin): batch-2 updates + inserts + delete tombstones. */
  private def cdfOracle: String =
    """SELECT c_custkey, trim(c_name) AS c_name, c_acctbal + 100 AS c_acctbal,
        trim(c_mktsegment) AS c_mktsegment, CAST(2 AS BIGINT) AS ver,
        FALSE AS __is_deleted, FALSE AS __is_full_load
        FROM customer WHERE c_custkey % 89 = 0 AND c_custkey % 97 <> 0
      UNION ALL SELECT c_custkey + 10000000, trim(c_name), c_acctbal, trim(c_mktsegment),
        CAST(2 AS BIGINT), FALSE, FALSE FROM customer WHERE c_custkey % 83 = 0
      UNION ALL SELECT c_custkey, NULL, NULL, NULL, CAST(NULL AS BIGINT), TRUE, FALSE
        FROM customer WHERE c_custkey % 97 = 0"""

  // ------------------------------------------------------------------ all

  val all: Seq[Q] = relational ++ scd2 ++ pipeline ++ store

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.collect { case Q(n, _, Some(o)) => n -> o.stripMargin.replaceAll("\\s+", " ").trim }.toMap
}
