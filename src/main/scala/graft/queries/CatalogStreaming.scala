package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Graph, Similarity, TextCorpus}

import Catalog.Q
import GateSupport._

/** Structured-streaming ingest gates: windowed counts, sessions, interval join, stateful dedup, table/CDF sources, admission control.
  *
  * Split from the monolithic Catalog (round 16) — same `Q` registrations,
  * re-aggregated by [[Catalog.all]]; shared fixture readers and oracle
  * fragments live in [[GateSupport]]. */
private[queries] object CatalogStreaming {
  val gates: Seq[Q] = Seq(
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
      Some("SELECT c_custkey, c_name, c_acctbal FROM customer")))
}
