package graft.queries

import java.nio.file.Files

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft._
import graft.scd2.Synchronizer
import graft.sources.DataFrameSource

/** Deterministic SCD2 engine scenarios over the harness `customer`/`events`
  * parquet — each runs the real Synchronizer end-to-end into a temp
  * destination and exposes the result as a DataFrame whose content is also
  * expressible as plain SQL over the input parquet (the DuckDB oracle).
  *
  * Mutation predicates are modular arithmetic on the key so both sides
  * (engine input builder and oracle SQL) derive the exact same batches:
  *   deletes:  c_custkey % 97 == 0
  *   updates:  c_custkey % 89 == 0   (acctbal+100, ver 1→2)
  *   inserts:  c_custkey % 83 == 0   (key+10,000,000, ver 2)
  *
  * Scenario runs are memoized per (scenario, sfDir) so the several queries
  * reading one scenario share a single engine run. */
object Scenarios {
  private val cache = TrieMap.empty[String, String]

  // Scenario EPOCH — the bench's retry path for memoized entries. Inside
  // `withFreshScenarios` every lookup misses (the epoch rides the cache
  // key) and rebuilds into a fresh destination, so a RE-RUN of a
  // memoized-scenario query times the full engine run, not a cache read;
  // the surrounding epoch-0 destinations stay cached and untouched for
  // every other caller. Single-threaded by contract (the bench driver).
  @volatile private var epoch: Int = 0
  private val epochCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Run `body` in a fresh scenario epoch: memoized scenarios rebuild from
    * scratch inside, the default epoch's cache survives outside. */
  def withFreshScenarios[T](body: => T): T = {
    epoch = epochCounter.incrementAndGet()
    try body finally epoch = 0
  }

  private def customer(spark: SparkSession, dir: String): DataFrame =
    Fixtures.pq(spark, s"$dir/customer.parquet")

  /** Batch 1: the full customer table with a version column. */
  def batch1(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir).select(
      col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"),
      lit(1L).as("ver"))

  /** Batch 2: deletes + updates + inserts per the predicates above. */
  def batch2(spark: SparkSession, dir: String): DataFrame = {
    val b1 = batch1(spark, dir)
    val kept = b1.filter(col("c_custkey") % 97 =!= 0)
    val updated = kept.withColumn("c_acctbal",
        when(col("c_custkey") % 89 === 0, col("c_acctbal") + 100).otherwise(col("c_acctbal")))
      .withColumn("ver",
        when(col("c_custkey") % 89 === 0, lit(2L)).otherwise(col("ver")))
    val inserts = b1.filter(col("c_custkey") % 83 === 0)
      .withColumn("c_custkey", col("c_custkey") + 10000000L)
      .withColumn("ver", lit(2L))
    updated.unionByName(inserts)
  }

  /** Strange batch: rows with key % 89 == 0 get ver moved BACKWARDS to 0
    * (restore-from-backup) and a marked name; one brand-new row keeps the
    * (max, count) state moving so the load isn't short-circuited. */
  def batchStrange(spark: SparkSession, dir: String): DataFrame = {
    val b1 = batch1(spark, dir)
    val mutated = b1
      .withColumn("c_name",
        when(col("c_custkey") % 89 === 0, concat(col("c_name"), lit("_r"))).otherwise(col("c_name")))
      .withColumn("ver",
        when(col("c_custkey") % 89 === 0, lit(0L)).otherwise(col("ver")))
    val extra = b1.limit(1).select(
      lit(20000000L).as("c_custkey"), lit("new").as("c_name"),
      lit(0.0).as("c_acctbal"), lit("SEG").as("c_mktsegment"), lit(2L).as("ver"))
    mutated.unionByName(extra)
  }

  private def run(key: String, spark: SparkSession, dir: String)(
      body: String => Unit): String =
    cache.getOrElseUpdate(s"$key|$dir|$epoch", {
      val dest = Files.createTempDirectory(s"graft-$key").toString
      body(dest)
      dest
    })

  private val pk = Seq("c_custkey")
  private def cfg = WriteConfig(deltaCol = Some("ver"))

  /** Full load then insert/update/delete delta load. */
  def deltaDest(spark: SparkSession, dir: String): String =
    run("delta", spark, dir) { dest =>
      new Synchronizer(spark, new DataFrameSource(batch1(spark, dir), pk), dest, cfg).execute()
      new Synchronizer(spark, new DataFrameSource(batch2(spark, dir), pk), dest, cfg).execute()
    }

  /** Full load then a backwards-moving ("strange") update batch. */
  def strangeDest(spark: SparkSession, dir: String, inline: Boolean): String =
    run(if (inline) "strange-in" else "strange-fb", spark, dir) { dest =>
      val c = if (inline) cfg else cfg.copy(noComplexEntriesLoad = true)
      new Synchronizer(spark, new DataFrameSource(batch1(spark, dir), pk), dest, c).execute()
      new Synchronizer(spark, new DataFrameSource(batchStrange(spark, dir), pk), dest, c).execute()
    }

  /** 80% of events full-loaded, then append_inserts of the rest. */
  def appendInsertsDest(spark: SparkSession, dir: String): String =
    run("appins", spark, dir) { dest =>
      val events = Fixtures.events(spark, dir)
      val thr = events.agg(max("event_id")).head().getLong(0) * 4 / 5
      val c = WriteConfig(loadMode = LoadMode.AppendInserts, deltaCol = Some("event_id"))
      new Synchronizer(spark,
        new DataFrameSource(events.filter(col("event_id") <= thr), Seq("event_id")), dest, c).execute()
      new Synchronizer(spark, new DataFrameSource(events, Seq("event_id")), dest, c).execute()
    }

  /** simple_delta: updates + inserts, deletes intentionally NOT detected. */
  def simpleDeltaDest(spark: SparkSession, dir: String): String =
    run("simple", spark, dir) { dest =>
      val b1 = batch1(spark, dir)
      val b2 = b1.withColumn("c_acctbal",
          when(col("c_custkey") % 89 === 0, col("c_acctbal") + 100).otherwise(col("c_acctbal")))
        .withColumn("ver", when(col("c_custkey") % 89 === 0, lit(2L)).otherwise(col("ver")))
        .unionByName(b1.filter(col("c_custkey") % 83 === 0)
          .withColumn("c_custkey", col("c_custkey") + 10000000L)
          .withColumn("ver", lit(2L)))
      val c = cfg.copy(loadMode = LoadMode.SimpleDelta)
      new Synchronizer(spark, new DataFrameSource(b1, pk), dest, c).execute()
      new Synchronizer(spark, new DataFrameSource(b2, pk), dest, c).execute()
    }

  /** Schema drift: batch 2 adds a brand-new column → forced full load. */
  def schemaDriftDest(spark: SparkSession, dir: String): String =
    run("drift", spark, dir) { dest =>
      val b1 = batch1(spark, dir)
      val b2 = b1.withColumn("extra", col("c_custkey") * 2)
      new Synchronizer(spark, new DataFrameSource(b1, pk), dest, cfg).execute()
      new Synchronizer(spark, new DataFrameSource(b2, pk), dest, cfg).execute()
    }

  /** Timestamp-typed watermark (the reference's datetime/AS_ROW_START delta
    * column, vs the bigint rowversion the other scenarios use): orders
    * before 2000 full-loaded, then the whole table delta-loaded with
    * o_orderdate as the delta column. */
  def tsWatermarkDest(spark: SparkSession, dir: String): String =
    run("tswm", spark, dir) { dest =>
      val orders = Fixtures.pq(spark, s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      val b1 = orders.filter(col("o_orderdate") < lit("2000-01-01"))
      val c = WriteConfig(deltaCol = Some("o_orderdate"))
      new Synchronizer(spark, new DataFrameSource(b1, Seq("o_orderkey")), dest, c).execute()
      new Synchronizer(spark, new DataFrameSource(orders, Seq("o_orderkey")), dest, c).execute()
    }

  /** Type widening under SchemaDrift.Full: the val column arrives as INT on
    * the first load and as BIGINT (with changed rows) on the second — the
    * history must widen in place, old files read back as BIGINT. */
  def widenDest(spark: SparkSession, dir: String): String =
    run("widen", spark, dir) { dest =>
      val base = customer(spark, dir).select(
        col("c_custkey"), col("c_nationkey").as("val"), lit(1L).as("ver"))
      val widened = base
        .withColumn("val",
          when(col("c_custkey") % 89 === 0, col("val").cast("long") + 1000L)
            .otherwise(col("val").cast("long")))
        .withColumn("ver", when(col("c_custkey") % 89 === 0, lit(2L)).otherwise(col("ver")))
      val c = cfg.copy(allowSchemaDrift = SchemaDrift.Full)
      new Synchronizer(spark, new DataFrameSource(base, pk), dest, c).execute()
      new Synchronizer(spark, new DataFrameSource(widened, pk), dest, c).execute()
    }

  /** Two full loads (ForceFull mode appends a complete snapshot). */
  def fullTwiceDest(spark: SparkSession, dir: String): String =
    run("full2", spark, dir) { dest =>
      val b1 = batch1(spark, dir)
      new Synchronizer(spark, new DataFrameSource(b1, pk), dest, cfg).execute()
      new Synchronizer(spark, new DataFrameSource(b1, pk), dest,
        cfg.copy(loadMode = LoadMode.ForceFull)).execute()
    }

  /** Query-as-source: a filtered projection plays the source relation. */
  def querySourceDest(spark: SparkSession, dir: String): String =
    run("qsrc", spark, dir) { dest =>
      val q = batch1(spark, dir).filter(col("c_acctbal") > 1000)
      new Synchronizer(spark, new DataFrameSource(q, pk), dest, cfg).execute()
    }

  /** Delta scenario on a private dest, then latest_pk_version wiped and
    * rebuilt from history via the W1 window query (restore_pk path). */
  def restorePkDest(spark: SparkSession, dir: String): String =
    run("restorepk", spark, dir) { dest =>
      new Synchronizer(spark, new DataFrameSource(batch1(spark, dir), pk), dest, cfg).execute()
      val src2 = new DataFrameSource(batch2(spark, dir), pk)
      new Synchronizer(spark, src2, dest, cfg).execute()
      // wipe the snapshot; the engine must recompute it from history alone
      def rm(p: java.nio.file.Path): Unit = {
        if (Files.isDirectory(p)) {
          val s = Files.list(p)
          try s.forEach(rm) finally s.close()
        }
        Files.deleteIfExists(p)
      }
      rm(java.nio.file.Paths.get(dest, "delta_load", "latest_pk_version"))
      val sync = new Synchronizer(spark, src2, dest, cfg)
      require(sync.restoreLastPk(), "restore must succeed")
    }

  /** Streaming CDC: the SAME two snapshots the batch `deltaDest` scenario
    * loads, but delivered as parquet file drops through `scd2SyncStream`
    * (readStream → foreachBatch → full Synchronizer, one snapshot per
    * micro-batch). The stream runs once per drop — the deterministic
    * one-snapshot-per-batch cut — so the resulting history must equal the
    * batch engine's history for the same drops, and therefore the same
    * DuckDB oracle as `scd2_history`. */
  def streamingCdcDest(spark: SparkSession, dir: String): String =
    run("streamcdc", spark, dir) { dest =>
      val dropDir = Files.createTempDirectory("graft-streamcdc-in").toString
      val ckpt = Files.createTempDirectory("graft-streamcdc-ckpt").toString
      val schema = batch1(spark, dir).schema
      def drop(df: DataFrame): Unit =
        df.coalesce(1).write.mode("append").parquet(dropDir)
      drop(batch1(spark, dir))
      graft.streaming.StreamingIngest.scd2SyncStream(
        spark, dropDir, schema, pk, dest, ckpt, cfg)
      drop(batch2(spark, dir))
      graft.streaming.StreamingIngest.scd2SyncStream(
        spark, dropDir, schema, pk, dest, ckpt, cfg)
    }

  /** Vector-corpus CDC: the embeddings table (array<float> payload) synced
    * through the full SCD2 engine — relabels, inserts, deletions (tombstones
    * carry NULL arrays). Mutations: % 19 deleted; % 13 relabeled (ver 2);
    * % 17 inserted under a shifted id. */
  def vectorCorpusDest(spark: SparkSession, dir: String): String =
    run("vec", spark, dir) { dest =>
      val b1 = Fixtures.pq(spark, s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"), col("label"), lit(1L).as("ver"))
      val b2 = b1.filter(col("vec_id") % 19 =!= 0)
        .withColumn("label",
          when(col("vec_id") % 13 === 0, col("label") + 100).otherwise(col("label")))
        .withColumn("ver",
          when(col("vec_id") % 13 === 0, lit(2L)).otherwise(col("ver")))
        .unionByName(b1.filter(col("vec_id") % 17 === 0)
          .withColumn("vec_id", col("vec_id") + 100000L)
          .withColumn("ver", lit(2L)))
      val c = WriteConfig(deltaCol = Some("ver"))
      new Synchronizer(spark, new DataFrameSource(b1, Seq("vec_id")), dest, c).execute()
      new Synchronizer(spark, new DataFrameSource(b2, Seq("vec_id")), dest, c).execute()
    }

  /** Training-data capstone: documents ingested as an SCD2 corpus (edits +
    * deletions), then the CURRENT corpus flows through quality filtering
    * and exact dedup — the composed pipeline a pretraining dataset build
    * runs. Mutations: doc_id % 31 == 0 deleted; % 7 == 0 edited (suffix). */
  def docsPipelineDest(spark: SparkSession, dir: String): String =
    run("docs", spark, dir) { dest =>
      val docs = Fixtures.pq(spark, s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"), lit(1L).as("ver"))
      val b2 = docs.filter(col("doc_id") % 31 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" edited7")))
            .otherwise(col("text")))
        .withColumn("ver", when(col("doc_id") % 7 === 0, lit(2L)).otherwise(col("ver")))
      val c = WriteConfig(deltaCol = Some("ver"))
      new Synchronizer(spark, new DataFrameSource(docs, Seq("doc_id")), dest, c).execute()
      new Synchronizer(spark, new DataFrameSource(b2, Seq("doc_id")), dest, c).execute()
    }

  /** Current document corpus of the docs pipeline destination. */
  def docsCurrent(spark: SparkSession, dir: String): DataFrame = {
    val dest = docsPipelineDest(spark, dir)
    val sync = new Synchronizer(spark,
      new DataFrameSource(
        Fixtures.pq(spark, s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"), lit(1L).as("ver")), Seq("doc_id")),
      dest, WriteConfig(deltaCol = Some("ver")))
    sync.currentState().select("doc_id", "text")
  }

  private def lineitemSlim(spark: SparkSession, dir: String): DataFrame =
    Fixtures.pq(spark, s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")

  /** Quarter of the l_orderkey space (Long division — the DuckDB oracle
    * mirrors it with `//`). */
  def orderkeyQuarter(spark: SparkSession, dir: String): Long =
    Fixtures.pq(spark, s"$dir/lineitem.parquet")
      .agg(max("l_orderkey")).head().getLong(0) / 4

  /** VersionedTable of lineitem appended in 4 disjoint l_orderkey ranges —
    * each commit's dir stats cover a quarter of the key space, so
    * `readWhere` range predicates drop dirs before listing (manifest-level
    * data skipping; the spec asserts the dir counts, the gate asserts the
    * RESULT is still exact). */
  def skipDest(spark: SparkSession, dir: String): String =
    run("skip", spark, dir) { dest =>
      val li = lineitemSlim(spark, dir)
      val q = orderkeyQuarter(spark, dir)
      val t = new graft.store.VersionedTable(spark, dest)
      t.append(li.filter(col("l_orderkey") <= q))
      t.append(li.filter(col("l_orderkey") > q && col("l_orderkey") <= 2 * q))
      t.append(li.filter(col("l_orderkey") > 2 * q && col("l_orderkey") <= 3 * q))
      t.append(li.filter(col("l_orderkey") > 3 * q)): Unit
    }

  /** VersionedTable of lineitem appended in 4 MODULO chunks (every dir spans
    * the full key range — nothing prunes), then OPTIMIZE z-order-clustered
    * by (l_orderkey, l_partkey) into 8 dirs: after compaction both columns
    * prune again. The gate reads a partkey slice back exactly. */
  def optimizeDest(spark: SparkSession, dir: String): String =
    run("optz", spark, dir) { dest =>
      val li = lineitemSlim(spark, dir)
      val t = new graft.store.VersionedTable(spark, dest)
      (0 until 4).foreach(k => t.append(li.filter(col("l_orderkey") % 4 === k)))
      t.optimize(clusterBy = Seq("l_orderkey", "l_partkey"), targetDirs = 8,
        zorder = true): Unit
    }

  /** VersionedTable of supplier built in two appends + a merge, then
    * STRIPPED of its `_graft_log/` — what survives is only the public
    * `_delta_log/` mirror, so reading it back exercises the external
    * Delta-protocol reader end-to-end (log replay → live add-set →
    * DeltaFileIndex scan) with zero graft metadata to lean on. */
  def deltaReadDest(spark: SparkSession, dir: String): String =
    run("deltaread", spark, dir) { dest =>
      val sup = Fixtures.pq(spark, s"$dir/supplier.parquet")
        .select("s_suppkey", "s_name", "s_acctbal")
      val t = new graft.store.VersionedTable(spark, dest)
      t.append(sup.filter(col("s_suppkey") % 2 === 0))
      t.append(sup.filter(col("s_suppkey") % 2 === 1))
      t.merge(sup.filter(col("s_suppkey") % 5 === 0)
        .withColumn("s_acctbal", col("s_acctbal") + 1000.0), Seq("s_suppkey"))
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(s"$dest/_graft_log"))
    }

  /** VersionedTable on customer with the change-data feed enabled, then one
    * merge (updates %89 get +100, inserts %83 under shifted keys): commit 2
    * materializes exact update_preimage/update_postimage/insert provenance
    * under `_change_data/` — what `readChangeFeed` surfaces to CDC
    * consumers (Delta's table_changes semantics for MERGE). */
  def cdfMergeDest(spark: SparkSession, dir: String): String =
    run("cdfmerge", spark, dir) { dest =>
      val cust = customer(spark, dir).select(
        col("c_custkey"), col("c_name"), col("c_acctbal"))
      val t = new graft.store.VersionedTable(spark, dest)
      t.append(cust) // v0
      t.setProperties(Map(graft.store.VersionedTable.CdfProp -> "true")) // v1
      val src = cust.filter(col("c_custkey") % 89 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 100)
        .unionByName(cust.filter(col("c_custkey") % 83 === 0)
          .withColumn("c_custkey", col("c_custkey") + 10000000L))
      t.merge(src, Seq("c_custkey")): Unit // v2
    }

  /** VersionedTable on lineitem split into two data dirs, then two DV
    * DELETE WHEREs (merge-on-read: rows are marked in per-file roaring
    * bitmaps, no data file is rewritten — StoreDvSpec carries the
    * structural assertions). Shared by `store_dv_delete` (native read) and
    * `store_dv_mirror` (the SAME surviving rows resolved through the
    * mirrored `_delta_log` by the external Delta reader, deletionVectors
    * protocol feature and all). */
  def dvDeleteDest(spark: SparkSession, dir: String): String =
    run("dvdelete", spark, dir) { dest =>
      val li = Fixtures.pq(spark, s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"))
      val half = li.agg(max(col("l_orderkey"))).head().getLong(0) / 2
      val t = new graft.store.VersionedTable(spark, dest)
      t.append(li.filter(col("l_orderkey") <= half)) // v0
      t.append(li.filter(col("l_orderkey") > half)) // v1
      t.delete(col("l_quantity") >= 45) // v2: DVs across both dirs
      t.delete(col("l_suppkey") % 7 === 0): Unit // v3: unions into v2's DVs
    }

  /** VersionedTable on customer, then one DELETION-VECTOR-mode merge
    * (updates %89 get +100, inserts %83 under shifted keys): matched rows
    * are DV'd in place instead of rewriting the touched dirs — the
    * `store_dv_merge` gate proves the merge-on-read snapshot equals the
    * plain SQL merge result. */
  def dvMergeDest(spark: SparkSession, dir: String): String =
    run("dvmerge", spark, dir) { dest =>
      val cust = customer(spark, dir).select(
        col("c_custkey"), col("c_name"), col("c_acctbal"))
      val t = new graft.store.VersionedTable(spark, dest)
      t.append(cust) // v0
      val src = cust.filter(col("c_custkey") % 89 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 100)
        .unionByName(cust.filter(col("c_custkey") % 83 === 0)
          .withColumn("c_custkey", col("c_custkey") + 10000000L))
      t.merge(src, Seq("c_custkey"), useDeletionVectors = true): Unit // v1
    }

  /** The graft-table STREAMING SOURCE end-to-end: a VersionedTable built
    * in two appends (even keys, then odd keys), each followed by an
    * AvailableNow drain through `format("graft-table")` into one parquet
    * sink over one checkpoint — the first drain is the initial snapshot,
    * the second streams exactly the second commit; the sink must therefore
    * equal the full customer table with no duplicates. */
  def tableStreamDest(spark: SparkSession, dir: String): String =
    run("tblstream", spark, dir) { dest =>
      val cust = customer(spark, dir).select(
        col("c_custkey"), col("c_name"), col("c_acctbal"))
      val t = new graft.store.VersionedTable(spark, s"$dest/tbl")
      def drain(): Unit = {
        val q = spark.readStream.format("graft-table")
          .option("path", s"$dest/tbl").load()
          .writeStream.format("parquet")
          .option("path", s"$dest/sink")
          .option("checkpointLocation", s"$dest/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      t.append(cust.filter(col("c_custkey") % 2 === 0)) // v0
      drain() // initial snapshot
      t.append(cust.filter(col("c_custkey") % 2 =!= 0)) // v1
      drain() // incremental: exactly commit v1's rows
    }

  /** The FOREIGN-Delta streaming source end-to-end: a graft-mirrored v0
    * stripped to a pure `_delta_log` destination, drained as a stream
    * (snapshot batch), then continued with a [[graft.store.ForeignDeltaTable]]
    * append and drained again (incremental batch = exactly commit v1's
    * files) — `format("graft-table")` auto-detects the foreign table and
    * engages [[graft.streaming.DeltaStreamSource]]. */
  def deltaStreamDest(spark: SparkSession, dir: String): String =
    run("deltastream", spark, dir) { dest =>
      val cust = customer(spark, dir).select(
        col("c_custkey"), col("c_name"), col("c_acctbal"))
      val t = new graft.store.VersionedTable(spark, s"$dest/tbl")
      t.append(cust.filter(col("c_custkey") % 2 === 0)) // v0, mirrored
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(s"$dest/tbl/_graft_log")) // now a foreign table
      def drain(): Unit = {
        val q = spark.readStream.format("graft-table")
          .option("path", s"$dest/tbl").load()
          .writeStream.format("parquet")
          .option("path", s"$dest/sink")
          .option("checkpointLocation", s"$dest/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain() // initial snapshot at v0
      val f = new graft.store.ForeignDeltaTable(spark, s"$dest/tbl")
      f.append(cust.filter(col("c_custkey") % 2 =!= 0)) // v1: foreign commit
      drain() // incremental: exactly commit v1's files
    }

  /** CDF-enabled FOREIGN table for the batch change-feed gate: graft v0
    * (half of customer) + the CDF property, graft log stripped — then a
    * blind append (v2, derives as inserts) and a DV deleteWhere (v3, real
    * cdc actions) through [[graft.store.ForeignDeltaTable]]. The gate
    * reads `DeltaTable.readChanges(1, 3)` — exactly delta-spark's
    * `table_changes` over the same log. */
  def foreignCdfDest(spark: SparkSession, dir: String): String =
    run("foreigncdf", spark, dir) { dest =>
      val cust = customer(spark, dir).select(
        col("c_custkey"), col("c_name"), col("c_acctbal"))
      val t = new graft.store.VersionedTable(spark, s"$dest/tbl")
      t.append(cust.filter(col("c_custkey") % 2 === 0)) // v0
      t.setProperties(Map(
        graft.store.VersionedTable.CdfProp -> "true")) // v1: (1,4) + delta key
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(s"$dest/tbl/_graft_log"))
      val f = new graft.store.ForeignDeltaTable(spark, s"$dest/tbl")
      f.append(cust.filter(col("c_custkey") % 2 =!= 0)) // v2: blind append
      f.deleteWhere(col("c_custkey") % 3 === 0,
        allowProtocolUpgrade = true): Unit // v3: DV delete + cdc actions
    }

  /** FOREIGN-table MERGE for the `store_foreign_merge` gate: a graft table
    * on customer stripped to its pure `_delta_log`, then ONE
    * [[graft.store.ForeignDeltaTable.merge]] commit (updates %89 get +100,
    * inserts %83 under shifted keys — the same batch the graft-native
    * `store_dv_merge` gate uses, so the two gates share an oracle shape):
    * matched rows DV'd in place, source landed as fresh files. */
  def foreignMergeDest(spark: SparkSession, dir: String): String =
    run("foreignmerge", spark, dir) { dest =>
      val cust = customer(spark, dir).select(
        col("c_custkey"), col("c_name"), col("c_acctbal"))
      val t = new graft.store.VersionedTable(spark, s"$dest/tbl")
      t.append(cust) // v0, mirrored
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(s"$dest/tbl/_graft_log"))
      val src = cust.filter(col("c_custkey") % 89 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 100)
        .unionByName(cust.filter(col("c_custkey") % 83 === 0)
          .withColumn("c_custkey", col("c_custkey") + 10000000L))
      new graft.store.ForeignDeltaTable(spark, s"$dest/tbl")
        .merge(src, Seq("c_custkey"), allowProtocolUpgrade = true): Unit // v1
    }

  /** FOREIGN-table RESTORE for the `store_foreign_restore` gate: customer
    * stripped to a pure `_delta_log`, a DV deleteWhere (%3) and an
    * updateWhere (%7 gets +1000) layered on, then `restore(0)` — the
    * external read must be EXACTLY the original customer again (the DV and
    * the update both roll back as one forward commit). */
  def foreignRestoreDest(spark: SparkSession, dir: String): String =
    run("foreignrestore", spark, dir) { dest =>
      val cust = customer(spark, dir).select(
        col("c_custkey"), col("c_name"), col("c_acctbal"))
      val t = new graft.store.VersionedTable(spark, s"$dest/tbl")
      t.append(cust) // v0
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(s"$dest/tbl/_graft_log"))
      val f = new graft.store.ForeignDeltaTable(spark, s"$dest/tbl")
      f.deleteWhere(col("c_custkey") % 3 === 0, allowProtocolUpgrade = true) // v1
      f.updateWhere(col("c_custkey") % 7 === 0,
        Map("c_acctbal" -> (col("c_acctbal") + 1000))) // v2
      f.restore(0): Unit // v3: both mutations roll back
    }

  /** FOREIGN table with DECLARED column contracts for the
    * `store_foreign_policy` gate: a hand-built empty v0 whose schema
    * carries a NOT NULL key, a generated column (`c_mod = c_custkey % 5`)
    * and a CHECK constraint on `c_acctbal`. Customer is appended WITHOUT
    * the generated column (the writer computes it in-plan), a violating
    * append is refused in-flight (the table must stay untouched), then an
    * updateWhere (%7 gets +1000) re-lands rows with the generated column
    * recomputed. The external read must equal the plain-SQL projection of
    * the same operations — proving enforcement/compute happened without
    * corrupting anything. */
  def foreignPolicyDest(spark: SparkSession, dir: String): String =
    run("foreignpolicy", spark, dir) { dest =>
      import org.apache.spark.sql.types._
      val cust = customer(spark, dir).select(
        col("c_custkey"), col("c_name"), col("c_acctbal"))
      val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      val genMeta = new MetadataBuilder()
        .putString("delta.generationExpression", "c_custkey % 5").build()
      val schema = StructType(Seq(
        StructField("c_custkey", LongType, nullable = false),
        StructField("c_name", StringType),
        StructField("c_acctbal", DoubleType),
        StructField("c_mod", LongType, nullable = true, genMeta)))
      val tbl = s"$dest/tbl"
      new java.io.File(s"$tbl/_delta_log").mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(tbl, "_delta_log", "00000000000000000000.json"),
        Seq(
          """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
            """"writerFeatures":["checkConstraints","generatedColumns","invariants"]}}""",
          s"""{"metaData":{"id":"graft-policy","format":{"provider":"parquet","options":{}},""" +
            s""""schemaString":${mapper.writeValueAsString(schema.json)},""" +
            s""""partitionColumns":[],"configuration":{""" +
            s""""delta.constraints.bal_range":"c_acctbal > -100000.0 and c_acctbal < 1000000.0"},""" +
            s""""createdTime":1}}""").mkString("\n").getBytes("UTF-8")): Unit
      val f = new graft.store.ForeignDeltaTable(spark, tbl)
      f.append(cust) // v1: c_mod computed in the write plan
      // a violating batch must abort IN-FLIGHT and leave the table at v1
      val refused =
        try { f.append(cust.limit(1).withColumn("c_acctbal", lit(-5e6))); false }
        catch { case scala.util.control.NonFatal(_) => true }
      require(refused && graft.store.DeltaTable.snapshot(spark, tbl).version == 1L,
        "constraint violation did not abort untouched")
      f.updateWhere(col("c_custkey") % 7 === 0,
        Map("c_acctbal" -> (col("c_acctbal") + 1000)),
        allowProtocolUpgrade = true): Unit // v2: c_mod recomputed per row
    }

  /** Liquid-clustered FOREIGN table for the `store_foreign_cluster` gate:
    * a hand-built empty clustered v0 (clustering + domainMetadata writer
    * features; the `delta.clustering` domain names `c_acctbal`), customer
    * appended as four modulo slices — every file spans the full acctbal
    * range, so stats prune NOTHING — then OPTIMIZE FULL re-clusters by the
    * domain's column. In-scenario asserts pin the clustered layout
    * (several files, pairwise-disjoint acctbal spans); the gate compares
    * the external read against plain SQL over customer, proving the
    * rewrite moved rows between files without changing any. */
  def foreignClusterDest(spark: SparkSession, dir: String): String =
    run("foreigncluster", spark, dir) { dest =>
      import org.apache.spark.sql.types._
      val cust = customer(spark, dir).select(
        col("c_custkey"), col("c_name"), col("c_acctbal"))
      val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      val schema = StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_acctbal", DoubleType)))
      val tbl = s"$dest/tbl"
      new java.io.File(s"$tbl/_delta_log").mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(tbl, "_delta_log", "00000000000000000000.json"),
        Seq(
          """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
            """"writerFeatures":["clustering","domainMetadata"]}}""",
          s"""{"metaData":{"id":"graft-cluster","format":{"provider":"parquet","options":{}},""" +
            s""""schemaString":${mapper.writeValueAsString(schema.json)},""" +
            s""""partitionColumns":[],"configuration":{},"createdTime":1}}""",
          """{"domainMetadata":{"domain":"delta.clustering",""" +
            """"configuration":"{\"clusteringColumns\":[[\"c_acctbal\"]]}","removed":false}}"""
        ).mkString("\n").getBytes("UTF-8")): Unit
      val f = new graft.store.ForeignDeltaTable(spark, tbl)
      (0 until 4).foreach(i =>
        f.append(cust.filter(col("c_custkey") % 4 === i).coalesce(1))) // v1..v4
      val bytes = graft.store.DeltaTable.snapshot(spark, tbl).numBytes
      f.optimize(targetFileBytes = math.max(1L, bytes / 6), full = true): Unit // v5
      // pin the clustered layout: several files, disjoint acctbal spans
      val spans = graft.store.DeltaTable.statsRanges(spark, tbl, "c_acctbal")
      require(spans.size >= 3, s"expected a multi-file clustered rewrite: $spans")
      spans.sortBy(_._1).sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) =>
          require(hi <= lo2, s"overlapping clustered spans: $spans")
        case _ => ()
      }
    }

  /** SHALLOW CLONE for the `store_foreign_clone` gate: customer stripped
    * to a pure `_delta_log`, cloned (metadata-only, absolute-URI adds),
    * then the CLONE takes a DV delete (%3) while the source must stay
    * byte-for-byte untouched — divergence is asserted in-scenario, and
    * the gate compares the mutated clone against the plain-SQL filter. */
  def foreignCloneDest(spark: SparkSession, dir: String): String =
    run("foreignclone", spark, dir) { dest =>
      val cust = customer(spark, dir).select(
        col("c_custkey"), col("c_name"), col("c_acctbal"))
      val t = new graft.store.VersionedTable(spark, s"$dest/src")
      t.append(cust) // v0
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(s"$dest/src/_graft_log"))
      graft.store.ForeignDeltaTable.shallowClone(
        spark, s"$dest/src", s"$dest/clone"): Unit
      new graft.store.ForeignDeltaTable(spark, s"$dest/clone")
        .deleteWhere(col("c_custkey") % 3 === 0, allowProtocolUpgrade = true): Unit
      val srcCount = graft.store.DeltaTable.read(spark, s"$dest/src").count()
      require(srcCount == cust.count(),
        "clone mutation leaked into the source table")
    }

  /** Row-tracked FOREIGN table for the `store_row_ids` gate: a hand-built
    * rt-ACTIVE empty v0 (protocol (1,7), rowTracking + domainMetadata, no
    * files), then two deterministic single-file appends through
    * [[graft.store.ForeignDeltaTable]] — even c_custkey sorted asc takes
    * fresh ids 0..n1-1 at commit 1, odd sorted asc takes n1..n1+n2-1 at
    * commit 2 — and a DV deleteWhere (%5) that must keep every SURVIVING
    * row's id stable (the protocol's row-identity contract). */
  def rowTrackedDest(spark: SparkSession, dir: String): String =
    run("rowids", spark, dir) { dest =>
      val cust = customer(spark, dir).select(
        col("c_custkey"), col("c_name"), col("c_acctbal"))
      val mapper = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      val tbl = s"$dest/tbl"
      new java.io.File(s"$tbl/_delta_log").mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(tbl, "_delta_log", "00000000000000000000.json"),
        Seq(
          """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
            """"writerFeatures":["rowTracking","domainMetadata"]}}""",
          s"""{"metaData":{"id":"graft-rowids","format":{"provider":"parquet","options":{}},""" +
            s""""schemaString":${mapper.writeValueAsString(cust.schema.json)},""" +
            s""""partitionColumns":[],"configuration":{"delta.enableRowTracking":"true"},"createdTime":1}}""")
          .mkString("\n").getBytes("UTF-8")): Unit
      val f = new graft.store.ForeignDeltaTable(spark, tbl)
      def oneFile(df: DataFrame): DataFrame =
        df.repartition(1).sortWithinPartitions("c_custkey")
      f.append(oneFile(cust.filter(col("c_custkey") % 2 === 0))) // v1
      f.append(oneFile(cust.filter(col("c_custkey") % 2 =!= 0))) // v2
      f.deleteWhere(col("c_custkey") % 5 === 0,
        allowProtocolUpgrade = true): Unit // v3: ids must not shift
    }

  /** NON-memoized two-drop stream drain for the BENCH headline: every call
    * builds a fresh graft table (v0 = half of customer), drains the
    * snapshot, appends v1, drains the increment — so the measured figure
    * is the live streaming path (offset resolution + 2 AvailableNow
    * micro-batch plans + sink commit), not a cache read. An O(table)
    * regression in offset/commit resolution shows here first. */
  def freshStreamDrain(spark: SparkSession, dir: String): String = {
    val dest = Files.createTempDirectory("graft-drainbench").toString
    val cust = customer(spark, dir).select(
      col("c_custkey"), col("c_name"), col("c_acctbal"))
    val t = new graft.store.VersionedTable(spark, s"$dest/tbl")
    def drain(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("path", s"$dest/tbl").load()
        .writeStream.format("parquet")
        .option("path", s"$dest/sink")
        .option("checkpointLocation", s"$dest/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    t.append(cust.filter(col("c_custkey") % 2 === 0)) // v0
    drain()
    t.append(cust.filter(col("c_custkey") % 2 =!= 0)) // v1
    drain()
    dest
  }

  /** Supplier batch 1/2 for the multi-table sync: same mutation grammar as
    * the customer batches on coprime moduli (deletes %19, updates %13 get
    * +50, inserts %17 under shifted keys). */
  def supplierBatch1(spark: SparkSession, dir: String): DataFrame =
    Fixtures.pq(spark, s"$dir/supplier.parquet").select(
      col("s_suppkey"), col("s_name"), col("s_acctbal"), lit(1L).as("ver"))

  def supplierBatch2(spark: SparkSession, dir: String): DataFrame = {
    val b1 = supplierBatch1(spark, dir)
    b1.filter(col("s_suppkey") % 19 =!= 0)
      .withColumn("s_acctbal",
        when(col("s_suppkey") % 13 === 0, col("s_acctbal") + 50).otherwise(col("s_acctbal")))
      .withColumn("ver",
        when(col("s_suppkey") % 13 === 0, lit(2L)).otherwise(col("ver")))
      .unionByName(b1.filter(col("s_suppkey") % 17 === 0)
        .withColumn("s_suppkey", col("s_suppkey") + 1000000L)
        .withColumn("ver", lit(2L)))
  }

  /** Two tables (customer + supplier) synced CONCURRENTLY through
    * `Graft.syncAll` at parallelism 2, two rounds (full load, then delta):
    * both destination histories must equal what per-table batch runs
    * produce — the gates hash them against the same-shape DuckDB oracles. */
  def syncAllRoot(spark: SparkSession, dir: String): String =
    run("syncall", spark, dir) { root =>
      def tables(cust: DataFrame, sup: DataFrame) = Seq(
        Graft.TableSync(new DataFrameSource(cust, pk), s"$root/customer", cfg),
        Graft.TableSync(new DataFrameSource(sup, Seq("s_suppkey")),
          s"$root/supplier", WriteConfig(deltaCol = Some("ver"))))
      Seq(
        tables(batch1(spark, dir), supplierBatch1(spark, dir)),
        tables(batch2(spark, dir), supplierBatch2(spark, dir))
      ).foreach { ts =>
        val rs = Graft.syncAll(spark, ts, parallelism = 2)
        rs.zipWithIndex.foreach {
          case (Left(e), i) => throw new IllegalStateException(
            s"syncAll table ${ts(i).destRoot} failed", e)
          case _ => ()
        }
      }
    }

  /** Migration continuation (the external-Delta WRITE path): batch 1 full
    * loads through the normal graft engine, then the destination is
    * STRIPPED to what a reference (delta-spark/delta-rs) deployment's
    * `dest/delta` is — the pure `_delta_log/` (graft's mirror emits real
    * protocol commits), no `_graft_log`, no aux snapshot tables — and the
    * batch-2 delta load CONTINUES that foreign table in place through
    * [[graft.store.ForeignDeltaTable]]: pk state rebuilds from history
    * (restore path), inserts/updates append and deletes tombstone as
    * native Delta JSON commits. The combined history must equal what the
    * all-graft `deltaDest` run produces → the same oracle as
    * `scd2_history`. */
  def foreignDeltaDest(spark: SparkSession, dir: String): String =
    run("foreigndelta", spark, dir) { dest =>
      new Synchronizer(spark, new DataFrameSource(batch1(spark, dir), pk), dest, cfg).execute()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      Seq("delta/_graft_log", "delta_load", "meta", "log")
        .foreach(p => rm(new java.io.File(s"$dest/$p")))
      val w = new Synchronizer(spark, new DataFrameSource(batch2(spark, dir), pk), dest, cfg)
      require(w.dest.delta.isInstanceOf[graft.store.ForeignDeltaTable],
        "stripped destination must engage the foreign-Delta writer")
      w.execute(): Unit
    }

  /** Consistency auto-fix end-to-end (reference consistency.py:17-56 +
    * tests/test_10_consistency_fix.py): full load, then CORRUPT
    * latest_pk_version BOTH ways — drop the rows batch 2 will delete
    * (% 97) and add a bogus pk — so an unrepaired snapshot would
    * mis-detect deletes in the next run (missing rows → lost tombstones;
    * the bogus row → a spurious tombstone). checkConsistency(autoFix)
    * must flag both corruption classes and rewrite the snapshot from
    * history; the subsequent batch-2 delta load must then produce a
    * history indistinguishable from the never-corrupted sequence (same
    * DuckDB oracle as `scd2_history`). */
  def consistencyFixDest(spark: SparkSession, dir: String): String =
    run("consfix", spark, dir) { dest =>
      val s1 = new Synchronizer(spark, new DataFrameSource(batch1(spark, dir), pk), dest, cfg)
      s1.execute()
      val pkTable = s1.dest.latestPkVersion
      val bogus = pkTable.read().limit(1)
        .withColumn("c_custkey", lit(99999999L))
      pkTable.overwrite(
        pkTable.read().filter(col("c_custkey") % 97 =!= 0).unionByName(bogus))
      val issues = s1.checkConsistency(autoFix = true).select("__issue")
        .distinct().collect().map(_.getString(0)).toSet
      require(issues == Set("added in persisted data", "missing in persisted data"),
        s"corruption must be detected both ways, got $issues")
      require(s1.checkConsistency().isEmpty, "autoFix must repair the snapshot")
      new Synchronizer(spark, new DataFrameSource(batch2(spark, dir), pk), dest, cfg).execute()
    }

  /** History of a destination without the wall-clock column. */
  def history(spark: SparkSession, dest: String): DataFrame =
    new graft.store.VersionedTable(spark, s"$dest/delta").read().drop(SystemCols.timestamp)

  def latestPk(spark: SparkSession, dest: String): DataFrame =
    new graft.store.VersionedTable(spark, s"$dest/delta_load/latest_pk_version").read()
}
