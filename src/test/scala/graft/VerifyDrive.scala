package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.scd2.Synchronizer
import graft.sources.{DataFrameSource, ParquetSource, Source}

/** Manual end-to-end drive of the public library API — NOT a test suite.
  * Run with: sbt "Test/runMain graft.VerifyDrive". Prints observations for
  * human inspection of the r2 bug fixes. */
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("updated_at", TimestampType), // a GENUINE timestamp column
      StructField("ver", LongType)))
    def df(rows: Seq[(Long, String, String, Long)]): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r =>
          Row(r._1, r._2, java.sql.Timestamp.valueOf(r._3), r._4))), schema)

    val tmp = Files.createTempDirectory("graft-verify").toString
    val srcPath = s"$tmp/src"; val destPath = s"$tmp/dest"
    df(Seq(
      (1L, "alpha", "2026-01-01 10:00:00", 100L),
      (2L, "beta",  "2026-01-01 11:00:00", 101L),
      (3L, "gamma", "2026-01-01 12:00:00", 102L)
    )).write.mode("overwrite").parquet(srcPath)

    val source = new ParquetSource(srcPath, pks = Seq("id"))
    val cfg = WriteConfig(deltaCol = Some("ver"), noComplexEntriesLoad = true)

    println("=== 1. full load through public API ===")
    val r1 = new Synchronizer(spark, source, destPath, cfg).execute()
    println(s"result: $r1")
    val sync0 = new Synchronizer(spark, source, destPath, cfg)
    println("history schema: " + sync0.dest.delta.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))

    println("\n=== 2. strange-update FALLBACK path (ver moved backwards, noComplexEntriesLoad) ===")
    df(Seq(
      (1L, "alpha",    "2026-01-01 10:00:00", 100L),
      (2L, "restored", "2026-01-02 09:00:00", 50L), // ver 101 -> 50 (backup restore)
      (3L, "gamma",    "2026-01-01 12:00:00", 102L),
      (4L, "delta",    "2026-01-02 10:00:00", 103L) // genuine insert
    )).write.mode("overwrite").parquet(srcPath)
    val sync2 = new Synchronizer(spark, source, destPath, cfg)
    println(s"result: ${sync2.execute()}")
    println("history:")
    sync2.dest.delta.read().orderBy("id", SystemCols.timestamp).show(20, false)
    println("current state:")
    sync2.currentState().orderBy("id").show(10, false)
    println(s"consistency issues: ${sync2.checkConsistency().count()}")

    println("\n=== 3. PROBE: strange row exactly at MIN watermark, repeated run (idempotency) ===")
    val syncAgain = new Synchronizer(spark, source, destPath, cfg)
    println(s"re-run with unchanged source: ${syncAgain.execute()} (expect NoLoad)")

    println("\n=== 4. PROBE: lock atomicity — concurrent acquire ===")
    val d = new graft.scd2.SyncDestination(spark, destPath)
    d.acquireLock()
    try {
      try { new Synchronizer(spark, source, destPath, cfg).execute(); println("BAD: second writer got in") }
      catch { case e: IllegalStateException => println(s"locked out as expected: ${e.getMessage}") }
    } finally d.releaseLock()

    println("\n=== 5. PROBE: rollback restores primary_keys_ts (failure mid-run) ===")
    val pkTsBefore = sync2.dest.primaryKeysTs.latestVersion
    val pkTsContentBefore = sync2.dest.primaryKeysTs.read().collect().map(_.toString).sorted.toSeq
    // source whose read() blows up on the 4th driver-side call — i.e. AFTER
    // step 1 has already overwritten primary_keys_ts (driver-side calls: sourceState=1,
    // sourceState=2, step1=2, step2 projection=3)
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val flaky: Source = new Source {
      val inner = new ParquetSource(srcPath, pks = Seq("id"))
      def read(s: SparkSession): DataFrame = {
        if (calls.incrementAndGet() == 3) sys.error("simulated source outage at step 2")
        inner.read(s)
      }
      def columns(s: SparkSession) = inner.columns(s)
      def primaryKeys(s: SparkSession) = inner.primaryKeys(s)
    }
    // mutate source so a load actually starts
    df(Seq(
      (1L, "alpha",    "2026-01-01 10:00:00", 100L),
      (2L, "restored", "2026-01-02 09:00:00", 50L),
      (3L, "gamma2",   "2026-01-03 12:00:00", 200L),
      (4L, "delta",    "2026-01-02 10:00:00", 103L)
    )).write.mode("overwrite").parquet(srcPath)
    try { new Synchronizer(spark, flaky, destPath, cfg).execute(); println("flaky run unexpectedly succeeded") }
    catch { case e: Throwable => println(s"flaky run failed as intended: ${e.getMessage.take(60)}") }
    val after = new Synchronizer(spark, source, destPath, cfg).dest.primaryKeysTs
    val pkTsContentAfter = after.read().collect().map(_.toString).sorted.toSeq
    println(s"primary_keys_ts version before=$pkTsBefore afterFailedRun=${after.latestVersion}")
    println(s"content restored to pre-run snapshot: ${pkTsContentBefore == pkTsContentAfter}")
    val sync5 = new Synchronizer(spark, source, destPath, cfg)
    println(s"recovery run: ${sync5.execute()} (expect DeltaLoad with 1 insert — NOT NoLoad)")
    sync5.currentState().orderBy("id").show(10, false)

    println("\n=== 6b. PROBE: mid-load source mutation -> dirty run + warn record ===")
    // a source that grows one row between the state probe and the pk
    // snapshot: the final count check must flag the run dirty and log it
    val growCalls = new java.util.concurrent.atomic.AtomicInteger(0)
    val growing: Source = new Source {
      val base = new ParquetSource(srcPath, pks = Seq("id"))
      def read(s: SparkSession): DataFrame = {
        // call 1 = state probe: one new row (load proceeds, count=5);
        // call 2+ = pk snapshot onwards: ANOTHER row appears mid-load
        val n = growCalls.incrementAndGet()
        val extra =
          if (n == 1) Seq((99L, "late", "2026-01-05 00:00:00", 999L))
          else Seq((99L, "late", "2026-01-05 00:00:00", 999L),
            (98L, "later", "2026-01-05 01:00:00", 998L))
        base.read(s).unionByName(df(extra))
      }
      def columns(s: SparkSession) = base.columns(s)
      def primaryKeys(s: SparkSession) = base.primaryKeys(s)
    }
    val syncDirty = new Synchronizer(spark, growing, destPath, cfg)
    val rDirty = syncDirty.execute()
    println(s"result: $rDirty (expect dirty=true)")
    val warns = syncDirty.dest.log.read().filter(col("type") === "warn")
      .select("message").collect().map(_.getString(0))
    println("warn records: " + warns.mkString(" | "))

    println("\n=== 6. PROBE: tsql type map via sourceType (rowversion alias) ===")
    val tsqlCols = ColInfo("id", LongType) ::
      ColInfo("rv", TimestampType, sourceType = Some("timestamp")) :: Nil
    val tt = graft.scd2.Projection.targetType(tsqlCols(1), WriteConfig(dataTypeMap = WriteConfig.tsqlTypeMap))
    val dt = graft.scd2.Projection.targetType(tsqlCols(1), WriteConfig())
    println(s"sourceType=timestamp + tsqlTypeMap → $tt (expect bigint); default map on genuine timestamp → $dt (expect timestamp)")

    spark.stop()
  }
}
