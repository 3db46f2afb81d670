package graft

import org.apache.spark.sql.SparkSession

import graft.scd2.Synchronizer
import graft.sources.Source

/** The one-call public API, mirroring the reference's surface
  * (reference __init__.py:14-25):
  *
  * {{{
  * // reference: write_db_to_delta(reader, ("dbo","user"), dest, cfg)
  * Graft.sync(spark, source, "/data/dest/user", WriteConfig(...))
  *
  * // reference: make_writer(...) → inspect → .execute()
  * val w = Graft.writer(spark, source, dest, cfg)
  * w.cols; w.targetPks; w.targetDelta   // resolved plan ("analysis phase")
  * w.execute()                          // one sync run
  * w.checkConsistency(autoFix = true)   // check_delta_consistency
  * w.currentState()                     // current-state view helper
  * }}}
  */
object Graft {
  /** One sync run: discover/resolve, load (full or delta per state), and
    * return the load result — `write_db_to_delta(...).execute()`. */
  def sync(
      spark: SparkSession,
      source: Source,
      destRoot: String,
      cfg: WriteConfig = WriteConfig()): LoadResult =
    writer(spark, source, destRoot, cfg).execute()

  /** The resolved writer (reference make_writer / WriteConfigAndInfos):
    * exposes the analysis-phase results and the run/maintenance methods. */
  def writer(
      spark: SparkSession,
      source: Source,
      destRoot: String,
      cfg: WriteConfig = WriteConfig()): Synchronizer =
    new Synchronizer(spark, source, destRoot, cfg)

  /** One table of a multi-table sync. */
  final case class TableSync(
      source: Source, destRoot: String, cfg: WriteConfig = WriteConfig())

  /** Sync a whole set of tables concurrently — the "mirror the database"
    * loop every reference deployment writes around `write_db_to_delta`,
    * made a first-class call. Each table runs its own `Synchronizer` on a
    * worker thread under the FAIR scheduler (each sync is mostly small
    * sequential jobs with driver gaps, so on a big cluster N tables
    * interleave their jobs and fill the executors instead of running the
    * gaps serially). Per-table isolation is the engine's own lock +
    * dual-snapshot rollback; one table's failure never aborts the others —
    * results come back per table as Either[error, result], in input order.
    *
    * `parallelism` bounds concurrent syncs (driver memory and source-DB
    * connection pressure scale with it, not cluster size). */
  def syncAll(
      spark: SparkSession,
      tables: Seq[TableSync],
      parallelism: Int = 4): Seq[Either[Throwable, LoadResult]] = {
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, math.max(tables.size, 1)),
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger()
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-syncall-${n.getAndIncrement()}")
          t.setDaemon(true); t
        }
      })
    try {
      val futures = tables.map { tb =>
        pool.submit(new java.util.concurrent.Callable[Either[Throwable, LoadResult]] {
          def call(): Either[Throwable, LoadResult] = {
            // FAIR pool per orchestration so no single table's stage backlog
            // starves the rest; cleared afterwards (thread is reused)
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", "graft-sync")
            try Right(sync(spark, tb.source, tb.destRoot, tb.cfg))
            catch { case scala.util.control.NonFatal(e) => Left(e) }
            finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
          }
        })
      }
      futures.map(_.get())
    } finally pool.shutdown()
  }
}
