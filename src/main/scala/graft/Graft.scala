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
}
