package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graft.StreamingBridge
import org.apache.spark.sql.types.{StructField, StructType}

import graft.store.{DeltaTable, Fs}

/** Structured-Streaming SOURCE over an EXTERNAL Delta table — stream FROM
  * any `_delta_log` destination (delta-spark's own streaming source shape)
  * without a Delta jar on the classpath. Reached through the same
  * `format("graft-table")` provider, which auto-detects the table kind.
  *
  * Offsets are Delta versions. The first batch is the full snapshot at the
  * stream's start; each later batch scans exactly the files its commits'
  * dataChange adds introduced (resolved `versionAsOf` the batch end, so
  * column mapping, partition reconstruction, and deletion vectors all ride
  * the normal external-reader path). Commit classification reads the
  * per-version JSON actions driver-side:
  *  - dataChange adds only → append, streams;
  *  - dataChange=false only (OPTIMIZE / metadata) → streams nothing;
  *  - dataChange removes + adds (merge/overwrite/DV delete rewrite) →
  *    THROWS unless `ignoreChanges=true` (re-added files stream whole);
  *  - dataChange removes only → THROWS unless `ignoreDeletes=true`;
  *  - a version whose JSON was log-cleaned below the stream's position
  *    fails loudly (rows unrecoverable — same contract as the graft
  *    source's vacuum guard).
  *
  * 100 TB: getOffset is one O(log-tail) snapshot resolution (bounded by
  * checkpoints); a batch lists/scans only its own commits' files. */
final class DeltaStreamSource(
    sqlContext: SQLContext,
    path: String,
    options: Map[String, String])
  extends Source with CommitRateLimit {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private val spark = sqlContext.sparkSession
  private val fsu = new Fs(spark, path)
  private val ignoreChanges =
    options.get("ignorechanges").exists(_.equalsIgnoreCase("true"))
  private val ignoreDeletes = ignoreChanges ||
    options.get("ignoredeletes").exists(_.equalsIgnoreCase("true"))
  /** `readChangeFeed=true`: stream the foreign table's ROW-LEVEL change
    * feed — each micro-batch is [[DeltaTable.readChanges]] over its commit
    * range, so cdc-bearing commits (CDF merges/deletes from any Delta
    * writer, including [[graft.store.ForeignDeltaTable.deleteWhere]])
    * stream their exact change rows and append commits their inserts — no
    * ignoreChanges approximation. The delta-spark `readChangeFeed`
    * streaming shape, `_change_type` column and all. */
  private val cdf =
    options.get("readchangefeed").exists(_.equalsIgnoreCase("true"))
  private val startingVersion: Option[Long] =
    options.get("startingversion").map(_.toLong)

  // maxCommitsPerTrigger admission control — see [[CommitRateLimit]]
  override protected def rlOptions: Map[String, String] = options
  override protected def liveLatestVersion: Option[Long] =
    Some(DeltaTable.snapshot(spark, path).version)
  override protected def rlCdf: Boolean = cdf
  override protected def rlStartingVersion: Option[Long] = startingVersion

  override val schema: StructType = {
    val logical = DeltaTable.snapshot(spark, path).schema
    if (!cdf) logical
    else StructType(logical.fields ++ Seq(
      StructField(graft.store.VersionedTable.ChangeTypeCol,
        org.apache.spark.sql.types.StringType),
      StructField(graft.store.VersionedTable.VersionCol,
        org.apache.spark.sql.types.LongType),
      StructField(graft.store.VersionedTable.CommitTsCol,
        org.apache.spark.sql.types.TimestampType)))
  }

  override def getOffset: Option[Offset] =
    Some(LongOffset(versionOf(latestOffset(null, getDefaultReadLimit))))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = versionOf(end)
    // restart replay precedes any getOffset — sync the rate-limit base
    syncPos(endV)
    val batch =
      if (cdf) {
        val fromV = start.map(versionOf(_) + 1)
          .getOrElse(startingVersion.getOrElse(0L))
        if (fromV > endV) StreamingBridge.emptyStreaming(spark, schema)
        // readChanges guards log-cleaned commits loudly itself
        else DeltaTable.readChanges(spark, path, fromV, endV)
      } else start match {
        case None if startingVersion.isEmpty =>
          DeltaTable.read(spark, path, versionAsOf = Some(endV))
        case None => incremental(startingVersion.get, endV)
        case Some(s) => incremental(versionOf(s) + 1, endV)
      }
    StreamingBridge.asStreaming(
      batch.select(schema.fieldNames.map(n =>
        org.apache.spark.sql.functions.col(s"`$n`")).toSeq: _*))
  }

  /** The dataChange add paths of commits [fromV, endV] that may stream,
    * after the append-only classification above. */
  private def incremental(fromV: Long, endV: Long): DataFrame = {
    if (fromV > endV) return StreamingBridge.emptyStreaming(spark, schema)
    val include = scala.collection.mutable.Set[String]()
    (fromV to endV).foreach { v =>
      val p = new HPath(path, f"_delta_log/$v%020d.json")
      if (!fsu.exists(p)) throw new IllegalStateException(
        s"streaming source at $path: commit $v's JSON was log-cleaned " +
          "below the stream's position — its rows are unrecoverable")
      val nodes = fsu.readString(p).split('\n').filter(_.nonEmpty)
        .map(mapper.readTree)
      def dc(n: com.fasterxml.jackson.databind.JsonNode): Boolean =
        Option(n.get("dataChange")).forall(_.asBoolean(true))
      val adds = nodes.filter(_.has("add")).map(_.get("add")).filter(dc)
      val removes = nodes.filter(_.has("remove")).map(_.get("remove")).filter(dc)
      if (removes.nonEmpty && adds.nonEmpty && !ignoreChanges)
        throw new UnsupportedOperationException(
          s"streaming source at $path: commit $v rewrites files (not " +
            "append-only); set ignoreChanges=true to stream its re-added " +
            "files whole (updated AND carried-over rows resurface)")
      if (removes.nonEmpty && adds.isEmpty && !ignoreDeletes)
        throw new UnsupportedOperationException(
          s"streaming source at $path: commit $v deletes rows; set " +
            "ignoreDeletes=true to skip it")
      if (removes.isEmpty || ignoreChanges)
        adds.foreach(a => include += a.get("path").asText())
    }
    if (include.isEmpty) StreamingBridge.emptyStreaming(spark, schema)
    // resolve at the batch END so CM / partitions / DVs ride the normal
    // external-reader path; files re-removed later in the range were
    // already classified above
    else DeltaTable.readAddsWhere(spark, path,
      a => include.contains(a.rawPath), versionAsOf = Some(endV))
  }

  override def stop(): Unit = ()
}
