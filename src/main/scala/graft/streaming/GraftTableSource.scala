package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graft.StreamingBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.store.VersionedTable

/** Structured-Streaming SOURCE over a graft [[VersionedTable]] — the
  * delta-spark streaming-source analogue (reference deployments stream
  * FROM their delta destinations downstream; graft tables are now
  * first-class stream inputs the same way):
  *
  * {{{
  *   spark.readStream.format("graft-table").option("path", dest).load()
  * }}}
  *
  * Offsets are commit versions (one manifest = one offset unit), so a
  * micro-batch is "the rows ADDED by commits (start, end]" — resolved
  * driver-side from the manifests, scanned as ONE job via the
  * manifest-backed file index. The FIRST batch is the full snapshot at the
  * stream's start (Delta's initial-snapshot semantics), then incremental.
  *
  * Commit classification (Delta's append-only streaming contract):
  *  - append commits stream their added rows;
  *  - optimize / setProperties stream NOTHING (dataChange=false rewrites —
  *    surfacing an optimize's dirs would duplicate every compacted row);
  *  - merge / overwrite / restore THROW unless `.option("ignoreChanges",
  *    "true")` — with it, a merge's rewritten dir streams whole (updated
  *    AND carried-over rows resurface: exactly delta-spark's documented
  *    ignoreChanges caveat);
  *  - delete (deletion vectors; no added rows) THROWS unless
  *    `.option("ignoreDeletes", "true")` or ignoreChanges — deletes never
  *    stream rows either way;
  *  - a vacuumed manifest inside the range fails loudly (rows are gone;
  *    silently skipping would lose data).
  *
  * 100 TB: getOffset is one manifest-dir listing; a batch reads only the
  * dirs its commits added (file pruning and pushdown intact — the batch
  * plan is the same GraftFileIndex scan every table read uses). */
final class GraftTableSource(
    sqlContext: SQLContext,
    path: String,
    options: Map[String, String])
  extends Source with CommitRateLimit {

  private val spark = sqlContext.sparkSession
  private val table = new VersionedTable(spark, path)
  private val ignoreChanges =
    options.get("ignorechanges").exists(_.equalsIgnoreCase("true"))
  private val ignoreDeletes = ignoreChanges ||
    options.get("ignoredeletes").exists(_.equalsIgnoreCase("true"))
  /** `readChangeFeed=true`: stream the ROW-LEVEL change feed instead of the
    * snapshot+appends — each micro-batch is `readChangeFeed(from, to]`, so
    * CDF-materializing merges stream their exact pre/post pairs and CDF
    * deletes their delete rows (no ignoreChanges approximation needed);
    * appends stream as inserts, optimize/setProperties as nothing. The
    * Delta `readChangeFeed` streaming shape, `_change_type` column and all. */
  private val cdf =
    options.get("readchangefeed").exists(_.equalsIgnoreCase("true"))
  /** First version to stream (CDF mode: changes from here; plain mode:
    * SKIP the initial snapshot and stream commits from here on). Default:
    * plain mode takes the full snapshot, CDF mode starts at version 0. */
  private val startingVersion: Option[Long] =
    options.get("startingversion").map(_.toLong)
  // maxCommitsPerTrigger admission control — see [[CommitRateLimit]]
  override protected def rlOptions: Map[String, String] = options
  override protected def liveLatestVersion: Option[Long] = table.latestVersion
  override protected def rlCdf: Boolean = cdf
  override protected def rlStartingVersion: Option[Long] = startingVersion

  override val schema: StructType =
    if (!cdf) table.schema
    else org.apache.spark.sql.types.StructType(table.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField(
        VersionedTable.ChangeTypeCol, org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(
        VersionedTable.VersionCol, org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(
        VersionedTable.CommitTsCol, org.apache.spark.sql.types.TimestampType)))

  override def getOffset: Option[Offset] =
    Option(latestOffset(null, getDefaultReadLimit))
      .map(o => LongOffset(versionOf(o)))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = versionOf(end)
    // restart replay hands us the checkpointed range before any getOffset —
    // sync the rate-limit base so the recovered stream caps from there
    syncPos(endV)
    val batch =
      if (cdf) {
        val fromV = start.map(versionOf(_) + 1)
          .getOrElse(startingVersion.getOrElse(0L))
        if (fromV > endV) return StreamingBridge.emptyStreaming(spark, schema)
        guardVacuumed(fromV, endV)
        table.readChangeFeed(fromV, endV)
      } else start match {
        case None if startingVersion.isEmpty =>
          // initial snapshot: the full table as of the stream's start
          table.readVersion(endV)
        case None => incremental(startingVersion.get, endV)
        case Some(s) => incremental(versionOf(s) + 1, endV)
      }
    StreamingBridge.asStreaming(
      batch.select(schema.fieldNames.map(n =>
        org.apache.spark.sql.functions.col(s"`$n`")).toSeq: _*))
  }

  private def guardVacuumed(fromV: Long, endV: Long): Unit =
    table.commitOps(fromV, endV).collectFirst { case (v, "(vacuumed)") => v }
      .foreach(v => throw new IllegalStateException(
        s"streaming source at $path: commit $v was vacuumed below the " +
          "stream's position — its rows are unrecoverable"))

  private def incremental(fromV: Long, endV: Long): DataFrame = {
    if (fromV > endV) return StreamingBridge.emptyStreaming(spark, schema)
    val include = table.commitOps(fromV, endV).flatMap { case (v, op) =>
      op match {
        case "append" | "" => Some(v)
        case "optimize" | "setProperties" => None // dataChange=false
        case "delete" =>
          if (!ignoreDeletes) throw new UnsupportedOperationException(
            s"streaming source at $path: commit $v is a DELETE — " +
              "deleted rows cannot stream; set ignoreDeletes=true to skip " +
              "(or readChangeFeed=true to stream delete rows)")
          None
        case "merge" | "overwrite" | "restore" =>
          if (!ignoreChanges) throw new UnsupportedOperationException(
            s"streaming source at $path: commit $v is a $op (not " +
              "append-only); set ignoreChanges=true to stream its " +
              "rewritten dirs (updated AND carried-over rows resurface), " +
              "or readChangeFeed=true for exact row-level changes")
          Some(v)
        case "(vacuumed)" => throw new IllegalStateException(
          s"streaming source at $path: commit $v was vacuumed below " +
            "the stream's position — its rows are unrecoverable")
        case other => throw new UnsupportedOperationException(
          s"streaming source at $path: unknown commit op '$other' at $v")
      }
    }
    if (include.isEmpty) StreamingBridge.emptyStreaming(spark, schema)
    else table.readCommits(include)
  }

  override def stop(): Unit = ()
}

/** `format("graft-table")` registration (META-INF/services). Auto-detects
  * the table kind: a `_graft_log/` destination streams through
  * [[GraftTableSource]] (manifest offsets, CDF mode available); a bare
  * `_delta_log/` destination — a FOREIGN Delta table — streams through
  * [[DeltaStreamSource]] (Delta-version offsets, external-reader scan). */
final class GraftTableSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.map { case (k, v) => k.toLowerCase -> v }.getOrElse("path",
      throw new IllegalArgumentException("graft-table source requires .option(\"path\", ...)"))

  private def build(sqlContext: SQLContext, parameters: Map[String, String]): Source = {
    val lower = parameters.map { case (k, v) => k.toLowerCase -> v }
    val p = pathOf(parameters)
    val fsu = new graft.store.Fs(sqlContext.sparkSession, p)
    if (fsu.isDir(new org.apache.hadoop.fs.Path(p, "_graft_log")))
      new GraftTableSource(sqlContext, p, lower)
    else if (graft.store.DeltaTable.isDeltaTable(sqlContext.sparkSession, p))
      new DeltaStreamSource(sqlContext, p, lower)
    else throw new IllegalArgumentException(
      s"$p holds neither a graft manifest log nor a Delta transaction log")
  }

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    // delegate so mode-dependent columns (readChangeFeed adds
    // _change_type/__commit_version/_commit_timestamp) stay in ONE place
    (shortName(), schema.getOrElse(build(sqlContext, parameters).schema))

  override def createSource(
      sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    build(sqlContext, parameters)
}
