package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
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
    options: Map[String, String]) extends Source {

  private val spark = sqlContext.sparkSession
  private val table = new VersionedTable(spark, path)
  private val ignoreChanges =
    options.get("ignorechanges").exists(_.equalsIgnoreCase("true"))
  private val ignoreDeletes = ignoreChanges ||
    options.get("ignoredeletes").exists(_.equalsIgnoreCase("true"))

  override val schema: StructType = table.schema

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => throw new IllegalStateException(s"unexpected offset $other")
  }

  override def getOffset: Option[Offset] = table.latestVersion.map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = versionOf(end)
    val batch = start match {
      case None =>
        // initial snapshot: the full table as of the stream's start
        table.readVersion(endV)
      case Some(s) =>
        val fromV = versionOf(s) + 1
        if (fromV > endV) return StreamingBridge.emptyStreaming(spark, schema)
        val ops = table.commitOps(fromV, endV)
        val include = ops.flatMap { case (v, op) =>
          op match {
            case "append" | "" => Some(v)
            case "optimize" | "setProperties" => None // dataChange=false
            case "delete" =>
              if (!ignoreDeletes) throw new UnsupportedOperationException(
                s"streaming source at $path: commit $v is a DELETE — " +
                  "deleted rows cannot stream; set ignoreDeletes=true to skip")
              None
            case "merge" | "overwrite" | "restore" =>
              if (!ignoreChanges) throw new UnsupportedOperationException(
                s"streaming source at $path: commit $v is a $op (not " +
                  "append-only); set ignoreChanges=true to stream its " +
                  "rewritten dirs (updated AND carried-over rows resurface)")
              Some(v)
            case "(vacuumed)" => throw new IllegalStateException(
              s"streaming source at $path: commit $v was vacuumed below " +
                "the stream's position — its rows are unrecoverable")
            case other => throw new UnsupportedOperationException(
              s"streaming source at $path: unknown commit op '$other' at $v")
          }
        }
        if (include.isEmpty) return StreamingBridge.emptyStreaming(spark, schema)
        table.readCommits(include)
    }
    StreamingBridge.asStreaming(
      batch.select(schema.fieldNames.map(n =>
        org.apache.spark.sql.functions.col(s"`$n`")).toSeq: _*))
  }

  override def stop(): Unit = ()
}

/** `format("graft-table")` registration (META-INF/services). */
final class GraftTableSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.map { case (k, v) => k.toLowerCase -> v }.getOrElse("path",
      throw new IllegalArgumentException("graft-table source requires .option(\"path\", ...)"))

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val p = pathOf(parameters)
    (shortName(), schema.getOrElse(new VersionedTable(sqlContext.sparkSession, p).schema))
  }

  override def createSource(
      sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val lower = parameters.map { case (k, v) => k.toLowerCase -> v }
    new GraftTableSource(sqlContext, pathOf(parameters), lower)
  }
}
