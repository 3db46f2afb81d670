package graft.store

import java.sql.Timestamp
import java.util.UUID

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Structured run log — the engine's equivalent of the reference's
  * Delta-backed logger (reference logging.py:6-16, delta_logger.py:13-43):
  * LogMessage records buffered and flushed in batches of `flushEvery`
  * (reference flushes every 10).
  *
  * Log records are per-run control-flow messages (a handful per sync), so
  * they are written DRIVER-SIDE as JSON-lines — one unique file per flush,
  * zero Spark jobs on the write path (a Spark parquet commit per flush
  * would add fixed job latency to every engine run). `read()` exposes the
  * log as a DataFrame via the JSON reader with an explicit schema. */
final class LogTable(
    spark: SparkSession,
    path: String,
    loggerName: String,
    flushEvery: Int = 10) extends AutoCloseable {

  import LogTable._

  private val fsu = new Fs(spark, path)
  private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
  private val loggerId = UUID.randomUUID().toString

  def info(message: String, load: String = null, sql: String = null): Unit =
    log("info", message, load, sql, null)
  def warn(message: String, load: String = null): Unit =
    log("warn", message, load, null, null)
  def error(message: String, e: Throwable): Unit =
    log("error", message, null, null,
      Option(e).map(t => t.toString + "\n" + t.getStackTrace.take(20).mkString("\n")).orNull)

  def log(level: String, message: String, load: String, sql: String, trace: String): Unit =
    synchronized {
      val fields = Seq(
        "message" -> message, "type" -> level,
        "date" -> java.time.Instant.now().toString,
        "logger_id" -> loggerId, "logger_name" -> loggerName,
        "sql" -> sql, "load" -> load, "error_trackback" -> trace)
      buf += fields.collect { case (k, v) if v != null => s""""$k": ${jsonStr(v)}""" }
        .mkString("{", ", ", "}")
      if (buf.size >= flushEvery) flush()
    }

  def flush(): Unit = synchronized {
    if (buf.nonEmpty) {
      val dir = new HPath(path)
      fsu.mkdirs(dir)
      fsu.writeString(
        new HPath(dir,
          s"log-${System.currentTimeMillis()}-${UUID.randomUUID().toString.take(8)}.json"),
        buf.mkString("", "\n", "\n"), overwrite = false)
      buf.clear()
    }
  }

  override def close(): Unit = flush()

  def read(): DataFrame =
    if (fsu.isDir(new HPath(path)))
      spark.read.schema(readSchema).json(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
}

object LogTable {
  /** Reference LogMessage shape (logging.py:6-16). */
  val schema: StructType = StructType(Seq(
    StructField("message", StringType),
    StructField("type", StringType),
    StructField("date", TimestampType),
    StructField("logger_id", StringType),
    StructField("logger_name", StringType),
    StructField("sql", StringType),
    StructField("load", StringType),
    StructField("error_trackback", StringType)))

  /** JSON reader schema: `date` arrives as an ISO-8601 string. */
  private[store] val readSchema: StructType = schema

  private[store] def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
