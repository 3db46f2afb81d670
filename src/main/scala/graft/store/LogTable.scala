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
  * Two storage backends:
  *
  *  - [[LogTable.Jsonl]] (default): per-run control-flow messages (a
  *    handful per sync) are written DRIVER-SIDE as JSON-lines — one unique
  *    file per flush, zero Spark jobs on the write path (a table commit
  *    per flush would add fixed job latency to every engine run). `read()`
  *    exposes the log as a DataFrame via the JSON reader.
  *  - [[LogTable.Versioned]]: each flush commits to a [[VersionedTable]] —
  *    full parity with the reference's Delta logger (delta_logger.py:13-43):
  *    log history is versioned, time-travelable via [[readVersion]], and
  *    vacuumable, at the cost of one Spark commit per flush. Use when log
  *    auditability matters more than per-run latency.
  */
final class LogTable(
    spark: SparkSession,
    path: String,
    loggerName: String,
    flushEvery: Int = 10,
    backend: LogTable.Backend = LogTable.Jsonl) extends AutoCloseable {

  import LogTable._

  private val fsu = new Fs(spark, path)
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Rec]
  private val loggerId = UUID.randomUUID().toString

  /** The backing versioned table (Versioned backend only) — exposes
    * history/time-travel/vacuum for audit tooling. */
  val versioned: Option[VersionedTable] = backend match {
    case Versioned => Some(new VersionedTable(spark, path))
    case Jsonl => None
  }

  def info(message: String, load: String = null, sql: String = null): Unit =
    log("info", message, load, sql, null)
  def warn(message: String, load: String = null): Unit =
    log("warn", message, load, null, null)
  def error(message: String, e: Throwable): Unit =
    log("error", message, null, null,
      Option(e).map(t => t.toString + "\n" + t.getStackTrace.take(20).mkString("\n")).orNull)

  def log(level: String, message: String, load: String, sql: String, trace: String): Unit =
    synchronized {
      buf += Rec(message, level, java.time.Instant.now(), loggerId, loggerName,
        sql, load, trace)
      if (buf.size >= flushEvery) flush()
    }

  def flush(): Unit = synchronized {
    if (buf.nonEmpty) {
      backend match {
        case Jsonl =>
          val dir = new HPath(path)
          fsu.mkdirs(dir)
          fsu.writeString(
            new HPath(dir,
              s"log-${System.currentTimeMillis()}-${UUID.randomUUID().toString.take(8)}.json"),
            buf.map(_.jsonLine).mkString("", "\n", "\n"), overwrite = false)
        case Versioned =>
          val rows = buf.map(r => Row(r.message, r.level,
            Timestamp.from(r.at), r.loggerId, r.loggerName, r.sql, r.load, r.trace))
          versioned.get.append(spark.createDataFrame(
            spark.sparkContext.parallelize(rows.toSeq, 1), schema))
      }
      buf.clear()
    }
  }

  override def close(): Unit = flush()

  def read(): DataFrame = backend match {
    case Jsonl =>
      if (fsu.isDir(new HPath(path)))
        spark.read.schema(readSchema).json(path)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    case Versioned =>
      val vt = versioned.get
      if (vt.exists) vt.read()
      else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  /** Time-travel read of the log as of a past flush (Versioned backend
    * only — the reference Delta logger gets this from Delta history). */
  def readVersion(version: Long): DataFrame =
    versioned.getOrElse(throw new IllegalStateException(
      "readVersion requires the Versioned log backend")).readVersion(version)
}

object LogTable {
  sealed trait Backend
  /** Driver-side JSON-lines, zero Spark jobs per flush (default). */
  case object Jsonl extends Backend
  /** VersionedTable commits per flush: history + time travel + vacuum. */
  case object Versioned extends Backend

  /** One buffered record (reference LogMessage shape, logging.py:6-16). */
  private final case class Rec(
      message: String, level: String, at: java.time.Instant,
      loggerId: String, loggerName: String,
      sql: String, load: String, trace: String) {
    def jsonLine: String = {
      val fields = Seq(
        "message" -> message, "type" -> level, "date" -> at.toString,
        "logger_id" -> loggerId, "logger_name" -> loggerName,
        "sql" -> sql, "load" -> load, "error_trackback" -> trace)
      fields.collect { case (k, v) if v != null => s""""$k": ${jsonStr(v)}""" }
        .mkString("{", ", ", "}")
    }
  }

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
