package graft.store

import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SchemaDrift

/** WRITE path for an EXTERNAL Delta table — continue a destination that
  * delta-spark / delta-rs (e.g. an existing odbc2deltalake deployment,
  * reference reader/spark_reader.py:307-324, reader/odbc_reader.py:259-322)
  * created, without a Delta jar: each append/overwrite writes its parquet
  * files under `graft_data/<uuid>/` inside the table and publishes the
  * next `_delta_log/%020d.json` commit (commitInfo + optional metaData +
  * remove/add actions WITH per-file stats), using the same put-if-absent
  * atomic-rename the graft manifest log uses — two racing writers cannot
  * both claim a version. The original Delta readers keep working on the
  * combined history; graft keeps syncing into it.
  *
  * Scope (refusals are LOUD, never silent misreads): unpartitioned tables
  * with writer protocol ≤ 4 and none of CDF / CHECK constraints /
  * generated columns / identity columns / column mapping active; protocol
  * 7 tables whose writerFeatures are all benign (appendOnly, invariants —
  * when no invariant is actually defined — vacuumProtocolCheck,
  * timestampNtz). `delta.appendOnly` tables accept appends but refuse
  * overwrite. Deletion vectors on EXISTING files are fine (append never
  * touches them; overwrite removes whole files).
  *
  * Stats: one distributed pass over the just-written files (grouped by
  * `_metadata.file_path`) computes numRecords + per-column
  * nullCount/min/max for stat-eligible top-level primitives, so Delta
  * readers (including [[DeltaTable]] itself) keep file-skipping on the
  * rows graft adds. Timestamp bounds are omitted (their stats-JSON
  * serialization is zone-ambiguous; omitting a bound is always sound).
  *
  * 100 TB: the data write is an ordinary distributed parquet write; the
  * stats pass is one narrow scan of the new files only; the commit is one
  * driver-side JSON PUT. Nothing scales with table history size except
  * the O(log) snapshot resolution [[DeltaTable]] already bounds via
  * checkpoints. */
final class ForeignDeltaTable(spark: SparkSession, val path: String)
    extends HistoryTable {
  import VersionedTable.mapper

  private val fsu = new Fs(spark, path)
  private val logDir = new HPath(path, "_delta_log")
  private def logPath(v: Long) = new HPath(logDir, f"$v%020d.json")

  def exists: Boolean = DeltaTable.isDeltaTable(spark, path)

  private def snap: DeltaTable.Snapshot = DeltaTable.snapshot(spark, path)

  def schema: StructType = snap.schema

  def read(): DataFrame = DeltaTable.read(spark, path)

  /** File pruning rides [[DeltaFileIndex]]'s stats-based skipping — the
    * pushed filter prunes add entries before any task launches. */
  def readWhere(cond: Column): DataFrame = read().filter(cond)

  def readCommit(version: Long): DataFrame = {
    val s = DeltaTable.snapshot(spark, path, versionAsOf = Some(version))
    val p = logPath(version)
    if (!fsu.exists(p)) throw new IllegalArgumentException(
      s"commit $version of $path has no JSON commit file (checkpoint-only)")
    val root = new HPath(path)
    val paths = fsu.readString(p).split('\n').filter(_.nonEmpty).toSeq
      .map(mapper.readTree)
      .filter(_.has("add"))
      .map { n =>
        val raw = n.get("add").get("path").asText()
        val u = new java.net.URI(raw)
        (if (u.isAbsolute) new HPath(u) else new HPath(root, u.getPath)).toString
      }
    if (paths.isEmpty) spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), s.schema)
    else spark.read.schema(s.schema).parquet(paths: _*)
  }

  def append(df: DataFrame, drift: SchemaDrift = SchemaDrift.NewOnly): Long =
    commitWrite(df, drift, overwrite = false)

  def overwrite(df: DataFrame, drift: SchemaDrift = SchemaDrift.Full): Long =
    commitWrite(df, drift, overwrite = true)

  // --------------------------------------------------------------- internals

  private def refuse(msg: String): Nothing =
    throw new UnsupportedOperationException(
      s"cannot write external Delta table $path: $msg")

  /** Benign writer features: capabilities whose obligations an append-only
    * plain-parquet writer already satisfies (invariants only when none is
    * defined in the schema — checked separately). */
  private val BenignWriterFeatures =
    Set("appendOnly", "invariants", "vacuumProtocolCheck", "timestampNtz")

  private def validateWritable(s: DeltaTable.Snapshot, forOverwrite: Boolean): Unit = {
    if (s.partitionColumns.nonEmpty)
      refuse(s"partitioned tables (${s.partitionColumns.mkString(",")}) are not " +
        "supported by this writer")
    val cm = s.configuration.getOrElse("delta.columnMapping.mode", "none")
    if (cm != "none") refuse(s"column mapping mode '$cm'")
    if (s.configuration.get("delta.enableChangeDataFeed").exists(_.equalsIgnoreCase("true")))
      refuse("change data feed is enabled — this writer does not emit cdc actions")
    if (s.configuration.keys.exists(_.startsWith("delta.constraints.")))
      refuse("CHECK constraints are defined — not enforced by this writer")
    if (forOverwrite && s.configuration.get("delta.appendOnly").exists(_.equalsIgnoreCase("true")))
      refuse("delta.appendOnly table — overwrite refused (append is allowed)")
    s.schema.fields.foreach { f =>
      val mj = f.metadata.json
      if (mj.contains("delta.invariants"))
        refuse(s"column ${f.name} carries an invariant — not enforced by this writer")
      if (mj.contains("delta.generationExpression"))
        refuse(s"column ${f.name} is a generated column — not computed by this writer")
      if (mj.contains("delta.identity."))
        refuse(s"column ${f.name} is an identity column — not assigned by this writer")
    }
    s.minWriterVersion match {
      case v if v <= 4 => // plain / appendOnly / invariants / constraints / CDF
        // gens — the active-feature configs above already vetoed what we
        // cannot honor
      case 5 | 6 => refuse(s"writer protocol ${s.minWriterVersion} " +
        "(column mapping / identity columns)")
      case _ =>
        val bad = s.writerFeatures.filterNot(BenignWriterFeatures)
        if (bad.nonEmpty) refuse(s"writer features ${bad.mkString(", ")}")
    }
  }

  private def align(df: DataFrame, target: StructType): DataFrame = {
    val have = df.columns.map(c => c.toLowerCase -> c).toMap
    df.select(target.fields.toSeq.map { f =>
      have.get(f.name.toLowerCase) match {
        case Some(c) if df.schema(c).dataType == f.dataType => col(c).as(f.name)
        case Some(c) => col(c).cast(f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }: _*)
  }

  private def statEligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | BooleanType | DateType => true
    case _ => false
  }

  private def commitWrite(df: DataFrame, drift: SchemaDrift, overwrite: Boolean): Long = {
    val s = snap
    validateWritable(s, overwrite)
    val merged =
      if (overwrite) SchemaEvolution.relaxNullable(df.schema)
      else SchemaEvolution.merge(s.schema,
        SchemaEvolution.relaxNullable(df.schema), drift)
    val aligned = align(df, merged)

    // data files land inside the table under a per-commit unique dir — the
    // protocol allows any relative path, and an uncommitted dir is
    // invisible to every Delta reader until the JSON commit publishes
    val dirName = s"graft_data/${UUID.randomUUID().toString.take(12)}"
    val dataDir = new HPath(path, dirName)
    aligned.write.parquet(dataDir.toString)
    val parts = fsu.fs.listStatus(dataDir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet") &&
        !st.getPath.getName.startsWith(".") && !st.getPath.getName.startsWith("_"))
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))

    // one narrow pass over the new files only: per-file numRecords +
    // nullCount/min/max of stat-eligible top-level columns
    val statCols = merged.fields.filter(f => statEligible(f.dataType)).toSeq
    val statsByFile: Map[String, String] =
      if (parts.isEmpty) Map.empty
      else {
        val aggs = count(lit(1)).as("__n") +: statCols.zipWithIndex.flatMap {
          case (f, i) => Seq(
            min(col(s"`${f.name}`")).as(s"__mn_$i"),
            max(col(s"`${f.name}`")).as(s"__mx_$i"),
            sum(when(col(s"`${f.name}`").isNull, 1L).otherwise(0L)).as(s"__nc_$i"))
        }
        spark.read.schema(merged).parquet(dataDir.toString)
          .groupBy(input_file_name().as("__f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect().map { r =>
            val fileName = new HPath(new java.net.URI(r.getString(0)).getPath).getName
            val root = mapper.createObjectNode()
            root.put("numRecords", r.getLong(1))
            val mnN = root.putObject("minValues")
            val mxN = root.putObject("maxValues")
            val ncN = root.putObject("nullCount")
            statCols.zipWithIndex.foreach { case (f, i) =>
              val (mnI, mxI, ncI) = (2 + i * 3, 3 + i * 3, 4 + i * 3)
              ncN.put(f.name, r.getLong(ncI))
              if (!r.isNullAt(mnI) && !r.isNullAt(mxI)) {
                def putVal(o: com.fasterxml.jackson.databind.node.ObjectNode, idx: Int): Unit =
                  f.dataType match {
                    case ByteType => o.put(f.name, r.getByte(idx).toLong)
                    case ShortType => o.put(f.name, r.getShort(idx).toLong)
                    case IntegerType => o.put(f.name, r.getInt(idx).toLong)
                    case LongType => o.put(f.name, r.getLong(idx))
                    case FloatType => o.put(f.name, r.getFloat(idx).toDouble)
                    case DoubleType => o.put(f.name, r.getDouble(idx))
                    case StringType => o.put(f.name, r.getString(idx))
                    case BooleanType => o.put(f.name, r.getBoolean(idx))
                    case DateType => o.put(f.name, r.getDate(idx).toLocalDate.toString)
                    case _ => ()
                  }
                val isFloatNaN = f.dataType match {
                  case FloatType => r.getFloat(mnI).isNaN || r.getFloat(mxI).isNaN
                  case DoubleType => r.getDouble(mnI).isNaN || r.getDouble(mxI).isNaN
                  case _ => false
                }
                if (!isFloatNaN) { putVal(mnN, mnI); putVal(mxN, mxI) }
              }
            }
            fileName -> mapper.writeValueAsString(root)
          }.toMap
      }

    val now = System.currentTimeMillis()
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    def obj() = mapper.createObjectNode()
    val ci = obj()
    val cin = ci.putObject("commitInfo")
    cin.put("timestamp", now)
    cin.put("operation", "WRITE")
    cin.putObject("operationParameters")
      .put("mode", if (overwrite) "Overwrite" else "Append")
    cin.put("engineInfo", "graft-foreign-delta-writer")
    lines += mapper.writeValueAsString(ci)
    if (merged.json != s.schema.json) {
      val md = obj()
      val mdn = md.putObject("metaData")
      mdn.put("id", if (s.tableId.nonEmpty) s.tableId else UUID.randomUUID().toString)
      val fmt = mdn.putObject("format")
      fmt.put("provider", "parquet")
      fmt.putObject("options")
      mdn.put("schemaString", merged.json)
      mdn.putArray("partitionColumns")
      val cfg = mdn.putObject("configuration")
      s.configuration.foreach { case (k, v) => cfg.put(k, v) }
      mdn.put("createdTime", now)
      lines += mapper.writeValueAsString(md)
    }
    if (overwrite) {
      // Add.rawPath is exactly what the foreign log recorded — emitting the
      // identical string guarantees the remove cancels its add for every
      // reader, percent-encoding included
      snapAdds(s).foreach { raw =>
        val rm = obj()
        val rmn = rm.putObject("remove")
        rmn.put("path", raw)
        rmn.put("deletionTimestamp", now)
        rmn.put("dataChange", true)
        lines += mapper.writeValueAsString(rm)
      }
    }
    parts.foreach { case (name, size, mtime) =>
      val ad = obj()
      val adn = ad.putObject("add")
      adn.put("path", s"$dirName/$name")
      adn.putObject("partitionValues")
      adn.put("size", size)
      adn.put("modificationTime", mtime)
      adn.put("dataChange", true)
      statsByFile.get(name).foreach(adn.put("stats", _))
      lines += mapper.writeValueAsString(ad)
    }

    val v = s.version + 1
    try fsu.writeStringAtomicNew(logPath(v), lines.mkString("\n"))
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException |
           _: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"version $v of Delta table $path was committed by another writer")
    }
    v
  }

  private def snapAdds(s: DeltaTable.Snapshot): Seq[String] =
    s.adds.map(_.rawPath)
}
