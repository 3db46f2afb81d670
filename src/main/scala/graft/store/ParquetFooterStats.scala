package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Per-file Delta stats JSON (numRecords / minValues / maxValues /
  * nullCount) derived from the parquet FOOTER metadata alone — the write
  * path's data-skipping stats without re-reading a single data page.
  *
  * Why: the foreign writer previously derived stats by re-scanning the
  * just-written files with a Spark aggregation — a full second pass over
  * every appended byte (2× write amplification; at 100 TB the stats pass
  * costs as much IO as the write itself). Parquet footers already carry
  * per-row-group num_rows / null_count / min / max for every column, so
  * stats are a metadata-scale read (KBs per file), the same source
  * delta-rs uses.
  *
  * Soundness rules (omission is always protocol-legal — stats fields are
  * optional per column):
  *   - a column chunk without usable statistics ⇒ that column's bounds
  *     are omitted for the file; all-null chunks contribute no bounds but
  *     keep the null count;
  *   - float/double bounds are omitted if any row group's bound is NaN
  *     (mirrors the row-scan behavior; parquet-mr itself drops stats it
  *     considers NaN-unreliable, which reads back here as "no stats");
  *   - string bounds compare in UNSIGNED UTF-8 byte order (parquet's
  *     binary column order — also Spark's UTF8String order) and are then
  *     capped Delta-style: min truncates to a 32-code-point prefix, max
  *     takes the prefix-successor ([[ForeignDeltaTable.truncateMaxBound]]);
  *     a footer value parquet already truncated is itself a valid bound,
  *     so re-capping keeps soundness;
  *   - nullCount is emitted only when every row group recorded one.
  *
  * Runs on EXECUTORS (one task per file batch): everything here is
  * static or explicitly serialized — the hadoop conf ships via
  * [[SerializableHadoopConf]]. */
private[store] object ParquetFooterStats {

  // jackson per executor (ObjectMapper is thread-safe for writes)
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  /** Stats JSON for one parquet file, over the given top-level columns
    * (name → Spark type; only stat-eligible scalar types appear here). */
  def statsJson(
      conf: Configuration, file: String,
      statCols: Seq[(String, DataType)]): String = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), conf))
    val blocks =
      try reader.getFooter.getBlocks.asScala.toSeq
      finally reader.close()
    val root = mapper.createObjectNode()
    root.put("numRecords", blocks.map(_.getRowCount).sum)
    val mnN = root.putObject("minValues")
    val mxN = root.putObject("maxValues")
    val ncN = root.putObject("nullCount")
    statCols.foreach { case (name, dt) =>
      // the per-file chunks of this top-level column, one per row group
      val chunks = blocks.flatMap(_.getColumns.asScala.find { c =>
        val p = c.getPath.toArray
        p.length == 1 && p(0) == name
      })
      if (chunks.size == blocks.size && chunks.nonEmpty) {
        val stats = chunks.map(c => Option(c.getStatistics))
        // nullCount: only when every row group recorded one
        if (stats.forall(_.exists(_.isNumNullsSet)))
          ncN.put(name, stats.map(_.get.getNumNulls).sum)
        // bounds: all-null chunks contribute nothing; any other chunk
        // without a recorded non-null bound poisons the column's bounds
        val contributing = chunks.zip(stats).flatMap { case (c, sOpt) =>
          sOpt match {
            case Some(s) if s.hasNonNullValue => Some(s)
            case Some(s) if s.isNumNullsSet && s.getNumNulls == c.getValueCount =>
              None // all-null row group: no bound needed
            case _ => Some(null) // unusable — poison
          }
        }
        if (contributing.nonEmpty && !contributing.contains(null))
          putBounds(mnN, mxN, name, dt,
            contributing.map(_.genericGetMin.asInstanceOf[AnyRef]),
            contributing.map(_.genericGetMax.asInstanceOf[AnyRef]))
      }
    }
    mapper.writeValueAsString(root)
  }

  /** Reduce per-row-group bounds to per-file bounds and render them with
    * the exact JSON shapes the row-scan pass produced. */
  private def putBounds(
      mnN: com.fasterxml.jackson.databind.node.ObjectNode,
      mxN: com.fasterxml.jackson.databind.node.ObjectNode,
      name: String, dt: DataType,
      mins: Seq[AnyRef], maxs: Seq[AnyRef]): Unit = dt match {
    case ByteType | ShortType | IntegerType =>
      mnN.put(name, mins.map(_.asInstanceOf[Number].longValue).min)
      mxN.put(name, maxs.map(_.asInstanceOf[Number].longValue).max)
    case LongType =>
      mnN.put(name, mins.map(_.asInstanceOf[Number].longValue).min)
      mxN.put(name, maxs.map(_.asInstanceOf[Number].longValue).max)
    case DateType =>
      val mn = mins.map(_.asInstanceOf[Number].longValue).min
      val mx = maxs.map(_.asInstanceOf[Number].longValue).max
      mnN.put(name, java.time.LocalDate.ofEpochDay(mn).toString)
      mxN.put(name, java.time.LocalDate.ofEpochDay(mx).toString)
    case FloatType =>
      val mnV = mins.map(_.asInstanceOf[java.lang.Float].floatValue)
      val mxV = maxs.map(_.asInstanceOf[java.lang.Float].floatValue)
      if (!mnV.exists(_.isNaN) && !mxV.exists(_.isNaN)) {
        mnN.put(name, mnV.min.toDouble)
        mxN.put(name, mxV.max.toDouble)
      }
    case DoubleType =>
      val mnV = mins.map(_.asInstanceOf[java.lang.Double].doubleValue)
      val mxV = maxs.map(_.asInstanceOf[java.lang.Double].doubleValue)
      if (!mnV.exists(_.isNaN) && !mxV.exists(_.isNaN)) {
        mnN.put(name, mnV.min)
        mxN.put(name, mxV.max)
      }
    case BooleanType =>
      mnN.put(name, mins.map(_.asInstanceOf[java.lang.Boolean].booleanValue)
        .reduce(_ && _))
      mxN.put(name, maxs.map(_.asInstanceOf[java.lang.Boolean].booleanValue)
        .reduce(_ || _))
    case StringType =>
      // unsigned UTF-8 byte order — parquet's BINARY(UTF8) column order
      // and Spark's UTF8String order; java String.compareTo (UTF-16 code
      // units) disagrees for supplementary characters, so compare bytes
      val minBy = mins.map(_.asInstanceOf[org.apache.parquet.io.api.Binary]
        .getBytes).reduce((a, b) =>
          if (java.util.Arrays.compareUnsigned(a, b) <= 0) a else b)
      val maxBy = maxs.map(_.asInstanceOf[org.apache.parquet.io.api.Binary]
        .getBytes).reduce((a, b) =>
          if (java.util.Arrays.compareUnsigned(a, b) >= 0) a else b)
      val mn = ForeignDeltaTable.truncateMin(
        new String(minBy, java.nio.charset.StandardCharsets.UTF_8))
      ForeignDeltaTable.truncateMaxBound(
          new String(maxBy, java.nio.charset.StandardCharsets.UTF_8)) match {
        case Some(mx) => mnN.put(name, mn); mxN.put(name, mx): Unit
        case None => ()
      }
    case _ => ()
  }
}

/** Java-serializable Hadoop Configuration carrier (the standard pattern;
  * Spark's own SerializableConfiguration is private[spark]). */
private[store] class SerializableHadoopConf(
    @transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
