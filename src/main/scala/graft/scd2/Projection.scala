package graft.scd2

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{ColInfo, SystemCols, WriteConfig}

/** The projection builders P1/P2/P6 (SURVEY.md §2.2) — pure Column
  * constructors, the Spark-native replacement for the reference's generated
  * SELECT lists (reference db_to_delta.py:54-164 `_source_convert` /
  * `_get_cols_select`). */
object Projection {

  /** Source types whose values must NOT be trimmed even when they surface
    * as strings — fixed-form identifiers (reference db_to_delta.py:80-88),
    * plus xml: the reference's trim rule keys on the SOURCE type being a
    * string type, which xml is not (an XML document's leading/trailing
    * whitespace is part of the value), even though it lands as a string
    * column here. */
  private val trimExempt =
    Set("uuid", "uniqueidentifier", "guid", "oid", "xid", "xml")

  private[graft] def isXid(c: ColInfo, cfg: WriteConfig): Boolean =
    !cfg.dataTypeMap.contains(c.typeKey) && c.sourceType.map(_.toLowerCase).contains("xid")

  /** Whether P1 trims this column (string target, not opted out, source
    * type not a fixed-form identifier) — shared with the source-side SQL
    * generator so both renderings agree. */
  private[graft] def needsTrim(c: ColInfo, cfg: WriteConfig): Boolean =
    targetType(c, cfg) == StringType && !cfg.noTrim &&
      !c.sourceType.map(_.toLowerCase).exists(trimExempt)

  /** P1: per-column cast + trim + rename + cap.
    * Strings are TRIMmed unless noTrim or the SOURCE type is a fixed-form
    * identifier (reference db_to_delta.py:80-88); Postgres `xid` (xmin)
    * double-casts text→bigint when unmapped (db_to_delta.py:73-77); types
    * re-cast per dataTypeMap (reference write_init.py:29-38); string/binary
    * values capped at maxTextSize/maxBinarySize (odbc_reader.py:235,273-275);
    * column aliased to the mangled target name (write_init.py:41-46). */
  def sourceConvert(c: ColInfo, cfg: WriteConfig): Column = {
    val raw = col(quoted(c.name))
    val target = targetType(c, cfg)
    val base =
      if (isXid(c, cfg)) raw.cast(StringType).cast(LongType)
      else if (target != c.dataType) raw.cast(target)
      else raw
    val trimmed = if (needsTrim(c, cfg)) trim(base) else base
    val capped = (target, cfg.maxTextSize, cfg.maxBinarySize) match {
      case (StringType, Some(n), _) => substring(trimmed, 1, n)
      case (BinaryType, _, Some(n)) => substring(trimmed, 1, n)
      case _ => trimmed
    }
    capped.as(cfg.getTargetName(c))
  }

  /** Target-side datatype of a column after the type map / xid double-cast. */
  def targetType(c: ColInfo, cfg: WriteConfig): DataType =
    if (isXid(c, cfg)) LongType
    else cfg.dataTypeMap.getOrElse(c.typeKey, c.dataType)

  /** P1 over a whole relation. Columns in `alreadyConverted` (EXACT names,
    * so case-only-different columns never collide) had their FULL
    * conversion chain run source-side (pushdown) — they are renamed and
    * RE-CAST to the target type here, nothing more: the cast is idempotent
    * and repairs lossy JDBC type round-trips (a remote SMALLINT reads back
    * as IntegerType), while re-applying trim/cap is NOT idempotent when
    * the cap lands on whitespace. */
  def select(df: DataFrame, cols: Seq[ColInfo], cfg: WriteConfig,
      alreadyConverted: Set[String] = Set.empty): DataFrame =
    df.select(cols.map { c =>
      if (alreadyConverted(c.name)) aliasConverted(c, cfg)
      else sourceConvert(c, cfg)
    }: _*)

  /** The pushed-column projection: target-type cast (idempotent; Catalyst
    * elides same-type casts) + rename. */
  private[graft] def aliasConverted(c: ColInfo, cfg: WriteConfig): Column =
    col(quoted(c.name)).cast(targetType(c, cfg)).as(cfg.getTargetName(c))

  /** P2: the three system columns. `ts` defaults to the engine clock in UTC
    * (session TZ is pinned UTC; reference db_to_delta.py:91-101). */
  def withSystemCols(
      df: DataFrame,
      isDeleted: Boolean,
      isFullLoad: Boolean,
      ts: Column = current_timestamp()): DataFrame =
    df.withColumn(SystemCols.timestamp, ts)
      .withColumn(SystemCols.isDeleted, lit(isDeleted))
      .withColumn(SystemCols.isFullLoad, lit(isFullLoad))

  /** P6: delete-tombstone projection — pk values kept, every non-pk payload
    * column NULL of the right type, system cols marking a delete
    * (reference db_to_delta.py:794-846). `pkDf` carries target-named pks. */
  def tombstones(pkDf: DataFrame, target: StructType, ts: Column = current_timestamp()): DataFrame = {
    val pkCols = pkDf.columns.map(_.toLowerCase).toSet
    val payload = target.fields.toSeq
      .filterNot(f => SystemCols.all.contains(f.name))
      .map { f =>
        if (pkCols(f.name.toLowerCase)) col(quoted(f.name))
        else lit(null).cast(f.dataType).as(f.name)
      }
    pkDf.select(payload: _*)
      .withColumn(SystemCols.timestamp, ts)
      .withColumn(SystemCols.isDeleted, lit(true))
      .withColumn(SystemCols.isFullLoad, lit(false))
  }

  private def quoted(name: String): String = s"`$name`"
}
