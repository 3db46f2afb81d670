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

  /** P1: per-column cast + trim + rename.
    * Strings are TRIMmed unless noTrim (reference db_to_delta.py:80-88);
    * types re-cast per dataTypeMap (reference write_init.py:29-38); column
    * aliased to the mangled target name (reference write_init.py:41-46). */
  def sourceConvert(c: ColInfo, cfg: WriteConfig): Column = {
    val mapped = cfg.dataTypeMap.get(c.typeKey)
    val base = mapped match {
      case Some(t) if t != c.dataType => col(quoted(c.name)).cast(t)
      case _ => col(quoted(c.name))
    }
    val trimmed = c.dataType match {
      case StringType if !cfg.noTrim => trim(base)
      case _ => base
    }
    trimmed.as(cfg.getTargetName(c))
  }

  /** Target-side datatype of a column after the type map. */
  def targetType(c: ColInfo, cfg: WriteConfig): DataType =
    cfg.dataTypeMap.getOrElse(c.typeKey, c.dataType)

  /** P1 over a whole relation. */
  def select(df: DataFrame, cols: Seq[ColInfo], cfg: WriteConfig): DataFrame =
    df.select(cols.map(sourceConvert(_, cfg)): _*)

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
