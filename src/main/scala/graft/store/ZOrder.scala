package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Interleaved-bit z-value construction, shared by [[VersionedTable.optimize]]
  * (graft store ZORDER clustering) and [[ForeignDeltaTable.optimize]] (liquid
  * clustering / OPTIMIZE ZORDER BY on foreign Delta tables).
  *
  * The z-value maps up to 4 numeric/date/timestamp columns onto one long
  * whose ordering interleaves the columns' bucket bits, so sorting by it
  * gives EVERY clustered column usable min/max stats locality — not just the
  * leading one, as a lexicographic sort would. Buckets are uniform between
  * the observed global min/max (one tiny agg job per call). */
private[store] object ZOrder {

  def zOrderable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         DateType | TimestampType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Fail fast with the caller's context when a requested z-order column
    * set is unusable (arity or type). */
  def requireZOrderable(schema: StructType, cols: Seq[String]): Unit = {
    require(cols.size <= 4, s"zorder supports at most 4 columns, got ${cols.size}")
    cols.foreach { c =>
      val f = schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(s"zorder column $c missing from schema"))
      require(zOrderable(f.dataType),
        s"zorder column $c has type ${f.dataType.simpleString}; use " +
          "numeric/date/timestamp columns or single-column range clustering")
    }
  }

  /** The interleaved-bit z-value over `cols` of `df`: global [min,max] per
    * column (one tiny agg job, runs HERE) → uniform bucket ids → codegen'd
    * bit interleave. Bits per column are capped so the TOP interleaved bit
    * stays below bit 63: with 4 columns a 16-bit bucket would land column
    * 3's high bit on the SIGN bit, flipping the long's order for the top
    * half of that column's range and shredding z locality. Null values
    * land in bucket 0 — deterministic, clustered at the BOTTOM. */
  def zValue(df: DataFrame, cols: Seq[String]): Column = {
    val zBits = math.min(16, 63 / cols.size)
    val maxBucket = (1L << zBits) - 1
    val boundAggs = cols.flatMap(c =>
      Seq(min(col(s"`$c`")).cast("double"), max(col(s"`$c`")).cast("double")))
    val bounds = df.agg(boundAggs.head, boundAggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      val lo = if (bounds.isNullAt(2 * i)) 0.0 else bounds.getDouble(2 * i)
      val hi = if (bounds.isNullAt(2 * i + 1)) 0.0 else bounds.getDouble(2 * i + 1)
      val span = if (hi > lo) hi - lo else 1.0
      val bucket = least(lit(maxBucket), greatest(lit(0L),
        ((col(s"`$c`").cast("double") - lit(lo)) / lit(span) * lit(maxBucket.toDouble))
          .cast("long")))
      // spread bucket bits to positions i, i+k, i+2k, … (k = #cols)
      (0 until zBits).map { b =>
        shiftleft(shiftright(bucket, b).bitwiseAND(lit(1L)), b * cols.size + i)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
  }
}
