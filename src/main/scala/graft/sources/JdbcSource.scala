package graft.sources

import org.apache.spark.sql.{Column, DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ColInfo

/** Live-RDBMS source over Spark's JDBC DSv2 reader — the Spark-native form
  * of the reference's SparkReader (reference reader/spark_reader.py:89-350),
  * with two deliberate improvements:
  *
  *  1. **Partitioned reads.** The reference always reads through ONE JDBC
  *     partition (spark_reader.py:238-282 sets no partitionColumn — its
  *     known scale gap, BASELINE.md). Here, when `partitionColumn` is set
  *     (or a single numeric pk is declared), the scan probes min/max once
  *     and fans out `numPartitions` range predicates — the difference
  *     between 1 connection and N executors' worth of parallel ingest on a
  *     100 TB source.
  *  2. **Catalog-typed columns.** Column metadata carries the source's SQL
  *     type name (`ColInfo.sourceType`), so WriteConfig.dataTypeMap applies
  *     to what the DBMS declared (rowversion/tinyint/…), not to Spark's
  *     inferred type (see model.scala — the round-1 timestamp-cast bug).
  *
  * Predicates and prunes compose through the `query` option: Catalyst
  * pushes filters/column pruning into the generated remote SQL, so the
  * delta criterion (`delta_col > watermark`) executes ON the source DB just
  * like the reference's generated WHERE clause (SURVEY.md §4.1).
  */
final class JdbcSource(
    url: String,
    tableOrQuery: Either[String, String], // Left(table) | Right(query SQL)
    props: Map[String, String] = Map.empty,
    pks: Seq[String] = Nil,
    partitionColumn: Option[String] = None,
    numPartitions: Int = 8,
    sourceTypes: Map[String, String] = Map.empty,
    val transformationHook: DataFrame => DataFrame = identity) extends Source {

  private def base(spark: SparkSession): DataFrameReader = {
    val r = spark.read.format("jdbc").option("url", url)
    val withTarget = tableOrQuery match {
      case Left(table) => r.option("dbtable", table)
      case Right(query) => r.option("query", query)
    }
    props.foldLeft(withTarget) { case (acc, (k, v)) => acc.option(k, v) }
  }

  /** Reader in `dbtable` form — Spark rejects `query` + `partitionColumn`
    * together, so a query source is wrapped as a derived table (the
    * documented Spark workaround; every dialect the reference targets
    * accepts `(q) alias` in FROM). */
  private def partitionedBase(spark: SparkSession): DataFrameReader = {
    val dbtable = tableOrQuery match {
      case Left(table) => table
      case Right(query) => s"($query) graft_subq"
    }
    val r = spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
    props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }
  }

  /** Spark's JDBC partitioner accepts numeric, date, timestamp columns. */
  private def numeric(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | _: DecimalType => true
    case _ => false
  }
  private def partitionable(dt: DataType): Boolean = dt match {
    case DateType | TimestampType => true
    case other => numeric(other)
  }

  /** The partitioning column: explicit (rejected loudly if its type can't
    * partition — silently falling back to one connection would hide a
    * 100 TB regression), else a single numeric pk. */
  private def effectivePartitionCol(spark: SparkSession): Option[String] = {
    lazy val byName = columns(spark).map(c => c.name.toLowerCase -> c).toMap
    partitionColumn.map { pc =>
      byName.get(pc.toLowerCase) match {
        case Some(c) if partitionable(c.dataType) => c.name
        case Some(c) => throw new IllegalArgumentException(
          s"partitionColumn $pc has type ${c.dataType.simpleString}; " +
            "Spark JDBC partitioning needs a numeric/date/timestamp column")
        case None => throw new IllegalArgumentException(
          s"partitionColumn $pc not found in source schema")
      }
    }.orElse {
      if (pks.size != 1) None
      else byName.get(pks.head.toLowerCase)
        .filter(c => numeric(c.dataType))
        .map(_.name)
    }
  }

  /** Bound value → the string Spark's JDBC partitioner parses: integral
    * whole-number strings for numeric columns (fractional numerics
    * truncate toward the min / widen at the max so the stride covers the
    * true range), Date/Timestamp toString otherwise. */
  private def boundStr(v: Any, floor: Boolean): String = v match {
    case d: java.math.BigDecimal =>
      d.setScale(0, if (floor) java.math.RoundingMode.FLOOR
        else java.math.RoundingMode.CEILING).toBigInteger.toString
    case d: Double => (if (floor) math.floor(d) else math.ceil(d)).toLong.toString
    case f: Float => boundStr(f.toDouble, floor)
    case other => other.toString
  }

  def read(spark: SparkSession): DataFrame = {
    val df = effectivePartitionCol(spark) match {
      case Some(pc) =>
        // one cheap bounds probe (pushed down as MIN/MAX), then a ranged
        // parallel scan — the reference's missing partitionColumn support.
        // Bounds only set the stride (rows outside are still read by the
        // unbounded first/last partitions), so min/max verbatim is correct.
        val bounds = base(spark).load().agg(min(col(pc)), max(col(pc))).head()
        if (bounds.isNullAt(0) || bounds.get(0) == bounds.get(1)) base(spark).load()
        else partitionedBase(spark)
          .option("partitionColumn", pc)
          .option("lowerBound", boundStr(bounds.get(0), floor = true))
          .option("upperBound", boundStr(bounds.get(1), floor = false))
          .option("numPartitions", numPartitions.toString)
          .load()
      case None => base(spark).load()
    }
    transformationHook(df)
  }

  /** Schema via the LIMIT-0 probe the JDBC source does lazily (reference
    * metadata.py:186-190 / S9); source type names attached when declared. */
  def columns(spark: SparkSession): Seq[ColInfo] =
    base(spark).load().schema.fields.toSeq.map { f =>
      ColInfo(f.name, f.dataType, f.nullable,
        sourceType = sourceTypes.get(f.name.toLowerCase))
    }

  def primaryKeys(spark: SparkSession): Seq[String] = pks
}

object JdbcSource {
  /** Linked-server proxy decorator (reference spark_reader.py:187-196 / S4):
    * wrap remote SQL in OPENQUERY so an MS-SQL gateway executes it. */
  def openQuery(linkedServer: String, sql: String): String =
    s"select * from openquery([$linkedServer], '${sql.replace("'", "''")}')"
}
