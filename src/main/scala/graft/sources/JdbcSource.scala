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

  /** The partitioning column: explicit, else a single numeric pk. */
  private def effectivePartitionCol(spark: SparkSession): Option[String] =
    partitionColumn.orElse {
      if (pks.size != 1) None
      else columns(spark).find(_.name.equalsIgnoreCase(pks.head))
        .filter(c => c.dataType.isInstanceOf[NumericType])
        .map(_.name)
    }

  def read(spark: SparkSession): DataFrame = {
    val df = effectivePartitionCol(spark) match {
      case Some(pc) =>
        // one cheap bounds probe (pushed down as MIN/MAX), then a ranged
        // parallel scan — the reference's missing partitionColumn support
        val bounds = base(spark).load()
          .agg(min(col(pc)).cast("double"), max(col(pc)).cast("double")).head()
        if (bounds.isNullAt(0)) base(spark).load()
        else base(spark)
          .option("partitionColumn", pc)
          .option("lowerBound", bounds.getDouble(0).toLong.toString)
          .option("upperBound", (bounds.getDouble(1).toLong + 1).toString)
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
