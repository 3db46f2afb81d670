package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The catalog lives in [[graft.queries.Catalog]]; every entry is an
  * operator from SURVEY.md §2 or a training-data-pipeline operator, each
  * with a DuckDB oracle where the result is SQL-expressible. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full SCD2 engine end-to-end (full load + CDC delta load). */
  def entry(spark: SparkSession): DataFrame =
    queries("scd2_history")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Catalog.oracleSql
}
