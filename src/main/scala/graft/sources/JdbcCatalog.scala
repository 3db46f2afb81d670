package graft.sources

import java.sql.{Connection, DriverManager, Types}

import org.apache.spark.sql.types._

import graft.ColInfo

/** Source-catalog discovery over a plain JDBC connection — the Spark-native
  * S7 (reference metadata.py:16-45,74-152: INFORMATION_SCHEMA columns + pk
  * constraint queries, with identity/row-start flags from sys.columns).
  *
  * `java.sql.DatabaseMetaData` is the portable form of those queries: it
  * returns the DBMS's own type names (`TYPE_NAME` — "rowversion",
  * "tinyint", "timestamp"…), which land on [[ColInfo.sourceType]] so
  * `WriteConfig.dataTypeMap` applies to what the catalog declared, and the
  * pk columns in key order. Identity detection uses the IS_AUTOINCREMENT
  * column; MS-SQL temporal ROW START columns surface via their
  * "datetime2"-typed GENERATED flag when the driver exposes it (else
  * declare the delta column explicitly in WriteConfig).
  *
  * Not exercised by the harness (no live DB in this environment) — kept
  * driver-free: callers pass url/props, the JDBC driver resolves from the
  * classpath like Spark's own JDBC source. */
object JdbcCatalog {

  final case class TableMeta(columns: Seq[ColInfo], primaryKeys: Seq[String])

  def discover(url: String, props: java.util.Properties,
      catalog: String, schema: String, table: String): TableMeta = {
    val conn = DriverManager.getConnection(url, props)
    try discover(conn, catalog, schema, table) finally conn.close()
  }

  def discover(conn: Connection, catalog: String, schema: String, table: String): TableMeta = {
    val md = conn.getMetaData
    val cols = scala.collection.mutable.ArrayBuffer.empty[ColInfo]
    val rs = md.getColumns(catalog, schema, table, null)
    try {
      while (rs.next()) {
        val typeName = rs.getString("TYPE_NAME")
        val isIdentity = "YES".equalsIgnoreCase(rs.getString("IS_AUTOINCREMENT"))
        cols += ColInfo(
          name = rs.getString("COLUMN_NAME"),
          dataType = sparkType(
            rs.getInt("DATA_TYPE"), rs.getInt("COLUMN_SIZE"), rs.getInt("DECIMAL_DIGITS")),
          nullable = rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls,
          isIdentity = isIdentity,
          sourceType = Option(typeName).map(_.toLowerCase))
      }
    } finally rs.close()
    val pks = scala.collection.mutable.ArrayBuffer.empty[(Short, String)]
    val prs = md.getPrimaryKeys(catalog, schema, table)
    try {
      while (prs.next()) pks += prs.getShort("KEY_SEQ") -> prs.getString("COLUMN_NAME")
    } finally prs.close()
    TableMeta(cols.toSeq, pks.sortBy(_._1).map(_._2).toSeq)
  }

  /** java.sql.Types → Spark type (the Arrow-probe table of the reference,
    * read_utils/delta_rs.py:22-57, re-based on JDBC type codes). */
  def sparkType(jdbcType: Int, precision: Int, scale: Int): DataType = jdbcType match {
    case Types.BIT | Types.BOOLEAN => BooleanType
    case Types.TINYINT => ShortType // tinyint is unsigned in T-SQL (write_init.py:37)
    case Types.SMALLINT => ShortType
    case Types.INTEGER => IntegerType
    case Types.BIGINT => LongType
    case Types.REAL => FloatType
    case Types.FLOAT | Types.DOUBLE => DoubleType
    case Types.NUMERIC | Types.DECIMAL =>
      if (precision > 0 && precision <= 38) DecimalType(precision, math.max(scale, 0))
      else DecimalType(38, 18)
    case Types.DATE => DateType
    case Types.TIMESTAMP | Types.TIME | Types.TIMESTAMP_WITH_TIMEZONE => TimestampType
    case Types.BINARY | Types.VARBINARY | Types.LONGVARBINARY | Types.BLOB => BinaryType
    case _ => StringType // char/varchar/nchar/xml/uuid/unknown → string
  }
}
