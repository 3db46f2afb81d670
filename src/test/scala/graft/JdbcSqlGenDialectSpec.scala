package graft

import org.apache.spark.sql.types._

import graft.sources.JdbcSqlGen

/** Golden TEXT snapshots of the generated remote SQL for the two dialects
  * the reference actually deploys against — tsql (MS SQL Server) and
  * postgres (reference db_to_delta.py:54-164, metadata.py:74-177). No
  * live DB here (the sandbox has neither); Derby executes the same
  * generator in JdbcSourceSpec, so these tests pin the per-dialect
  * RENDERINGS — quoting, TRIM spelling, rowversion→BIGINT,
  * xid-through-text casts, IN-list literals — against reference-shaped
  * expectations so a Spark JdbcDialects change or a generator edit can't
  * silently alter what a production sync sends over the wire. */
class JdbcSqlGenDialectSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val tsqlUrl = "jdbc:sqlserver://host;databaseName=db"
  private val pgUrl = "jdbc:postgresql://host/db"

  test("tsql: rowversion maps to BIGINT, trim+cap via LTRIM/RTRIM + SUBSTRING") {
    // the reference's canonical T-SQL table shape (metadata.py:74-177):
    // int pk, varchar payload, uniqueidentifier, rowversion delta col
    val cols = Seq(
      ColInfo("Id", IntegerType, sourceType = Some("int")),
      ColInfo("Name", StringType, sourceType = Some("varchar")),
      ColInfo("RowId", StringType, sourceType = Some("uniqueidentifier")),
      ColInfo("Version", BinaryType, sourceType = Some("rowversion")))
    val cfg = WriteConfig(dataTypeMap = WriteConfig.tsqlTypeMap, maxTextSize = Some(300))
    val (sql, handled) = JdbcSqlGen.projectedSql(cols, cfg, tsqlUrl,
      Left("dbo.[User]")).get
    assert(sql ==
      """SELECT "Id", SUBSTRING(LTRIM(RTRIM("Name")), 1, 300) AS "Name", """ +
      """SUBSTRING("RowId", 1, 300) AS "RowId", CAST("Version" AS BIGINT) AS "Version" """.trim +
      " FROM dbo.[User]")
    // fixed-form uniqueidentifier is capped but NEVER trimmed
    // (reference no-trim exemption); rowversion ships as BIGINT
    // (write_init.py:29-38 default type map)
    assert(!sql.contains("""RTRIM("RowId")"""))
    assert(handled == Set("Name", "RowId", "Version"))
  }

  test("tsql: append-only log shape — identity int pk, nvarchar(max), datetime default") {
    // the reference's dbo.[log] fixture (tests/sqls/init_mssql.sql:17):
    // identity pk needs no rendering (plain int), nvarchar(max) trims and
    // caps (maxTextSize bounds the unbounded column), the delta-capable
    // datetime passes through untouched — the AppendInserts load shape
    val cols = Seq(
      ColInfo("id", IntegerType, sourceType = Some("int")),
      ColInfo("message", StringType, sourceType = Some("nvarchar")),
      ColInfo("inserted_at", TimestampType, sourceType = Some("datetime")))
    val cfg = WriteConfig(dataTypeMap = WriteConfig.tsqlTypeMap, maxTextSize = Some(300))
    val (sql, handled) = JdbcSqlGen.projectedSql(cols, cfg, tsqlUrl,
      Left("dbo.[log]")).get
    assert(sql ==
      """SELECT "id", SUBSTRING(LTRIM(RTRIM("message")), 1, 300) AS "message", """ +
      """"inserted_at" FROM dbo.[log]""")
    assert(handled == Set("message"))
  }

  test("tsql: the T-SQL 'timestamp' alias of rowversion maps through tsqlTypeMap only") {
    val cols = Seq(ColInfo("TS", BinaryType, sourceType = Some("timestamp")))
    // with the tsql map: BIGINT cast renders
    val (sql, _) = JdbcSqlGen.projectedSql(cols,
      WriteConfig(dataTypeMap = WriteConfig.tsqlTypeMap), tsqlUrl, Left("T")).get
    assert(sql == """SELECT CAST("TS" AS BIGINT) AS "TS" FROM T""")
    // with the DEFAULT map: no conversion, no wrapping (a genuine
    // timestamp column must not be cast to epoch BIGINT)
    assert(JdbcSqlGen.projectedSql(cols, WriteConfig(), tsqlUrl, Left("T")).isEmpty)
  }

  test("postgres: xid delta column double-casts through text (xmin path)") {
    // reference db_to_delta.py:73-77 renders xmin::text::bigint — the
    // generator's portable spelling is nested CASTs
    val cols = Seq(
      ColInfo("id", IntegerType, sourceType = Some("int4")),
      ColInfo("xmin", IntegerType, sourceType = Some("xid")),
      ColInfo("note", StringType, sourceType = Some("text")))
    val cfg = WriteConfig()
    val (sql, handled) = JdbcSqlGen.projectedSql(cols, cfg, pgUrl,
      Left("public.accounts")).get
    assert(sql ==
      """SELECT "id", CAST(CAST("xmin" AS VARCHAR(32)) AS BIGINT) AS "xmin", """ +
      """LTRIM(RTRIM("note")) AS "note" FROM public.accounts""")
    assert(handled == Set("xmin", "note"))
  }

  test("postgres: oid/uuid are trim-exempt; uncapped strings trim only") {
    val cols = Seq(
      ColInfo("u", StringType, sourceType = Some("uuid")),
      ColInfo("o", StringType, sourceType = Some("oid")),
      ColInfo("s", StringType, sourceType = Some("varchar")))
    val (sql, handled) = JdbcSqlGen.projectedSql(cols, WriteConfig(), pgUrl,
      Left("t")).get
    // exempt columns pass through UNWRAPPED (no conversion at all),
    // plain strings trim; nothing caps without maxTextSize
    assert(sql == """SELECT "u", "o", LTRIM(RTRIM("s")) AS "s" FROM t""")
    assert(handled == Set("s"))
    assert(!sql.contains("SUBSTRING") && !sql.contains("SUBSTR("))
  }

  test("dialect-typed casts come from Spark's JdbcDialects registry") {
    // a dataTypeMap retarget to SMALLINT renders the dialect's own type
    // name on both dialects (tinyint is unsigned in T-SQL —
    // write_init.py:29-38)
    val cols = Seq(ColInfo("flag", ByteType, sourceType = Some("tinyint")))
    val cfg = WriteConfig() // defaultTypeMap maps tinyint → SMALLINT
    val (tq, _) = JdbcSqlGen.projectedSql(cols, cfg, tsqlUrl, Left("T")).get
    val (pq, _) = JdbcSqlGen.projectedSql(cols, cfg, pgUrl, Left("T")).get
    assert(tq == """SELECT CAST("flag" AS SMALLINT) AS "flag" FROM T""")
    assert(pq == """SELECT CAST("flag" AS SMALLINT) AS "flag" FROM T""")
  }

  test("query sources wrap as a derived table on both dialects") {
    val cols = Seq(ColInfo("n", StringType, sourceType = Some("varchar")))
    val (tq, _) = JdbcSqlGen.projectedSql(cols, WriteConfig(), tsqlUrl,
      Right("SELECT * FROM dbo.T WHERE x = 1")).get
    assert(tq == """SELECT LTRIM(RTRIM("n")) AS "n" FROM (SELECT * FROM dbo.T WHERE x = 1) graft_src""")
    val (pq, _) = JdbcSqlGen.projectedSql(cols, WriteConfig(), pgUrl,
      Right("SELECT * FROM t WHERE x = 1")).get
    assert(pq == """SELECT LTRIM(RTRIM("n")) AS "n" FROM (SELECT * FROM t WHERE x = 1) graft_src""")
  }

  test("pk IN-list literals render portably for both dialects") {
    // strings escape by doubling; temporals ship as JDBC {ts}/{d} escapes
    // every driver expands dialect-correctly — the strange-update fetch
    // (db_to_delta.py:907-992) must not depend on dialect literal syntax
    val sqls = JdbcSqlGen.pkFilterSqls(
      Seq("\"K\"", "\"W\""),
      Seq(Seq("o'neil", java.sql.Timestamp.valueOf("2024-03-04 05:06:07")),
        Seq("plain", null)),
      Left("dbo.T")).get
    assert(sqls == Seq(
      """SELECT * FROM dbo.T WHERE ("K" = 'o''neil' AND "W" = {ts '2024-03-04 05:06:07.0'}) """.trim +
      """ OR ("K" = 'plain' AND "W" IS NULL)"""))
  }

  test("tsql string pk literals ship as N'...' national-character literals") {
    // a plain varchar literal code-page-substitutes characters outside the
    // DB's default collation — the pushed predicate would then never match
    // the row it was meant to fetch (silent under-fetch = data loss)
    val sqls = JdbcSqlGen.pkFilterSqls(
      Seq("\"K\""), Seq(Seq("müller"), Seq("o'neil")), Left("dbo.T"), tsqlUrl).get
    assert(sqls == Seq("""SELECT * FROM dbo.T WHERE "K" IN (N'müller', N'o''neil')"""))
  }

  test("non-ASCII string pks on an unknown dialect fall back to the broadcast join") {
    // we can't see the server charset / escape mode from the URL alone, so
    // anything past printable-ASCII (or containing a backslash, which the
    // MySQL family escape-processes) refuses to render; the caller's
    // Spark-side tuple join then fetches via the full read — over-fetch,
    // never under-fetch
    assert(JdbcSqlGen.pkFilterSqls(
      Seq("\"K\""), Seq(Seq("müller")), Left("T"), pgUrl).isEmpty)
    assert(JdbcSqlGen.pkFilterSqls(
      Seq("\"K\""), Seq(Seq("a\\b")), Left("T"), pgUrl).isEmpty)
    // ASCII stays pushable on any dialect
    assert(JdbcSqlGen.pkFilterSqls(
      Seq("\"K\""), Seq(Seq("plain")), Left("T"), pgUrl).get ==
      Seq("""SELECT * FROM T WHERE "K" IN ('plain')"""))
  }

  test("openquery gateway wrap pins the reference's linked-server spelling") {
    // reference spark_reader.py:187-196: bracket-quoted server name,
    // inner quotes doubled
    assert(graft.sources.JdbcSource.openQuery("WH", "select 1 as 'a'") ==
      "select * from openquery([WH], 'select 1 as ''a''')")
  }

  test("postgres: canonical user-table shape — spaced pk, text/varchar trim+cap, numeric passthrough, xmin delta") {
    // the reference's pg fixture class (tests/sqls/init_postgres.sql
    // "user": bigserial "User - iD" pk, varchar/text payload,
    // numeric(15,3), xmin as the auto-detected delta source)
    val cols = Seq(
      ColInfo("User - iD", LongType, sourceType = Some("bigint")),
      ColInfo("FirstName", StringType, sourceType = Some("varchar")),
      ColInfo("LastName", StringType, sourceType = Some("text")),
      ColInfo("Age", DecimalType(15, 3), sourceType = Some("numeric")),
      ColInfo("xmin", LongType, sourceType = Some("xid")))
    val cfg = WriteConfig(maxTextSize = Some(300))
    val (sql, handled) = JdbcSqlGen.projectedSql(cols, cfg, pgUrl,
      Left("dbo.\"user\"")).get
    assert(sql ==
      """SELECT "User - iD", """ +
      """SUBSTRING(LTRIM(RTRIM("FirstName")), 1, 300) AS "FirstName", """ +
      """SUBSTRING(LTRIM(RTRIM("LastName")), 1, 300) AS "LastName", """ +
      """"Age", CAST(CAST("xmin" AS VARCHAR(32)) AS BIGINT) AS "xmin" """.trim +
      " FROM dbo.\"user\"")
    // bigserial pk and numeric(15,3) pass through untouched; xmin
    // double-casts through text (the reference's db_to_delta.py:73-77
    // rendering — a direct xid→bigint cast is invalid SQL on pg)
    assert(handled == Set("FirstName", "LastName", "xmin"))
  }

  test("tsql: canonical user-table shape — spaced pk + spaced rowversion, nvarchar(max), collated fk") {
    // the reference's PRIMARY fixture class (tests/sqls/init_mssql.sql
    // "user"…"user8", every scenario test 01–12 runs on it): spaced
    // bracket pk [User - iD] bigint identity, varchar(100) FirstName,
    // nvarchar(max) LastName, decimal(15,3) Age, companyid varchar(10)
    // under an Icelandic collation (collation is a comparison property —
    // it must NOT change the projection rendering), and the SPACED
    // [time stamp] rowversion delta column
    val cols = Seq(
      ColInfo("User - iD", LongType, sourceType = Some("bigint")),
      ColInfo("FirstName", StringType, sourceType = Some("varchar")),
      ColInfo("LastName", StringType, sourceType = Some("nvarchar")),
      ColInfo("Age", DecimalType(15, 3), sourceType = Some("decimal")),
      ColInfo("companyid", StringType, sourceType = Some("varchar")),
      ColInfo("time stamp", BinaryType, sourceType = Some("rowversion")))
    val cfg = WriteConfig(dataTypeMap = WriteConfig.tsqlTypeMap, maxTextSize = Some(300))
    val (sql, handled) = JdbcSqlGen.projectedSql(cols, cfg, tsqlUrl,
      Left("dbo.[user]")).get
    assert(sql ==
      """SELECT "User - iD", """ +
      """SUBSTRING(LTRIM(RTRIM("FirstName")), 1, 300) AS "FirstName", """ +
      """SUBSTRING(LTRIM(RTRIM("LastName")), 1, 300) AS "LastName", """ +
      """"Age", SUBSTRING(LTRIM(RTRIM("companyid")), 1, 300) AS "companyid", """ +
      """CAST("time stamp" AS BIGINT) AS "time stamp" FROM dbo.[user]""")
    // bigint pk and decimal(15,3) pass through; nvarchar(max) gets the
    // same trim+cap as varchar (max-typed text is exactly what
    // maxTextSize exists to bound); the spaced rowversion quotes inside
    // its BIGINT cast
    assert(handled == Set("FirstName", "LastName", "companyid", "time stamp"))
  }

  test("tsql: temporal-table shape (ROW START) — datetimes pass through, varchars trim+cap") {
    // the reference's system-versioned fixture (tests/sqls/init_mssql.sql
    // company3: varchar pk + payload, datetime, GENERATED ALWAYS AS ROW
    // START/END datetime2 pair) — the delta source for temporal tables.
    // datetime/datetime2 have no tsqlTypeMap entry (they land as Spark
    // timestamps unchanged), so only the varchars rewrite source-side
    val cols = Seq(
      ColInfo("id", StringType, sourceType = Some("varchar")),
      ColInfo("name", StringType, sourceType = Some("varchar")),
      ColInfo("date_timer", TimestampType, sourceType = Some("datetime")),
      ColInfo("Start", TimestampType, sourceType = Some("datetime2"), isRowStart = true),
      ColInfo("End", TimestampType, sourceType = Some("datetime2")))
    val cfg = WriteConfig(dataTypeMap = WriteConfig.tsqlTypeMap, maxTextSize = Some(300))
    val (sql, handled) = JdbcSqlGen.projectedSql(cols, cfg, tsqlUrl,
      Left("dbo.[company3]")).get
    assert(sql ==
      """SELECT SUBSTRING(LTRIM(RTRIM("id")), 1, 300) AS "id", """ +
      """SUBSTRING(LTRIM(RTRIM("name")), 1, 300) AS "name", """ +
      """"date_timer", "Start", "End" FROM dbo.[company3]""")
    assert(handled == Set("id", "name"))
    // the ROW-START watermark ships as a JDBC temporal escape — every
    // driver the reference targets expands it dialect-correctly
    assert(JdbcSqlGen.sqlLiteral(
      java.sql.Timestamp.valueOf("2024-03-01 10:15:30.123"), tsqlUrl) ==
      Some("{ts '2024-03-01 10:15:30.123'}"))
  }

  test("tsql: no-pk xml table shape — spaced names quote, xml caps but never trims") {
    // the reference's always-full fixture ([long schema].[long table name]:
    // spaced identifiers, an xml column, uniqueidentifier default, date) —
    // no pk means every load is a full load, but the projection SQL must
    // still render: xml is NOT a string type at the source (leading
    // whitespace is part of the document), so like uniqueidentifier it is
    // capped, never trimmed
    val cols = Seq(
      ColInfo("long column name", IntegerType, sourceType = Some("int")),
      ColInfo("dt", StringType, sourceType = Some("xml")),
      ColInfo("uid", StringType, sourceType = Some("uniqueidentifier")),
      ColInfo("date", DateType, sourceType = Some("date")))
    val cfg = WriteConfig(dataTypeMap = WriteConfig.tsqlTypeMap, maxTextSize = Some(300))
    val (sql, handled) = JdbcSqlGen.projectedSql(cols, cfg, tsqlUrl,
      Left("[long schema].[long table name]")).get
    assert(sql ==
      """SELECT "long column name", SUBSTRING("dt", 1, 300) AS "dt", """ +
      """SUBSTRING("uid", 1, 300) AS "uid", "date" """.trim +
      " FROM [long schema].[long table name]")
    assert(!sql.contains("RTRIM"))
    assert(handled == Set("dt", "uid"))
  }

  test("postgres: company3 shape — varchar trim+cap, timestamp passthrough, xmin watermark") {
    // the same fixture class the tsql temporal test pins, in its postgres
    // spelling (tests/sqls/init_postgres.sql company3: varchar pk +
    // payload, plain timestamp) — postgres has no system-versioned ROW
    // START, so the delta watermark there is xmin, double-cast through
    // text exactly like the canonical user-table shape
    val cols = Seq(
      ColInfo("id", StringType, sourceType = Some("varchar")),
      ColInfo("name", StringType, sourceType = Some("varchar")),
      ColInfo("date_timer", TimestampType, sourceType = Some("timestamp")),
      ColInfo("xmin", LongType, sourceType = Some("xid")))
    val cfg = WriteConfig(maxTextSize = Some(300))
    val (sql, handled) = JdbcSqlGen.projectedSql(cols, cfg, pgUrl,
      Left("dbo.\"company3\"")).get
    assert(sql ==
      """SELECT SUBSTRING(LTRIM(RTRIM("id")), 1, 300) AS "id", """ +
      """SUBSTRING(LTRIM(RTRIM("name")), 1, 300) AS "name", """ +
      """"date_timer", CAST(CAST("xmin" AS VARCHAR(32)) AS BIGINT) AS "xmin" """.trim +
      " FROM dbo.\"company3\"")
    assert(handled == Set("id", "name", "xmin"))
    // the timestamp watermark ships as the same JDBC temporal escape on
    // postgres — the driver expands it dialect-correctly
    assert(JdbcSqlGen.sqlLiteral(
      java.sql.Timestamp.valueOf("2024-03-01 10:15:30.123"), pgUrl) ==
      Some("{ts '2024-03-01 10:15:30.123'}"))
  }

  test("postgres: no-pk xml table shape — spaced names quote, xml/uuid cap but never trim") {
    // the postgres spelling of the always-full fixture
    // (init_postgres.sql "long schema"."long table name": spaced
    // identifiers, xml, uuid default, date) — xml and uuid are not string
    // types at the source, so both cap without trimming (the tsql twin
    // pins the identical rule through uniqueidentifier)
    val cols = Seq(
      ColInfo("long column name", IntegerType, sourceType = Some("int4")),
      ColInfo("dt", StringType, sourceType = Some("xml")),
      ColInfo("uid", StringType, sourceType = Some("uuid")),
      ColInfo("date", DateType, sourceType = Some("date")))
    val cfg = WriteConfig(maxTextSize = Some(300))
    val (sql, handled) = JdbcSqlGen.projectedSql(cols, cfg, pgUrl,
      Left("\"long schema\".\"long table name\"")).get
    assert(sql ==
      """SELECT "long column name", SUBSTRING("dt", 1, 300) AS "dt", """ +
      """SUBSTRING("uid", 1, 300) AS "uid", "date" """.trim +
      " FROM \"long schema\".\"long table name\"")
    assert(!sql.contains("RTRIM"))
    assert(handled == Set("dt", "uid"))
  }

  test("user2$ shape: dollar identifiers; tsql tinyint widens to SMALLINT source-side") {
    // the reference's user2$ fixture (tests/sqls/init_mssql.sql /
    // init_postgres.sql): a $ in the TABLE name (quoted by the caller's
    // catalog spelling) and an `nbr` column that is tinyint on tsql —
    // UNSIGNED 0–255, so the reference maps it to SMALLINT before Spark
    // ever sees it (write_init.py tinyint note; defaultTypeMap) — but a
    // plain SIGNED smallint on postgres, which passes through untouched
    val tcols = Seq(
      ColInfo("User - iD", LongType, sourceType = Some("bigint")),
      ColInfo("FirstName", StringType, sourceType = Some("varchar")),
      ColInfo("nbr", ByteType, sourceType = Some("tinyint")),
      ColInfo("time stamp", BinaryType, sourceType = Some("rowversion")))
    val cfg = WriteConfig(dataTypeMap = WriteConfig.tsqlTypeMap, maxTextSize = Some(300))
    val (tsql, thandled) = JdbcSqlGen.projectedSql(tcols, cfg, tsqlUrl,
      Left("dbo.[user2$]")).get
    assert(tsql ==
      """SELECT "User - iD", """ +
      """SUBSTRING(LTRIM(RTRIM("FirstName")), 1, 300) AS "FirstName", """ +
      """CAST("nbr" AS SMALLINT) AS "nbr", """ +
      """CAST("time stamp" AS BIGINT) AS "time stamp" FROM dbo.[user2$]""")
    assert(thandled == Set("FirstName", "nbr", "time stamp"))
    // postgres: smallint is already signed-correct — no cast, no rewrite
    val pcols = Seq(
      ColInfo("User - iD", LongType, sourceType = Some("bigint")),
      ColInfo("FirstName", StringType, sourceType = Some("varchar")),
      ColInfo("nbr", ShortType, sourceType = Some("smallint")))
    val (psql, phandled) = JdbcSqlGen.projectedSql(pcols,
      WriteConfig(maxTextSize = Some(300)), pgUrl,
      Left("dbo.\"user2$\"")).get
    assert(psql ==
      """SELECT "User - iD", """ +
      """SUBSTRING(LTRIM(RTRIM("FirstName")), 1, 300) AS "FirstName", """ +
      """"nbr" FROM dbo."user2$"""")
    assert(phandled == Set("FirstName"))
  }
}
