package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.sources.{JdbcCatalog, JdbcSource}

/** Live-JDBC exercise of S1–S4/S7/J5 against embedded Derby (in-memory,
  * from Spark's own classpath — no external DB needed): catalog discovery
  * via DatabaseMetaData, ranged partitioned scans (the fan-out the
  * reference lacks, spark_reader.py:238-282), the query-source dbtable
  * rewrite, timestamp partition columns, and a full SCD2 sync driven
  * entirely through JDBC. */
class JdbcSourceSpec extends SparkSuite {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val conn = {
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("derby-home").toString)
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.executeUpdate("""CREATE TABLE APP.USERS (
      ID INT NOT NULL PRIMARY KEY,
      UID INT GENERATED ALWAYS AS IDENTITY,
      NAME VARCHAR(50),
      BAL DECIMAL(10,2),
      UPDATED TIMESTAMP,
      VER BIGINT NOT NULL)""")
    val ps = c.prepareStatement(
      "INSERT INTO APP.USERS (ID, NAME, BAL, UPDATED, VER) VALUES (?, ?, ?, ?, ?)")
    (1 to 100).foreach { i =>
      ps.setInt(1, i)
      ps.setString(2, s"user_$i")
      ps.setBigDecimal(3, new java.math.BigDecimal(s"$i.50"))
      ps.setTimestamp(4, java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 10:00:00"))
      ps.setLong(5, 1L)
      ps.executeUpdate()
    }
    st.close(); ps.close()
    c
  }

  test("S7: DatabaseMetaData discovery — pk, identity, source type names") {
    val meta = JdbcCatalog.discover(conn, null, "APP", "USERS")
    assert(meta.primaryKeys == Seq("ID"))
    val byName = meta.columns.map(c => c.name -> c).toMap
    assert(byName("ID").dataType == org.apache.spark.sql.types.IntegerType)
    assert(byName("ID").sourceType.contains("integer"))
    assert(byName("UID").isIdentity)
    assert(!byName("ID").isIdentity)
    assert(byName("NAME").dataType == org.apache.spark.sql.types.StringType)
    assert(byName("NAME").sourceType.contains("varchar"))
    assert(byName("BAL").dataType ==
      org.apache.spark.sql.types.DecimalType(10, 2))
    assert(byName("UPDATED").dataType == org.apache.spark.sql.types.TimestampType)
  }

  test("S1/S3: integral-pk auto-partitioned scan fans out N>1 JDBC partitions") {
    conn // force setup
    val src = new JdbcSource(url, Left("APP.USERS"), pks = Seq("ID"), numPartitions = 4)
    val df = src.read(spark)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    assert(df.agg(sum("ID")).head().getLong(0) == 5050L)
  }

  test("S6: query source with partitioning — rewritten to a derived dbtable") {
    conn
    val src = new JdbcSource(url, Right("SELECT ID, NAME, VER FROM APP.USERS WHERE ID <= 60"),
      pks = Seq("ID"), partitionColumn = Some("ID"), numPartitions = 3)
    val df = src.read(spark)
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 60)
  }

  test("timestamp partition column: bounds probe without a numeric cast") {
    conn
    val src = new JdbcSource(url, Left("APP.USERS"),
      partitionColumn = Some("UPDATED"), numPartitions = 4)
    val df = src.read(spark)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
  }

  test("non-partitionable explicit column is rejected loudly (no silent 1-conn scan)") {
    conn
    val src = new JdbcSource(url, Left("APP.USERS"),
      partitionColumn = Some("NAME"), numPartitions = 4)
    val e = intercept[IllegalArgumentException](src.read(spark))
    assert(e.getMessage.contains("NAME"))
  }

  test("decimal partition column: fractional bounds floor/ceil to covering stride") {
    conn
    val src = new JdbcSource(url, Left("APP.USERS"),
      partitionColumn = Some("BAL"), numPartitions = 4)
    val df = src.read(spark)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
  }

  test("P1 pushdown: generated remote SQL trims, caps and casts (reference db_to_delta.py:54-164)") {
    import org.apache.spark.sql.types._
    val cols = Seq(
      ColInfo("ID", IntegerType, sourceType = Some("integer")),
      ColInfo("NAME", StringType, sourceType = Some("varchar")),
      ColInfo("TOKEN", StringType, sourceType = Some("uuid")),     // trim-exempt
      ColInfo("BAL", DecimalType(10, 2), sourceType = Some("rowversion")), // mapped → BIGINT
      ColInfo("XMIN", IntegerType, sourceType = Some("xid")))      // xid double-cast
    val cfg = WriteConfig(maxTextSize = Some(10))
    val (sql, handled) = sources.JdbcSqlGen.projectedSql(cols, cfg, url, Left("APP.USERS")).get
    assert(sql.contains("""SUBSTR(LTRIM(RTRIM("NAME")), 1, 10) AS "NAME""""))
    // fixed-form identifiers are capped but NOT trimmed
    assert(sql.contains("""SUBSTR("TOKEN", 1, 10) AS "TOKEN""""))
    assert(!sql.contains("""RTRIM("TOKEN")"""))
    assert(sql.contains("""CAST("BAL" AS BIGINT) AS "BAL""""))
    assert(sql.contains("""CAST(CAST("XMIN" AS VARCHAR(32)) AS BIGINT) AS "XMIN""""))
    assert(sql.contains(""""ID"""") && !sql.contains("""TRIM("ID"""))
    assert(sql.endsWith("FROM APP.USERS"))
    // the engine aliases exactly the fully-converted columns, no more —
    // keyed on EXACT names so case-only-different columns can't collide
    assert(handled == Set("NAME", "TOKEN", "BAL", "XMIN"))
    // query sources wrap as a derived table
    val (subq, _) = sources.JdbcSqlGen.projectedSql(cols, cfg, url,
      Right("SELECT * FROM APP.USERS")).get
    assert(subq.endsWith("FROM (SELECT * FROM APP.USERS) graft_src"))
    // a column MAPPED to a string target has no safe remote type (a
    // VARCHAR(n) cast would silently truncate) → passes through, stays
    // Spark-side, and is NOT in the handled set
    val mappedStr = Seq(ColInfo("BAL", DecimalType(10, 2), sourceType = Some("money")))
    val strCfg = WriteConfig(dataTypeMap = Map("money" -> StringType),
      maxTextSize = Some(10))
    assert(sources.JdbcSqlGen.projectedSql(mappedStr, strCfg, url,
      Left("APP.USERS")).isEmpty)
    // untouched schema → no wrapping at all
    assert(sources.JdbcSqlGen.projectedSql(
      Seq(ColInfo("ID", IntegerType)), WriteConfig(noTrim = true), url,
      Left("APP.USERS")).isEmpty)
    // opt-out flag
    assert(sources.JdbcSqlGen.projectedSql(cols,
      cfg.copy(sourceSideProjection = false), url, Left("APP.USERS")).isEmpty)
  }

  test("P1 pushdown is value-identical to the no-pushdown plan (cap on whitespace)") {
    conn
    val st = conn.createStatement()
    st.executeUpdate("""CREATE TABLE APP.WS (
      ID INT NOT NULL PRIMARY KEY, NAME VARCHAR(60), VER BIGINT NOT NULL)""")
    val ps = conn.prepareStatement("INSERT INTO APP.WS VALUES (?, ?, ?)")
    // 'john     q' capped at 5 AFTER trim = 'john ' — the regression case:
    // a Spark-side RE-trim of the pushed value would drop that space
    Seq((1, "  john     q  "), (2, "plain"), (3, "  pad  ")).foreach { case (i, n) =>
      ps.setInt(1, i); ps.setString(2, n); ps.setLong(3, 1L); ps.executeUpdate()
    }
    st.close(); ps.close()
    val cfg0 = WriteConfig(deltaCol = Some("VER"), maxTextSize = Some(5))
    def synced(push: Boolean): Map[Int, String] = {
      val dest = tmpDir(s"graft-ws-$push")
      val src = new JdbcSource(url, Left("APP.WS"), pks = Seq("ID"),
        sourceTypes = Map("name" -> "varchar"))
      val cfg = cfg0.copy(sourceSideProjection = push)
      Graft.sync(spark, src, dest, cfg)
      Graft.writer(spark, src, dest, cfg).currentState()
        .collect().map(r => r.getAs[Int]("ID") -> r.getAs[String]("NAME")).toMap
    }
    val (withPush, without) = (synced(true), synced(false))
    assert(withPush == without, s"pushdown changed values: $withPush vs $without")
    assert(withPush(1) == "john ") // trim-then-cap keeps the cap's trailing space
  }

  test("P1 pushdown: Derby executes the trim/cap source-side, partitioning intact") {
    conn
    val st = conn.createStatement()
    st.executeUpdate("""CREATE TABLE APP.PADDED (
      ID INT NOT NULL PRIMARY KEY, NAME VARCHAR(60), VER BIGINT NOT NULL)""")
    val ps = conn.prepareStatement("INSERT INTO APP.PADDED VALUES (?, ?, ?)")
    (1 to 20).foreach { i =>
      ps.setInt(1, i); ps.setString(2, s"  padded_name_$i   "); ps.setLong(3, 1L)
      ps.executeUpdate()
    }
    st.close(); ps.close()
    val src = new JdbcSource(url, Left("APP.PADDED"), pks = Seq("ID"),
      numPartitions = 4, sourceTypes = Map("name" -> "varchar"))
    val cfg = WriteConfig(maxTextSize = Some(9))
    val (pushed, handled) = src.pushedProjection(src.columns(spark), cfg).get
    assert(handled == Set("NAME"))
    val df = pushed.read(spark)
    // the RAW read — BEFORE any Spark-side projection — is already
    // trimmed and capped: the conversion ran in Derby
    val names = df.select("NAME").collect().map(_.getString(0)).toSet
    assert(names.forall(n => n == n.trim && n.length <= 9), names.take(3).toSeq)
    assert(names.contains("padded_na")) // trim THEN cap, reference order
    // pk fan-out still applies through the generated query
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 20)
  }

  test("S4: openQuery rewrite wraps remote SQL for a linked-server gateway") {
    val q = JdbcSource.openQuery("WAREHOUSE", "select * from t where name = 'o''brien'")
    // bracket-quoted server, single-quote doubling inside the literal
    assert(q == "select * from openquery([WAREHOUSE], " +
      "'select * from t where name = ''o''''brien''')")
    // composes as a query source target (the T-SQL gateway executes it;
    // Derby can't parse OPENQUERY, so execution is covered by the generic
    // Right(query) path above)
    val src = new JdbcSource(url, Right(q))
    assert(src.isInstanceOf[sources.Source])
  }

  test("full SCD2 sync from a live JDBC table: full load, then delta") {
    conn
    val dest = tmpDir("graft-jdbc-dest")
    val src = new JdbcSource(url, Left("APP.USERS"), pks = Seq("ID"), numPartitions = 4)
    val cfg = WriteConfig(deltaCol = Some("VER"))

    assert(Graft.sync(spark, src, dest, cfg) == LoadResult.FullLoad(100))
    assert(Graft.sync(spark, src, dest, cfg) == LoadResult.NoLoad)

    val st = conn.createStatement()
    st.executeUpdate("UPDATE APP.USERS SET NAME = 'renamed', VER = 2 WHERE ID = 7")
    st.executeUpdate(
      "INSERT INTO APP.USERS (ID, NAME, BAL, UPDATED, VER) VALUES (101, 'new', 1.00, CURRENT_TIMESTAMP, 2)")
    st.executeUpdate("DELETE FROM APP.USERS WHERE ID = 13")
    st.close()

    Graft.sync(spark, src, dest, cfg) match {
      case LoadResult.DeltaLoad(inserts, strange, deletes, dirty) =>
        assert(inserts == 2 && strange == 0 && deletes == 1 && !dirty)
      case other => fail(s"expected DeltaLoad, got $other")
    }
    val cur = Graft.writer(spark, src, dest, cfg).currentState()
    assert(cur.count() == 100) // 100 - 1 deleted + 1 inserted
    assert(cur.filter(col("ID") === 7).head().getAs[String]("NAME") == "renamed")
    assert(cur.filter(col("ID") === 13).isEmpty)
    assert(cur.filter(col("ID") === 101).count() == 1)
  }

  test("J3 pushdown: pkFilterSqls renders IN-lists, OR-of-conjuncts, chunks under 7000 chars") {
    import sources.JdbcSqlGen
    // single non-null pk → IN form
    val in = JdbcSqlGen.pkFilterSqls(Seq("\"ID\""), Seq(Seq(1), Seq(2), Seq(3)),
      Left("APP.USERS")).get
    assert(in == Seq("""SELECT * FROM APP.USERS WHERE "ID" IN (1, 2, 3)"""))
    // string literals escape quotes
    val esc = JdbcSqlGen.pkFilterSqls(Seq("\"NAME\""), Seq(Seq("o'brien")),
      Left("T")).get
    assert(esc == Seq("""SELECT * FROM T WHERE "NAME" IN ('o''brien')"""))
    // composite pk → OR of conjuncts; nulls render IS NULL
    val comp = JdbcSqlGen.pkFilterSqls(Seq("\"A\"", "\"B\""),
      Seq(Seq(1, "x"), Seq(2, null)), Left("T")).get
    assert(comp == Seq(
      """SELECT * FROM T WHERE ("A" = 1 AND "B" = 'x') OR ("A" = 2 AND "B" IS NULL)"""))
    // temporal literals use JDBC escape syntax (driver-expanded, portable)
    val ts = JdbcSqlGen.pkFilterSqls(Seq("\"A\"", "\"D\""),
      Seq(Seq(java.sql.Timestamp.valueOf("2024-01-02 10:00:00"),
        java.sql.Date.valueOf("2024-01-02"))), Left("T")).get
    assert(ts.head.contains("{ts '2024-01-02 10:00:00") && ts.head.contains("{d '2024-01-02'}"))
    // query source wraps as a derived table
    val sub = JdbcSqlGen.pkFilterSqls(Seq("\"ID\""), Seq(Seq(5)),
      Right("SELECT * FROM APP.USERS")).get
    assert(sub == Seq("""SELECT * FROM (SELECT * FROM APP.USERS) graft_pkf WHERE "ID" IN (5)"""))
    // the 7000-char rule (reference db_to_delta.py:968-985): a big pk set
    // splits into multiple SQLs, each under the cap, covering every tuple
    val big = (1 to 3000).map(i => Seq[Any](1000000 + i))
    val chunks = JdbcSqlGen.pkFilterSqls(Seq("\"ID\""), big, Left("APP.USERS")).get
    assert(chunks.size > 1, s"expected multiple chunks, got ${chunks.size}")
    assert(chunks.forall(_.length <= 7000), chunks.map(_.length))
    assert(chunks.map(c => "\\d{7}".r.findAllIn(c).size).sum == 3000)
    // an unrenderable value (binary pk) poisons the whole pushdown — a
    // partial filter would under-fetch, which is data loss
    assert(JdbcSqlGen.pkFilterSqls(Seq("\"ID\""),
      Seq(Seq(Array[Byte](1, 2))), Left("T")).isEmpty)
  }

  test("J3 pushdown: Derby executes a multi-chunk readForPks with correct rows") {
    conn
    // dedicated table: APP.USERS is mutated by other tests in this suite
    val st = conn.createStatement()
    st.executeUpdate("""CREATE TABLE APP.PKF (
      ID INT NOT NULL PRIMARY KEY, NAME VARCHAR(50))""")
    val ps = conn.prepareStatement("INSERT INTO APP.PKF VALUES (?, ?)")
    (1 to 2000).foreach { i => ps.setInt(1, i); ps.setString(2, s"n$i"); ps.executeUpdate() }
    ps.close(); st.close()
    val src = new JdbcSource(url, Left("APP.PKF"), pks = Seq("ID"))
    val pkCols = Seq(ColInfo("ID", org.apache.spark.sql.types.IntegerType,
      sourceType = Some("integer")))
    // 2000 int pks ≈ 10000 chars of literals → >1 chunk, each executed on
    // Derby and unioned
    val wanted = (1 to 2000).map(i => org.apache.spark.sql.Row(i))
    assert(sources.JdbcSqlGen.pkFilterSqls(
      Seq("\"ID\""), wanted.map(_.toSeq), Left("APP.PKF")).get.size > 1)
    val df = src.readForPks(spark, pkCols, WriteConfig(), Set.empty, wanted).get
    val got = df.select("ID").collect().map(_.getInt(0)).toSet
    assert(got == (1 to 2000).toSet)
    // empty tuple set → schema-only empty frame, no remote filter at all
    val empty = src.readForPks(spark, pkCols, WriteConfig(), Set.empty, Nil).get
    assert(empty.isEmpty && empty.columns.contains("ID"))
  }

  test("J3 pushdown: strange-update sync fetches inline rows via chunked IN-list SQL") {
    conn
    val st0 = conn.createStatement()
    st0.executeUpdate("""CREATE TABLE APP.STRANGE (
      ID INT NOT NULL PRIMARY KEY, NAME VARCHAR(50), VER BIGINT NOT NULL)""")
    val ps = conn.prepareStatement("INSERT INTO APP.STRANGE VALUES (?, ?, ?)")
    (1 to 50).foreach { i => ps.setInt(1, i); ps.setString(2, s"n$i"); ps.setLong(3, 5L)
      ps.executeUpdate() }
    ps.close()
    val dest = tmpDir("graft-jdbc-strange")
    // spy wrapper: records whether the IN-list path actually ran (vs the
    // broadcast fallback silently taking over)
    var pushes = 0
    val inner = new JdbcSource(url, Left("APP.STRANGE"), pks = Seq("ID"))
    val src = new sources.Source with sources.PkPushdown {
      def read(s: org.apache.spark.sql.SparkSession) = inner.read(s)
      def columns(s: org.apache.spark.sql.SparkSession) = inner.columns(s)
      def primaryKeys(s: org.apache.spark.sql.SparkSession) = inner.primaryKeys(s)
      def readForPks(s: org.apache.spark.sql.SparkSession, pkCols: Seq[ColInfo],
          cfg: WriteConfig, conv: Set[String], tuples: Seq[org.apache.spark.sql.Row]) = {
        val r = inner.readForPks(s, pkCols, cfg, conv, tuples)
        if (r.isDefined) pushes += 1
        r
      }
    }
    val cfg = WriteConfig(deltaCol = Some("VER"))
    assert(Graft.sync(spark, src, dest, cfg) == LoadResult.FullLoad(50))
    // restore-from-backup shape: rows change but VER does NOT move past the
    // watermark (new rows at VER=3 < max 5) → step-3 strange updates
    val st = conn.createStatement()
    st.executeUpdate("UPDATE APP.STRANGE SET NAME = 'weird7', VER = 3 WHERE ID = 7")
    st.executeUpdate("INSERT INTO APP.STRANGE VALUES (51, 'weird51', 3)")
    st.close()
    Graft.sync(spark, src, dest, cfg) match {
      case LoadResult.DeltaLoad(_, strange, _, _) => assert(strange == 2)
      case other => fail(s"expected DeltaLoad, got $other")
    }
    assert(pushes == 1, "inline fetch did not go through the pk pushdown")
    val cur = Graft.writer(spark, src, dest, cfg).currentState()
    assert(cur.count() == 51)
    assert(cur.filter(col("ID") === 7).head().getAs[String]("NAME") == "weird7")
    assert(cur.filter(col("ID") === 51).head().getAs[String]("NAME") == "weird51")
  }
}
