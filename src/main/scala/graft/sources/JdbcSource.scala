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
    val transformationHook: DataFrame => DataFrame = identity)
    extends Source with ProjectionPushdown with PkPushdown {

  /** J3 IN-list pushdown (reference db_to_delta.py:907-992): ship the
    * strange-update pk set INTO the remote SQL as chunked IN-list /
    * OR-of-conjunct predicates under the 7000-char rule, so the source DB
    * returns ONLY those rows instead of streaming the whole table through
    * the JDBC scan. Each chunk is its own remote query; results union.
    * The lhs of each comparison is the P1 conversion chain over the raw
    * column (tuples carry TARGET-converted values) — unless the column was
    * already converted inside this source (a pushed-projection wrapper),
    * where the bare quoted name compares converted-to-converted. Chunks
    * stay ≤ ~7000 chars, and the engine's Spark-side tuple join still
    * applies afterwards, so a dialect quirk here can over-fetch but never
    * corrupt. */
  def readForPks(
      spark: SparkSession,
      pkCols: Seq[graft.ColInfo],
      cfg: graft.WriteConfig,
      alreadyConverted: Set[String],
      tuples: Seq[org.apache.spark.sql.Row]): Option[DataFrame] = {
    if (tuples.isEmpty) return Some(read(spark).limit(0))
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
    val lhs: Option[Seq[String]] = {
      val rendered = pkCols.map { c =>
        val q = dialect.quoteIdentifier(c.name)
        if (alreadyConverted(c.name)) Some(q)
        else JdbcSqlGen.convertExpr(c, cfg, url) match {
          case Some(Some(expr)) => Some(expr)
          case Some(None) => Some(q)
          case None => None // conversion unrenderable → comparing the raw
          // column could MISS rows (under-fetch = data loss); fall back
        }
      }
      if (rendered.exists(_.isEmpty)) None else Some(rendered.flatten)
    }
    for {
      l <- lhs
      sqls <- JdbcSqlGen.pkFilterSqls(l, tuples.map(_.toSeq), tableOrQuery, url)
    } yield {
      val dfs = sqls.map { sql =>
        val r = spark.read.format("jdbc").option("url", url).option("query", sql)
        props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
      }
      transformationHook(dfs.reduce(_ unionByName _))
    }
  }

  /** P1 pushed into the remote SQL (reference db_to_delta.py:54-164 runs
    * CAST/TRIM/caps in the source DB): wraps the target in a generated
    * SELECT whose items trim, cap and cast — a live sync then ships
    * converted bytes, not raw varchar(max). Partitioning/pk/type metadata
    * carry over; column names are preserved via aliases. Returns the
    * pushed source plus the set of column names whose conversion ran
    * ENTIRELY source-side — the engine must not re-apply trim/cap to
    * those (re-trimming a capped value is not a no-op when the cap lands
    * on whitespace). */
  def pushedProjection(
      cols: Seq[graft.ColInfo], cfg: graft.WriteConfig): Option[(Source, Set[String])] =
    JdbcSqlGen.projectedSql(cols, cfg, url, tableOrQuery).map { case (sql, handled) =>
      (new JdbcSource(url, Right(sql), props, pks, partitionColumn,
        numPartitions, sourceTypes, transformationHook), handled)
    }

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

/** Renders the P1 projection (graft.scd2.Projection.sourceConvert
  * semantics) as source-dialect SQL — the Spark-native analogue of the
  * reference's sqlglot select-list generation (db_to_delta.py:54-164).
  * Identifier quoting and type names come from Spark's own JdbcDialects
  * registry; only the few function spellings Spark doesn't model (TRIM,
  * SUBSTRING) are mapped here. The Spark-side projection re-applies the
  * same conversions afterwards, so a dialect that ignores a rendering is a
  * lost optimization, never a correctness change. */
object JdbcSqlGen {
  import org.apache.spark.sql.jdbc.JdbcDialects

  /** SUBSTR vs SUBSTRING by driver family (Derby and Oracle only ship
    * SUBSTR; everything else the reference targets accepts SUBSTRING). */
  private def substrFn(url: String): String =
    if (url.startsWith("jdbc:derby") || url.startsWith("jdbc:oracle")) "SUBSTR"
    else "SUBSTRING"

  /** ANSI type names for targets the dialect leaves unmapped (the same
    * fallback table Spark's JdbcUtils keeps for writes). */
  private def ansiTypeName(t: DataType): Option[String] = t match {
    case LongType => Some("BIGINT")
    case IntegerType => Some("INTEGER")
    case ShortType => Some("SMALLINT")
    case DoubleType => Some("DOUBLE PRECISION")
    case FloatType => Some("REAL")
    case BooleanType => Some("BOOLEAN")
    case DateType => Some("DATE")
    case TimestampType => Some("TIMESTAMP")
    case d: DecimalType => Some(s"DECIMAL(${d.precision},${d.scale})")
    case _ => None // unknown → leave the cast Spark-side
  }

  /** One select item mirroring the FULL Projection.sourceConvert chain
    * (cast → trim → cap), or None when the column passes through. ALL-OR-
    * NOTHING per column: a chain that cannot be rendered completely (an
    * unmappable cast type, a binary cap — SUBSTR over binary isn't
    * portable) returns None and the whole conversion stays Spark-side.
    * Partial rendering would either reorder the chain (cast after
    * trim/cap) or double-apply non-idempotent steps (re-trimming a capped
    * value drops legitimate trailing whitespace the cap produced). */
  private[sources] def selectItem(
      c: graft.ColInfo, cfg: graft.WriteConfig, url: String): Option[String] =
    convertExpr(c, cfg, url) match {
      case Some(Some(expr)) =>
        Some(s"$expr AS ${JdbcDialects.get(url).quoteIdentifier(c.name)}")
      case _ => None // passthrough or unrenderable → no select-list rewrite
    }

  /** The conversion chain as a bare expression (no alias):
    * outer None = a needed step is unrenderable (conversion stays
    * Spark-side); Some(None) = passthrough (no conversion needed);
    * Some(Some(expr)) = the full rendered cast → trim → cap chain. */
  private[sources] def convertExpr(
      c: graft.ColInfo, cfg: graft.WriteConfig, url: String): Option[Option[String]] = {
    val dialect = JdbcDialects.get(url)
    val q = dialect.quoteIdentifier(c.name)
    val target = graft.scd2.Projection.targetType(c, cfg)
    val cast: Option[Option[String]] = // None=unrenderable, Some(None)=no cast needed
      if (graft.scd2.Projection.isXid(c, cfg))
        // the Postgres xmin path: xid has no direct numeric cast — go
        // through text like the reference (db_to_delta.py:73-77)
        Some(Some(s"CAST(CAST($q AS VARCHAR(32)) AS BIGINT)"))
      else if (target != c.dataType) target match {
        // a mapped STRING target has no safe remote type: VARCHAR(n)
        // would silently truncate (and many engines refuse CLOB math) —
        // leave those conversions to Spark
        case StringType => None
        case t => dialect.getJDBCType(t).map(_.databaseTypeDefinition)
          .orElse(ansiTypeName(t))
          .map(tn => Some(s"CAST($q AS $tn)"))
      }
      else Some(None)
    val needsCap = target == BinaryType && cfg.maxBinarySize.isDefined
    cast match {
      case None => None // cast needed but unrenderable → Spark-side
      case _ if needsCap => None // binary cap unportable → Spark-side
      case Some(castSql) =>
        val base = castSql.getOrElse(q)
        val trimmed =
          if (graft.scd2.Projection.needsTrim(c, cfg)) s"LTRIM(RTRIM($base))" else base
        val capped = (target, cfg.maxTextSize) match {
          case (StringType, Some(n)) => s"${substrFn(url)}($trimmed, 1, $n)"
          case _ => trimmed
        }
        if (capped == q) Some(None) else Some(Some(capped))
    }
  }

  /** One value as a portable SQL literal, or None for values with no
    * SAFE rendering — the caller falls back to the broadcast join, because
    * an under-fetching literal is silent data loss, not an optimization
    * miss. String rules per dialect: T-SQL gets `N'...'` (a plain varchar
    * literal code-page-substitutes characters outside the DB default
    * collation — the pushed predicate would then never match the row);
    * other dialects render only ASCII strings with no backslash (MySQL-
    * family escape processing and non-UTF8 server charsets both corrupt
    * past that, and we can't see server settings from here). Temporal
    * values use JDBC escape syntax ({ts}/{d}), which every driver the
    * reference targets expands dialect-correctly. */
  private[graft] def sqlLiteral(v: Any, url: String = ""): Option[String] = v match {
    case s: String =>
      val quoted = "'" + s.replace("'", "''") + "'"
      if (url.startsWith("jdbc:sqlserver")) Some("N" + quoted)
      else if (s.forall(c => c >= 0x20 && c < 0x7f && c != '\\')) Some(quoted)
      else None // non-ASCII / backslash on an unknown dialect → fallback
    case _: Byte | _: Short | _: Int | _: Long => Some(v.toString)
    case b: Boolean => Some(if (b) "TRUE" else "FALSE")
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case d: scala.math.BigDecimal => Some(d.bigDecimal.toPlainString)
    case f: Float => Some(f.toString)
    case d: Double => Some(d.toString)
    case t: java.sql.Timestamp => Some(s"{ts '${t.toString}'}")
    case d: java.sql.Date => Some(s"{d '${d.toString}'}")
    case i: java.time.Instant => sqlLiteral(java.sql.Timestamp.from(i), url)
    case d: java.time.LocalDate => sqlLiteral(java.sql.Date.valueOf(d), url)
    case t: java.time.LocalDateTime => sqlLiteral(java.sql.Timestamp.valueOf(t), url)
    case _ => None
  }

  /** The reference's generated-SQL length rule (db_to_delta.py:968-985:
    * "spark will not like this" past ~7000 chars — ODBC linked-server
    * literal limits). Chunks here are packed greedily under the cap
    * instead of recursively halved; same contract, fewer round trips. */
  private[graft] val MaxSqlLen = 7000

  /** Chunked pk-restriction SELECTs over the target (reference
    * db_to_delta.py:907-992, the OPENJSON literal-set join re-expressed as
    * plain IN-lists / OR-of-conjuncts — no JSON shredding support needed
    * from the source). Single non-null pk → `pk IN (…)`; composite or
    * null-bearing → `(pk1 = v1 AND pk2 IS NULL) OR …`. Each emitted SQL
    * stays under [[MaxSqlLen]]; a predicate that alone exceeds the cap
    * still ships as its own chunk (length guard, not correctness guard).
    * Per-column lhs expressions are passed in pre-rendered (the P1
    * conversion chain, or the bare quoted name when the source already
    * converted). None when any tuple value has no portable literal. */
  private[graft] def pkFilterSqls(
      lhs: Seq[String],
      tuples: Seq[Seq[Any]],
      tableOrQuery: Either[String, String],
      url: String = ""): Option[Seq[String]] = {
    require(tuples.nonEmpty, "pkFilterSqls needs at least one pk tuple")
    val from = tableOrQuery match {
      case Left(table) => table
      case Right(query) => s"($query) graft_pkf"
    }
    val prefix = s"SELECT * FROM $from WHERE "
    // Option-traverse: one unrenderable value poisons the whole pushdown
    // (a PARTIAL filter would under-fetch; the fallback over-fetches safely)
    def traverse[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
      val out = Seq.newBuilder[B]
      val it = xs.iterator
      while (it.hasNext) f(it.next()) match {
        case Some(b) => out += b
        case None => return None
      }
      Some(out.result())
    }
    def packed(items: Seq[String], overhead: Int, mk: Seq[String] => String): Seq[String] = {
      val base = prefix.length + overhead
      val chunks = Seq.newBuilder[String]
      var cur = List.empty[String]
      var curLen = base
      items.foreach { item =>
        val addLen = item.length + (if (cur.isEmpty) 0 else 4) // " OR " / ", "
        if (cur.nonEmpty && curLen + addLen > MaxSqlLen) {
          chunks += mk(cur.reverse); cur = Nil; curLen = base
        }
        cur ::= item; curLen += addLen
      }
      if (cur.nonEmpty) chunks += mk(cur.reverse)
      chunks.result()
    }
    if (lhs.size == 1 && tuples.forall(t => t.head != null))
      traverse(tuples)(t => sqlLiteral(t.head, url)).map { lits =>
        packed(lits, lhs.head.length + 6, // "<lhs> IN ()"
          ls => s"$prefix${lhs.head} IN (${ls.mkString(", ")})")
      }
    else
      traverse(tuples) { t =>
        traverse(lhs.zip(t)) { case (l, v) =>
          if (v == null) Some(s"$l IS NULL") else sqlLiteral(v, url).map(lit => s"$l = $lit")
        }.map(conjs => s"(${conjs.mkString(" AND ")})")
      }.map(preds => packed(preds, 0, ps => prefix + ps.mkString(" OR ")))
  }

  /** Full generated SELECT over the original target plus the set of
    * (lower-cased) column names converted ENTIRELY source-side, or None
    * when every column passes through (no point wrapping). */
  def projectedSql(
      cols: Seq[graft.ColInfo], cfg: graft.WriteConfig, url: String,
      tableOrQuery: Either[String, String]): Option[(String, Set[String])] = {
    if (!cfg.sourceSideProjection) return None
    val dialect = JdbcDialects.get(url)
    val rendered = cols.map(c => selectItem(c, cfg, url) -> c)
    if (rendered.forall(_._1.isEmpty)) None
    else {
      val items = rendered.map { case (item, c) =>
        item.getOrElse(dialect.quoteIdentifier(c.name)) }
      // EXACT names, not lower-cased: two source columns differing only in
      // case must not collide (a collision would mark one as fully
      // converted source-side when only the other rendered, silently
      // skipping its Spark-side trim/cap)
      val handled = rendered.collect { case (Some(_), c) => c.name }.toSet
      val from = tableOrQuery match {
        case Left(table) => table
        case Right(query) => s"($query) graft_src"
      }
      Some((s"SELECT ${items.mkString(", ")} FROM $from", handled))
    }
  }
}
