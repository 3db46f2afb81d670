package graft.store

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-data-dir column statistics for manifest-level data skipping.
  *
  * The reference gets file skipping from Delta's per-`add` stats (delta-rs
  * writes min/max/nullCount into the transaction log; Spark-Delta prunes
  * files from them before listing). graft's manifest lists DIRECTORIES, not
  * files — the right granularity at 100 TB (a year of hourly syncs is ~9k
  * dirs, driver-trivial, while per-file entries would be millions) — so the
  * same idea lands here as per-dir stats: each commit records min / max /
  * nullCount per leading column, collected by an `Observation` riding the
  * write itself (zero extra pass), and [[VersionedTable.readWhere]] drops
  * whole dirs whose stats refute the predicate before Spark ever lists
  * them. Row-group-level pruning inside surviving dirs stays with Spark's
  * parquet source (footer min/max + pushed filters); this layer only
  * decides which dirs are worth listing at all.
  *
  * Values are normalized to five comparable domains — Long (integrals,
  * date→epochDay, timestamp→epochMicros), Double, BigDecimal, String,
  * Boolean — both when persisting write-side metrics and when evaluating a
  * predicate's Catalyst literals, so comparison is a single total order per
  * domain with no Catalyst internals at read time. String stats longer than
  * [[DirStats.MaxStringStat]] chars are dropped (a 20 kB document body as a
  * manifest min/max would bloat every manifest; Delta truncates at 32 for
  * the same reason — dropping is simpler and still sound: a missing stat
  * just means "cannot prune on this column").
  */
object DirStats {

  /** Stats indexed at most this many leading eligible columns (Delta's
    * `dataSkippingNumIndexedCols` default). */
  val MaxIndexedCols = 32

  /** String min/max longer than this are not persisted. */
  val MaxStringStat = 256

  /** min/max live in the normalized domain; None = no non-null value seen
    * (or stat dropped as oversized). */
  final case class ColStat(min: Option[Any], max: Option[Any], nullCount: Long)

  /** `bytes` is the dir's total parquet size (0 = unknown, pre-upgrade
    * manifest) — it feeds the FileIndex sizeInBytes planner estimate. */
  final case class Stats(rows: Long, cols: Map[String, ColStat], bytes: Long = 0L)

  // ------------------------------------------------------------- collection

  def eligibleFields(schema: StructType): Seq[StructField] =
    schema.fields.iterator.filter(f => isEligible(f.dataType)).take(MaxIndexedCols).toSeq

  private def isEligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         StringType | BooleanType | DateType | TimestampType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Aggregates to ride an [[org.apache.spark.sql.Observation]] on the dir
    * write: one row count plus min/max/non-null count per eligible column —
    * map-side only, no shuffle, no second scan. */
  def aggColumns(fields: Seq[StructField]): Seq[Column] =
    count(lit(1L)).as("__rows") +: fields.flatMap { f =>
      Seq(min(col(f.name)).as(s"min:${f.name}"),
        max(col(f.name)).as(s"max:${f.name}"),
        count(col(f.name)).as(s"cnt:${f.name}"))
    }

  /** Build stats from observed metric values (external row values). */
  def fromMetrics(metrics: Map[String, Any], fields: Seq[StructField]): Stats = {
    val rows = metrics.get("__rows").collect { case n: Number => n.longValue() }.getOrElse(0L)
    val cols = fields.flatMap { f =>
      val nonNull = metrics.get(s"cnt:${f.name}")
        .collect { case n: Number => n.longValue() }.getOrElse(0L)
      val mn = Option(metrics.getOrElse(s"min:${f.name}", null)).flatMap(normalizeExternal(_, f.dataType))
      val mx = Option(metrics.getOrElse(s"max:${f.name}", null)).flatMap(normalizeExternal(_, f.dataType))
      // an oversized string min/max poisons the pair (a present min with a
      // dropped max could wrongly prune range predicates) — keep both or none
      val (mnK, mxK) = if (mn.isDefined && mx.isDefined) (mn, mx) else (None, None)
      Some(f.name -> ColStat(mnK, mxK, rows - nonNull))
    }.toMap
    Stats(rows, cols)
  }

  /** External (Row-side) value → normalized domain. None = not representable
    * (oversized string, unexpected runtime class). */
  private def normalizeExternal(v: Any, dt: DataType): Option[Any] = (v, dt) match {
    case (n: Number, ByteType | ShortType | IntegerType | LongType) => Some(n.longValue())
    case (n: Number, FloatType | DoubleType) => Some(n.doubleValue())
    case (d: java.math.BigDecimal, _: DecimalType) => Some(BigDecimal(d))
    case (d: scala.math.BigDecimal, _: DecimalType) => Some(d)
    case (s: String, StringType) => if (s.length <= MaxStringStat) Some(s) else None
    case (b: java.lang.Boolean, BooleanType) => Some(b.booleanValue())
    case (d: java.sql.Date, DateType) => Some(d.toLocalDate.toEpochDay)
    case (d: java.time.LocalDate, DateType) => Some(d.toEpochDay)
    case (t: java.sql.Timestamp, TimestampType) =>
      // floorDiv: truncation toward zero would shift pre-1970 timestamps
      // one second late and make pruning unsound
      Some(Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
    case (t: java.time.Instant, TimestampType) =>
      Some(t.getEpochSecond * 1000000L + t.getNano / 1000L)
    case _ => None
  }

  /** Catalyst literal (internal representation) → normalized domain. */
  private def normalizeLiteral(v: Any, dt: DataType): Option[Any] = (v, dt) match {
    case (null, _) => None
    case (n: Byte, ByteType) => Some(n.toLong)
    case (n: Short, ShortType) => Some(n.toLong)
    case (n: Int, IntegerType) => Some(n.toLong)
    case (n: Long, LongType) => Some(n)
    case (n: Float, FloatType) => Some(n.toDouble)
    case (n: Double, DoubleType) => Some(n)
    case (d: Decimal, _: DecimalType) => Some(BigDecimal(d.toJavaBigDecimal))
    case (s, StringType) => Some(s.toString) // UTF8String
    case (b: Boolean, BooleanType) => Some(b)
    case (n: Int, DateType) => Some(n.toLong) // days since epoch
    case (n: Long, TimestampType) => Some(n) // micros since epoch
    case _ => None
  }

  /** Total order within one normalized domain (plus exact Long↔Double for
    * the safe-cast-unwrap path); None across incomparable domains. */
  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
    case (x: Long, y: Double) =>
      if (y.isNaN) Some(-1) // Spark orders NaN greatest
      else if (y.isInfinite) Some(if (y > 0) -1 else 1)
      else Some(BigDecimal(x).compare(BigDecimal(y)))
    case (x: Double, y: Long) => cmp(y, x).map(-_)
    case (x: BigDecimal, y: BigDecimal) => Some(x.compare(y))
    // Spark computes string min/max in UTF8_BINARY (code-point) order, which
    // diverges from Java String.compareTo (UTF-16 code-unit order) whenever
    // supplementary-plane chars (U+10000+, surrogate pairs) meet BMP chars in
    // [U+E000, U+FFFF]. Compare exactly as Spark does or pruning drops rows.
    case (x: String, y: String) =>
      Some(org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  // ---------------------------------------------------------------- pruning

  /** One prunable conjunct: column name (lowercased), operator, normalized
    * literal(s). Unsupported shapes simply never prune. */
  sealed trait Conjunct
  private case class Cmp(colLower: String, op: String, v: Any) extends Conjunct
  private case class InVals(colLower: String, vs: Seq[Any]) extends Conjunct
  private case class NullCheck(colLower: String, isNull: Boolean) extends Conjunct

  /** Extract the prunable conjuncts of a predicate Column by ANALYZING it
    * against the table schema (Spark 4's Column is a lazy ColumnNode tree,
    * not catalyst — running the analyzer both materializes catalyst nodes
    * and resolves types, inserting the same casts the real scan will see).
    * Anything not recognized contributes nothing (sound: less pruning,
    * never wrong). */
  def conjunctsOf(
      spark: org.apache.spark.sql.SparkSession,
      schema: StructType, cond: Column): Seq[Conjunct] = {
    val analyzed = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .filter(cond).queryExecution.analyzed
    val condition = analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }
    condition.map(conjunctsOfExpr).getOrElse(Nil)
  }

  def conjunctsOfExpr(root: Expression): Seq[Conjunct] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    // Unwrap casts on the COLUMN side only when order-preserving within the
    // same (or exactly-comparable) normalized domain. date→timestamp or
    // anything→string changes scale/order and must NOT see stats.
    def attr(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name.toLowerCase)
      case a: AttributeReference => Some(a.name.toLowerCase)
      case c: Cast if castSafe(c.child.dataType, c.dataType) => attr(c.child)
      case _ => None
    }
    // A literal, or any foldable expression (e.g. Cast(Literal)) evaluated
    // driver-side. A null constant yields None (no sound pruning shape).
    def litOf(e: Expression): Option[(Any, DataType)] = e match {
      case Literal(v, dt) => Option(v).map((_, dt))
      case _ if e.foldable && e.deterministic =>
        Option(e.eval(org.apache.spark.sql.catalyst.InternalRow.empty)).map((_, e.dataType))
      case _ => None
    }
    def cmpOf(a: Expression, l: Expression, op: String, flip: String): Option[Conjunct] =
      (attr(a), litOf(l)) match {
        case (Some(c), Some((v, dt))) => normalizeLiteral(v, dt).map(Cmp(c, op, _))
        case _ => (attr(l), litOf(a)) match {
          case (Some(c), Some((v, dt))) => normalizeLiteral(v, dt).map(Cmp(c, flip, _))
          case _ => None
        }
      }
    split(root).flatMap {
      case EqualTo(a, b) => cmpOf(a, b, "=", "=")
      case GreaterThan(a, b) => cmpOf(a, b, ">", "<")
      case GreaterThanOrEqual(a, b) => cmpOf(a, b, ">=", "<=")
      case LessThan(a, b) => cmpOf(a, b, "<", ">")
      case LessThanOrEqual(a, b) => cmpOf(a, b, "<=", ">=")
      case In(a, list) if attr(a).isDefined =>
        val vs = list.map(l => litOf(l).flatMap { case (v, dt) => normalizeLiteral(v, dt) })
        if (vs.nonEmpty && vs.forall(_.isDefined)) Some(InVals(attr(a).get, vs.flatten)) else None
      case InSet(a, hset) if attr(a).isDefined => // optimizer form of large IN
        val dt = a.dataType
        val vs = hset.toSeq.map(v => normalizeLiteral(v, dt))
        if (vs.nonEmpty && vs.forall(_.isDefined)) Some(InVals(attr(a).get, vs.flatten)) else None
      case IsNull(a) if attr(a).isDefined => Some(NullCheck(attr(a).get, isNull = true))
      case IsNotNull(a) if attr(a).isDefined => Some(NullCheck(attr(a).get, isNull = false))
      // bare boolean column / its negation (`filter(col("__is_full_load"))`)
      case a if a.dataType == BooleanType && attr(a).isDefined =>
        Some(Cmp(attr(a).get, "=", true))
      case Not(a) if a.dataType == BooleanType && attr(a).isDefined =>
        Some(Cmp(attr(a).get, "=", false))
      case _ => None
    }
  }

  /** Cast shapes on the column side that preserve order AND keep the stored
    * stat comparable with the cast-side literal. Only EXACT (injective)
    * widenings qualify: a lossy cast (long→double past 2^53, int→float past
    * 2^24, decimal scale reduction) rounds column values onto the literal so
    * the exact raw-stat-vs-literal compare would wrongly refute a match. */
  private def castSafe(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    // float's 24-bit mantissa holds byte/short exactly; double's 53-bit
    // mantissa holds up to int exactly; long fits in NEITHER
    case (ByteType | ShortType, FloatType | DoubleType) => true
    case (IntegerType, DoubleType) => true
    case (FloatType, DoubleType) => true
    // scale must not shrink (rounding) and integral digits must not shrink
    // (overflow) — together the cast is the identity on the value
    case (a: DecimalType, b: DecimalType) =>
      b.scale >= a.scale && b.precision - b.scale >= a.precision - a.scale
    case _ => false
  }

  /** Can a dir with these stats contain a row satisfying ALL conjuncts?
    * Missing stats (old manifest, unindexed column, dropped oversized
    * string) always answer yes. */
  def maybeMatches(stats: Option[Stats], conjuncts: Seq[Conjunct]): Boolean =
    stats match {
      case None => true
      case Some(st) =>
        val byLower = st.cols.map { case (k, v) => k.toLowerCase -> v }
        conjuncts.forall {
          case Cmp(c, op, v) => byLower.get(c).forall(cs => cmpMaybe(cs, st.rows, op, v))
          case InVals(c, vs) => byLower.get(c).forall(cs => vs.exists(cmpMaybe(cs, st.rows, "=", _)))
          case NullCheck(c, wantNull) => byLower.get(c).forall { cs =>
            if (wantNull) cs.nullCount > 0 else cs.nullCount < st.rows
          }
        }
    }

  private def cmpMaybe(cs: ColStat, rows: Long, op: String, v: Any): Boolean =
    (cs.min, cs.max) match {
      case (Some(mn), Some(mx)) =>
        (cmp(mn, v), cmp(mx, v)) match {
          case (Some(lo), Some(hi)) => op match {
            case "=" => lo <= 0 && hi >= 0
            case ">" => hi > 0
            case ">=" => hi >= 0
            case "<" => lo < 0
            case "<=" => lo <= 0
            case _ => true
          }
          case _ => true // cross-domain (e.g. literal double vs long col): keep
        }
      case _ =>
        // no recorded min/max: if the column is ALL null in this dir
        // (nullCount == rows) no comparison can hold → prune; otherwise the
        // stat was dropped as unrepresentable (oversized string) → keep
        !(rows > 0 && cs.nullCount == rows)
    }

  // ------------------------------------------------------------------- JSON

  /** Serialize into the manifest dir object. */
  def write(node: ObjectNode, stats: Stats): Unit = {
    val sn = node.putObject("stats")
    sn.put("rows", stats.rows)
    if (stats.bytes > 0) sn.put("bytes", stats.bytes)
    val cn = sn.putObject("cols")
    stats.cols.foreach { case (name, cs) =>
      val o = cn.putObject(name)
      cs.min.foreach(v => putVal(o, "min", v))
      cs.max.foreach(v => putVal(o, "max", v))
      o.put("nulls", cs.nullCount)
    }
  }

  private def putVal(o: ObjectNode, k: String, v: Any): Unit = v match {
    case x: Long => o.put(k, x)
    case x: Double =>
      if (java.lang.Double.isFinite(x)) o.put(k, x) else o.put(k, x.toString)
    case x: BigDecimal => o.put(k, x.underlying().toPlainString)
    case x: String => o.put(k, x)
    case x: Boolean => o.put(k, x)
    case _ => ()
  }

  /** Parse from the manifest dir object, typed by the dir's schema. */
  def read(node: JsonNode, schema: StructType): Option[Stats] =
    Option(node.get("stats")).map { sn =>
      val types = schema.fields.map(f => f.name -> f.dataType).toMap
      val cols = Option(sn.get("cols")).map { cn =>
        val it = cn.fields()
        val b = Map.newBuilder[String, ColStat]
        while (it.hasNext) {
          val e = it.next()
          val dt = types.getOrElse(e.getKey, NullType)
          val o = e.getValue
          b += e.getKey -> ColStat(
            Option(o.get("min")).map(readVal(_, dt)),
            Option(o.get("max")).map(readVal(_, dt)),
            Option(o.get("nulls")).map(_.asLong()).getOrElse(0L))
        }
        b.result()
      }.getOrElse(Map.empty[String, ColStat])
      Stats(Option(sn.get("rows")).map(_.asLong()).getOrElse(0L), cols,
        Option(sn.get("bytes")).map(_.asLong()).getOrElse(0L))
    }

  private def readVal(n: JsonNode, dt: DataType): Any = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType | TimestampType => n.asLong()
    case FloatType | DoubleType =>
      if (n.isTextual) java.lang.Double.parseDouble(n.asText()) else n.asDouble()
    case _: DecimalType => BigDecimal(n.asText())
    case StringType => n.asText()
    case BooleanType => n.asBoolean()
    case _ => n.asText()
  }
}
