package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling census — the ANALYZE-style per-column statistics a
  * pipeline engine emits before/after every big load: row count, null
  * count, exact distinct count, min/max. One aggregation pass; results
  * land as one ROW per column so downstream checks (drift alerts,
  * schema-contract gates) can join on the column name. */
object Profile {

  /** Profile the named columns in ONE pass over `df`: returns
    * (col_name, n_rows, n_nulls, n_distinct, min_value, max_value) —
    * min/max rendered as strings so heterogeneous column types share one
    * report schema. Columns must be integral, string, date, or boolean
    * (types whose string rendering is engine-portable; a float's
    * shortest-roundtrip formatting is not, and floats should be profiled
    * via their exact integer encodings anyway — the house rule).
    *
    * Shape at scale: Spark plans the multi-column exact distincts as ONE
    * Expand (a |cols|-way map-side fan-out) + combinable partials — the
    * standard profiling trade: |cols|× mapper rows, zero extra passes,
    * nothing but the |cols|-row report at the driver. For billion-key
    * columns where exactness is not required, profile with
    * [[Sketches.kmvState]]/[[Sketches.hllSketch]] instead. */
  def columns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    require(cols.distinct.size == cols.size,
      s"columns must be distinct, got ${cols.mkString(", ")}")
    cols.foreach { c =>
      require(df.columns.contains(c), s"no such column '$c'")
      import org.apache.spark.sql.types._
      val dt = df.schema(c).dataType
      val ok = dt match {
        case StringType | DateType | BooleanType |
          ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(ok, s"column '$c' has type $dt — profile integral/string/" +
        "date/boolean columns (floats are not string-portable; encode " +
        "them as exact integers first)")
    }
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c"))) :+ count(lit(1)).as("__n")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"),
        col(s"__mx_$c").as("max_value"))): _*)).as("r"))
      .select(col("r.col_name").as("col_name"), col("r.n_rows").as("n_rows"),
        col("r.n_nulls").as("n_nulls"), col("r.n_distinct").as("n_distinct"),
        col("r.min_value").as("min_value"), col("r.max_value").as("max_value"))
  }

  /** A data-contract rule over one column. `kind` ∈ not_null / min / max
    * / in_set / matches; `param` is the bound, the comma-joined set, or
    * the (Java ∩ RE2, so oracle-portable) regex. */
  final case class Rule(column: String, kind: String, param: String = "")

  /** Validate data-contract rules in ONE pass: returns a row per rule —
    * (col_name, rule, param, n_violations, sample_violation) — where
    * `sample_violation` is the MINIMUM violating value rendered as a
    * string (deterministic, so the report itself is oracle-checkable;
    * null when the rule holds). NULLs violate only `not_null` — a null
    * passes min/max/in_set/matches, the SQL three-valued convention, so
    * rules compose instead of double-counting.
    *
    * Shape at scale: every rule compiles to a conditional aggregate over
    * the same scan — one combinable pass, |rules| output rows, nothing
    * else at the driver. The violating-rows themselves stay distributed;
    * use the returned counts to decide whether to quarantine the load
    * (the SCD2 sink's refuse-or-land decision). */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    rules.foreach { r =>
      require(df.columns.contains(r.column), s"no such column '${r.column}'")
      require(Set("not_null", "min", "max", "in_set", "matches")(r.kind),
        s"unknown rule kind '${r.kind}'")
      if (r.kind == "min" || r.kind == "max")
        require(r.param.matches("-?\\d{1,18}"),
          s"${r.kind} needs an integer bound, got '${r.param}'")
      if (r.kind == "in_set" || r.kind == "matches")
        require(r.param.nonEmpty, s"${r.kind} needs a non-empty param")
    }
    val viol: Rule => org.apache.spark.sql.Column = r => {
      val c = col(r.column)
      r.kind match {
        case "not_null" => c.isNull
        case "min" => c.isNotNull && c < lit(r.param.toLong)
        case "max" => c.isNotNull && c > lit(r.param.toLong)
        case "in_set" =>
          c.isNotNull && !c.cast("string").isin(r.param.split(","): _*)
        case "matches" => c.isNotNull && !c.cast("string").rlike(r.param)
      }
    }
    val aggs = rules.zipWithIndex.flatMap { case (r, i) =>
      Seq(sum(when(viol(r), 1L).otherwise(0L)).as(s"__v$i"),
        min(when(viol(r), col(r.column).cast("string"))).as(s"__s$i"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case (r, i) => struct(
        lit(r.column).as("col_name"), lit(r.kind).as("rule"),
        lit(r.param).as("param"), col(s"__v$i").as("n_violations"),
        col(s"__s$i").as("sample_violation")) }: _*)).as("r"))
      .select(col("r.col_name").as("col_name"), col("r.rule").as("rule"),
        col("r.param").as("param"), col("r.n_violations").as("n_violations"),
        col("r.sample_violation").as("sample_violation"))
  }
}
