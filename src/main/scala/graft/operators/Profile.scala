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
}
