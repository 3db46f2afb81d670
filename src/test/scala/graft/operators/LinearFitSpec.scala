package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Exact distributed OLS (integer normal equations + BigInt Cramer):
  * exact recovery on exactly-linear data, determinism, null handling,
  * singularity guard. */
class LinearFitSpec extends SparkSuite {
  import spark.implicits._

  private def fit(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    TextCorpus.fitLinearModelX1000(df,
      Seq("a" -> col("a"), "b" -> col("b")), col("y"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("recovers an exactly linear relationship exactly") {
    // y = 7 + 3a - 2b on a non-degenerate design
    val rows = for { a <- 0L to 5L; b <- 0L to 4L }
      yield (a, b, 7L + 3L * a - 2L * b)
    val w = fit(rows.toDF("a", "b", "y"))
    assert(w === Map("intercept" -> 7000L, "a" -> 3000L, "b" -> -2000L))
  }

  test("truncates fixed-point weights toward zero (DuckDB // semantics)") {
    // points (a, y): (0,-1), (3,1), (7,2). Exact Cramer: A=[[3,10],[10,58]]
    // det=74; det_icpt = 2*58-10*17 = -54; det_a = 3*17-10*2 = 31.
    // icpt = -54000/74 = -729.72.. -> truncation toward zero -729 (floor
    // would give -730 — the asserted difference); a = 31000/74 = 418.9 -> 418
    val df = Seq((0L, -1L), (3L, 1L), (7L, 2L)).toDF("a", "y")
    val w = TextCorpus.fitLinearModelX1000(df, Seq("a" -> col("a")), col("y"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w("a") === 418L)
    assert(w("intercept") === -729L)
  }

  test("rows with null features or label are excluded") {
    val base = (for { a <- 0L to 5L; b <- 0L to 4L }
      yield (a, b, 7L + 3L * a - 2L * b)).toDF("a", "b", "y")
    val withNulls = base.unionByName(
      Seq((null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(1L),
        java.lang.Long.valueOf(999L))).toDF("a", "b", "y"))
    val w = fit(withNulls)
    assert(w === Map("intercept" -> 7000L, "a" -> 3000L, "b" -> -2000L))
  }

  test("singular design (collinear features) raises") {
    val df = Seq((1L, 2L, 3L), (2L, 4L, 5L), (3L, 6L, 9L)).toDF("a", "b", "y")
    intercept[IllegalArgumentException] {
      fit(df)
    }
  }
}
