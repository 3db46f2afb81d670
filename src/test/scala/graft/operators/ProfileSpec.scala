package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Profile.columns]] — the one-pass ANALYZE census: exact counts,
  * portable string min/max, and type contracts. */
class ProfileSpec extends SparkSuite {
  import spark.implicits._

  private def df = Seq(
    (1L, Option("a"), Option(true)),
    (2L, Option("b"), Option(false)),
    (2L, None, Option(true)),
    (3L, Option("a"), None)
  ).toDF("k", "s", "f")

  test("rows, nulls, exact distincts, min/max are exact per column") {
    val got = Profile.columns(df, Seq("k", "s", "f"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(got("k") == (4L, 0L, 3L, "1", "3"))
    assert(got("s") == (4L, 1L, 2L, "a", "b"))
    assert(got("f") == (4L, 1L, 2L, "false", "true"))
  }

  test("contracts refuse: float columns, missing columns, duplicates") {
    val withFloat = df.withColumn("x", lit(1.5))
    intercept[IllegalArgumentException] {
      Profile.columns(withFloat, Seq("k", "x"))
    }
    intercept[IllegalArgumentException] {
      Profile.columns(df, Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      Profile.columns(df, Seq("k", "k"))
    }
    intercept[IllegalArgumentException] {
      Profile.columns(df, Seq.empty)
    }
  }

  test("validate: each rule kind counts exactly; nulls only violate not_null") {
    val d = Seq(
      (Option(5L), Option("A")),
      (Option(-2L), Option("Z")),
      (Option(200L), None),
      (None, Option("B"))
    ).toDF("k", "s")
    val got = Profile.validate(d, Seq(
        Profile.Rule("k", "not_null"),
        Profile.Rule("k", "min", "0"),
        Profile.Rule("k", "max", "100"),
        Profile.Rule("s", "in_set", "A,B"),
        Profile.Rule("s", "matches", "^[A-C]$")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), Option(r.getString(4)))).toMap
    assert(got(("k", "not_null")) == (1L, None))
    assert(got(("k", "min")) == (1L, Some("-2")))
    assert(got(("k", "max")) == (1L, Some("200")))
    // the null s row passes in_set and matches (three-valued convention)
    assert(got(("s", "in_set")) == (1L, Some("Z")))
    assert(got(("s", "matches")) == (1L, Some("Z")))
    intercept[IllegalArgumentException] {
      Profile.validate(d, Seq(Profile.Rule("k", "between", "1")))
    }
    intercept[IllegalArgumentException] {
      Profile.validate(d, Seq(Profile.Rule("k", "min", "ten")))
    }
    intercept[IllegalArgumentException] {
      Profile.validate(d, Seq(Profile.Rule("ghost", "not_null")))
    }
  }

  test("an all-null column reports null min/max and zero distincts") {
    val d2 = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "s")
    val r = Profile.columns(d2, Seq("s")).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }
}
