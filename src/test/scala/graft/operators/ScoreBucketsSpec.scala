package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** CCNet-style per-group score bucketing: integer threshold rule
  * (cum·k ≥ j·total), ties share a bucket, no per-group window. */
class ScoreBucketsSpec extends SparkSuite {
  import spark.implicits._

  private def scored = ((0L until 90L).map(i => (i, "en", (i % 30) * 10)) ++
    (100L until 130L).map(i => (i, "de", i % 5))).toDF("id", "lang", "score")

  /** Driver-side replay of the documented contract. */
  private def replay(rows: Seq[(Long, String, Long)], k: Int): Map[Long, Long] = {
    rows.groupBy(_._2).flatMap { case (_, grp) =>
      val hist = grp.groupBy(_._3).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val total = hist.map(_._2).sum
      var cum = 0L
      val cumBy = hist.map { case (s, c) => cum += c; (s, cum) }
      val cuts = (1 until k).map(j =>
        cumBy.find { case (_, cm) => cm * k >= j * total }.get._1)
      grp.map { case (id, _, s) => id -> (1L + cuts.count(s > _)) }
    }
  }

  test("buckets equal the driver replay of the integer threshold rule") {
    val rows = scored.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val got = TextCorpus.scoreBuckets(scored, "score", "lang")
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(got == replay(rows, 3))
    // every group uses all 3 buckets on this spread-out distribution
    assert(got.filterKeys(_ < 90L).values.toSet == Set(1L, 2L, 3L))
  }

  test("assignment is partition-invariant and k is honored") {
    val a = TextCorpus.scoreBuckets(scored.repartition(1), "score", "lang", k = 4)
    val b = TextCorpus.scoreBuckets(scored.repartition(11), "score", "lang", k = 4)
    assert(rowsOf(a.orderBy("id")) == rowsOf(b.orderBy("id")))
    assert(a.select(max("bucket")).head().getLong(0) <= 4L)
  }

  test("ties share a bucket; a constant group lands entirely in bucket 1") {
    val const = (0L until 50L).map(i => (i, "xx", 7L)).toDF("id", "lang", "score")
    val got = TextCorpus.scoreBuckets(const, "score", "lang")
    assert(got.select("bucket").distinct().as[Long].collect().toSeq == Seq(1L))
    // a two-value 50/50 split: the low score is all of bucket 1 (its cum
    // crosses the 1/3 cut), the high score everything above
    val twoVal = ((0L until 50L).map(i => (i, "yy", 1L)) ++
      (50L until 100L).map(i => (i, "yy", 2L))).toDF("id", "lang", "score")
    val buckets = TextCorpus.scoreBuckets(twoVal, "score", "lang")
      .groupBy("score", "bucket").count()
      .as[(Long, Long, Long)].collect().toSet
    assert(buckets == Set((1L, 1L, 50L), (2L, 2L, 50L)))
  }

  test("over-cap histogram refuses loudly") {
    val wide = (0L until 100L).map(i => (i, "en", i)).toDF("id", "lang", "score")
    val e = intercept[IllegalStateException](
      TextCorpus.scoreBuckets(wide, "score", "lang", maxHistRows = 10))
    assert(e.getMessage.contains("refusing a truncated histogram"))
  }

  test("NULL group/score rows pass through with bucket NULL, others unaffected") {
    val withNulls = (Seq((0L, Some("en"), Some(1L)), (1L, Some("en"), Some(2L)),
      (2L, Some("en"), Some(3L)), (3L, None, Some(5L)), (4L, Some("en"), None),
      (5L, None, None)))
      .toDF("id", "lang", "score")
    val got = TextCorpus.scoreBuckets(withNulls, "score", "lang")
      .select("id", "bucket").as[(Long, Option[Long])].collect().toMap
    // rows 0-2: a clean 1/2/3 split over the en distribution
    assert(got(0L).contains(1L) && got(1L).contains(2L) && got(2L).contains(3L))
    // null group, null score, both-null: row survives, bucket NULL
    assert(got(3L).isEmpty && got(4L).isEmpty && got(5L).isEmpty)
    assert(got.size == 6, "every input row must survive the left join")
  }

  test("non-string group columns (int domain ids) bucket correctly") {
    val intGroups = ((0L until 30L).map(i => (i, 7, i % 10)) ++
      (30L until 60L).map(i => (i, 8, i % 3))).toDF("id", "domain", "score")
    val rows = intGroups.collect()
      .map(r => (r.getLong(0), r.getInt(1).toString, r.getLong(2))).toSeq
    val got = TextCorpus.scoreBuckets(intGroups, "score", "domain")
      .select("id", "bucket").as[(Long, Long)].collect().toMap
    assert(got == replay(rows, 3))
  }

  test("the assignment plan broadcasts the cuts (no shuffle of the corpus)") {
    val dir = tmpDir("buckets-plan")
    scored.write.mode("overwrite").parquet(dir)
    val out = TextCorpus.scoreBuckets(spark.read.parquet(dir), "score", "lang")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"cuts must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
      s"no shuffle-bearing join, no window:\n$plan")
  }
}
