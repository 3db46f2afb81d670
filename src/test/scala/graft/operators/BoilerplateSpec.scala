package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Frequent-segment (boilerplate) removal: the CCNet/RefinedWeb-style
  * frequent-line filter with fixed word-groups standing in for lines.
  * Covers the planted-boilerplate contract, partition invariance of the
  * two-pass census, the loud cap refusal, identity on an empty filter
  * list, and randomized equivalence of the whole pipeline against a
  * driver-side single-pass reference. */
class BoilerplateSpec extends SparkSuite {
  import spark.implicits._

  private val B = "click here now" // the planted 3-word boilerplate segment

  /** Segment-aligned corpus: every doc is a list of 3-word segments. */
  private def plantedDocs = {
    val rows =
      (0 until 20).map { i =>
        (i.toLong, s"u${i}a u${i}b u${i}c $B v${i}a v${i}b v${i}c")
      } ++ Seq(
        (100L, s"$B $B"),                        // pure boilerplate
        (101L, s"w1 w2 w3 $B tail1 tail2"),      // short last segment survives
        (102L, s"x1 x2 x3 $B y1 y2 y3 $B"))      // within-doc repeat: both go
    rows.toDF("id", "text")
  }

  test("planted boilerplate removed everywhere; unique content and order survive") {
    val df = plantedDocs
    val bp = TextCorpus.boilerplateSegments(df, "id", "text", segWords = 3, minDocs = 5)
    assert(bp.toSeq == Seq(B), s"expected only the planted segment, got ${bp.toSeq}")
    val out = TextCorpus.removeBoilerplate(df, "id", "text", bp.toSeq, segWords = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == (("u0a u0b u0c v0a v0b v0c", 3L, 1L)))
    // pure-boilerplate doc keeps its row, empty text
    assert(out(100L) == (("", 2L, 2L)))
    // the 2-word tail segment is its own unit and survives
    assert(out(101L) == (("w1 w2 w3 tail1 tail2", 3L, 1L)))
    // both within-doc occurrences removed, survivors keep order
    assert(out(102L) == (("x1 x2 x3 y1 y2 y3", 4L, 2L)))
    assert(out.size == 23)
  }

  test("census is partition-invariant and the apply is plan-independent") {
    val df = plantedDocs
    val a = TextCorpus.boilerplateSegments(df.repartition(1), "id", "text", 3, 5)
    val b = TextCorpus.boilerplateSegments(df.repartition(7), "id", "text", 3, 5)
    assert(a.toSeq == b.toSeq)
    val outA = TextCorpus.removeBoilerplate(df.repartition(1), "id", "text", a.toSeq, 3)
    val outB = TextCorpus.removeBoilerplate(df.repartition(7), "id", "text", b.toSeq, 3)
    assert(rowsOf(outA.orderBy("id")) == rowsOf(outB.orderBy("id")))
  }

  test("exceeding maxBoilerplate refuses loudly instead of truncating") {
    // two distinct segments each in 6 docs -> 2 boilerplate entries, cap 1
    val df = ((0 until 6).map(i => (i.toLong, "p q r")) ++
      (10 until 16).map(i => (i.toLong, "s t u"))).toDF("id", "text")
    val e = intercept[IllegalStateException] {
      TextCorpus.boilerplateSegments(df, "id", "text", 3, 5, maxBoilerplate = 1)
    }
    assert(e.getMessage.contains("refusing to truncate"))
  }

  test("empty filter list: apply is the identity projection") {
    val df = plantedDocs
    val out = TextCorpus.removeBoilerplate(df, "id", "text", Nil, segWords = 3)
    val back = out.select(col("id"), col("clean_text").as("text")).orderBy("id")
    assert(rowsOf(back) == rowsOf(df.orderBy("id")))
    assert(out.filter(col("n_removed") =!= 0L).isEmpty)
  }

  test("randomized corpus: two-pass census + InSet apply equal a single-pass reference") {
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("a", "b", "c", "d", "e") // tiny vocab forces repeats
    val docs = (0 until 250).map { i =>
      val n = 1 + rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val segW = 2
    val minDocs = 4
    // driver-side reference: exact df over per-doc-distinct segments
    def segsOf(text: String): Seq[String] =
      text.split(" ", -1).grouped(segW).map(_.mkString(" ")).toSeq
    val refSet = docs.flatMap { case (_, t) => segsOf(t).distinct }
      .groupBy(identity).collect { case (s, occ) if occ.size >= minDocs => s }
      .toSeq.sorted
    val df = docs.toDF("id", "text").repartition(5)
    val bp = TextCorpus.boilerplateSegments(df, "id", "text", segW, minDocs)
    assert(bp.toSeq == refSet)
    val got = TextCorpus.removeBoilerplate(df, "id", "text", bp.toSeq, segW)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val want = docs.map { case (id, t) =>
      val segs = segsOf(t)
      val kept = segs.filterNot(refSet.contains)
      (id, kept.mkString(" "), segs.size.toLong, (segs.size - kept.size).toLong)
    }
    assert(got.toSeq == want)
  }

  test("incremental census fold equals the one-shot corpus list") {
    val df = plantedDocs
    val oneShot = TextCorpus.boilerplateSegments(df, "id", "text", 3, 5)
    val stored = TextCorpus.segmentCensus(df.filter($"id" % 2 === 0), "id", "text", 3)
    val batch = TextCorpus.segmentCensus(df.filter($"id" % 2 =!= 0), "id", "text", 3)
    val merged = TextCorpus.segmentCensusMerge(stored, batch)
    assert(TextCorpus.boilerplateFromCensus(merged, 5).toSeq == oneShot.toSeq)
    // the fold IS the full census: every (seg, df) row matches
    val full = TextCorpus.segmentCensus(df, "id", "text", 3)
    assert(rowsOf(merged.orderBy("seg")) == rowsOf(full.orderBy("seg")))
  }

  test("boilerplateFromCensus refuses an over-cap filter list loudly") {
    val census = Seq(("p q r", 6L), ("s t u", 6L)).toDF("seg", "df")
    val e = intercept[IllegalStateException] {
      TextCorpus.boilerplateFromCensus(census, minDocs = 5, maxBoilerplate = 1)
    }
    assert(e.getMessage.contains("refusing to truncate"))
  }

  test("within-doc segment dedup: repeats drop, first occurrences keep order") {
    val df = Seq(
      (1L, "a b c a b c x y"),      // segs(2): [a b][c a][b c][x y] — no repeats
      (2L, "p q p q p q"),          // [p q]×3 → one survives
      (3L, "m n z z m n w")         // [m n][z z][m n][w] → [m n][z z][w]
    ).toDF("id", "text")
    val out = TextCorpus.dedupSegmentsWithinDoc(df, "id", "text", segWords = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("a b c a b c x y", 4L, 0L)))
    assert(out(2L) == (("p q", 3L, 2L)))
    assert(out(3L) == (("m n z z w", 4L, 1L)))
    // a repeated phrase of individually-common words is INVISIBLE to
    // token-level dedup but caught here: the distinct-semantics claim
    val tok = df.filter($"id" === 2L)
      .select(array_join(array_distinct(split($"text", " ")), " "))
      .head().getString(0)
    assert(tok == "p q") // token dedup happens to agree on doc 2...
    val df4 = Seq((4L, "p q r p q r")).toDF("id", "text") // ...but not here
    val segOut = TextCorpus.dedupSegmentsWithinDoc(df4, "id", "text", 3)
      .head().getString(1)
    assert(segOut == "p q r")
  }

  test("pass-2 candidate pruning is a typed InSet, not a 100k-arm In list") {
    val dir = tmpDir("bp-inset-plan")
    plantedDocs.select(xxhash64(col("text")).as("h"), col("text").as("seg"))
      .write.mode("overwrite").parquet(dir)
    val postings = spark.read.parquet(dir)
    val plan = TextCorpus.candidateRecount(postings, Array(1L, 2L, 3L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("INSET"), s"pass 2 must probe an InSet:\n$plan")
    assert(!plan.contains(" IN ("), s"no literal In list:\n$plan")
    // at the 100k cap the plan must still materialize instantly — an
    // In(...) tree here costs seconds of driver analysis before collapse
    val cands = Array.tabulate(100000)(_.toLong)
    val t0 = System.nanoTime()
    TextCorpus.candidateRecount(postings, cands).queryExecution.executedPlan
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 3000.0, f"100k-candidate plan took $ms%.0f ms to analyze")
  }

  test("the apply plan is a single shuffle-free projection") {
    // parquet-backed so the projection survives to the physical plan
    // (a local relation constant-folds into a LocalTableScan)
    val dir = tmpDir("bp-plan")
    plantedDocs.write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val out = TextCorpus.removeBoilerplate(df, "id", "text", Seq(B), segWords = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"apply must not shuffle:\n$plan")
    assert(plan.contains("INSET") || plan.toLowerCase.contains("inset"),
      s"membership must be an InSet probe:\n$plan")
  }
}
