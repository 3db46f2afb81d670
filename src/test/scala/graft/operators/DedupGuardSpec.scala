package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Oversized-bucket guards: the hot-bucket paths in [[Dedup.simhashPairs]]
  * (complement sub-banding) and [[Dedup.embeddingNearDupPairs]]
  * (hyperplane refinement) must keep their recall contracts while bounding
  * per-bucket pair volume — the round-3 verdict's two scale-killers. */
class DedupGuardSpec extends SparkSuite {
  import spark.implicits._

  /** Randomized corpus with mutation clusters: bases plus 1–2-token edits
    * plus exact copies, so hamming-close pairs exist at several distances. */
  private def mutatedCorpus(n: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector.tabulate(80)(i => s"tok$i")
    def doc(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    (0 until n).flatMap { i =>
      val toks = doc(12 + rnd.nextInt(25)).split(" ")
      val near = toks.updated(rnd.nextInt(toks.length), "MUT").mkString(" ")
      Seq((i * 10L, toks.mkString(" ")), (i * 10L + 1, near), (i * 10L + 2, toks.mkString(" ")))
    }
  }

  test("simhash guard: hot-path sub-banding preserves exact pigeonhole recall") {
    val df = mutatedCorpus(15, 0x51AB).toDF("doc_id", "text")
    val sigs = Dedup.simhashed(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def brute(maxHamming: Int): Set[(Long, Long)] = {
      val ids = sigs.keys.toSeq.sorted
      (for {
        a <- ids; b <- ids if a < b
        if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= maxHamming
      } yield (a, b)).toSet
    }
    // maxBucketSize=2 forces EVERY bucket down the sub-banded hot path;
    // 1000 keeps everything on the plain path; both must equal brute force
    // (pigeonhole completeness), in the default and the 8-chunk gate config
    for ((mh, nc) <- Seq((3, 4), (7, 8)); mbs <- Seq(2, 1000)) {
      val got = Dedup.simhashPairs(df, "doc_id", "text",
          maxHamming = mh, numChunks = nc, maxBucketSize = mbs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute(mh), s"maxHamming=$mh numChunks=$nc maxBucketSize=$mbs")
    }
    // numChunks=1 (exact 64-bit signature match) has no complement bits to
    // sub-band — the plain-join fallback must still be exact
    val exact1 = Dedup.simhashPairs(df, "doc_id", "text",
        maxHamming = 0, numChunks = 1, maxBucketSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact1 == brute(0))
    Dedup.releaseIntermediates()
  }

  test("poly61 token hash matches its DuckDB SQL mirror (pinned values)") {
    // pinned from (duckdb 1.0.0): fold (a*131+x) % 2305843009213693951 over
    // unicode codepoints via list_reduce, then
    // (fold * 2685821657736338717) % 18446744073709551616 → signed BIGINT.
    // 'héllo' exercises the multi-byte UTF-8 codepoint decode.
    import org.apache.spark.unsafe.types.UTF8String
    val expected = Map(
      "hello" -> -6663394891695334378L,
      "a" -> 2270283768491132925L,
      "" -> 0L,
      "the" -> 2719605126936183309L,
      "héllo" -> -7201575689534043694L)
    expected.foreach { case (tok, h) =>
      assert(graft.functions.HashKernels.poly61(UTF8String.fromString(tok)) == h, tok)
    }
    // and the poly-hash simhash pipeline keeps the same recall guarantees
    // (the sub-banding guard is hash-agnostic): quick ≡-brute-force check
    val df = mutatedCorpus(8, 0xB0D1L).toDF("doc_id", "text")
    val sigs = Dedup.simhashed(df, "doc_id", "text", polyHash = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the 64-bit finalize leaves no structurally-dead signature bits: the
    // high 3 bits vary across this corpus (they'd all be 0 without it)
    assert(sigs.values.map(_ >>> 61).toSet.size > 1)
    val brute = (for {
      a <- sigs.keys.toSeq.sorted; b <- sigs.keys.toSeq.sorted if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 7
    } yield (a, b)).toSet
    val got = Dedup.simhashPairs(df, "doc_id", "text",
        maxHamming = 7, numChunks = 8, maxBucketSize = 2, polyHash = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
    Dedup.releaseIntermediates()
  }

  test("simhash: maxHamming >= numChunks is rejected (pigeonhole precondition)") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 4, numChunks = 4)
    }
  }

  test("duplicate clusters: transitive closure, chain needs >1 propagation round") {
    import spark.implicits._
    // components: {1,2,3,4,5} as a CHAIN (1-2, 2-3, 3-4, 4-5 — min label
    // must walk 4 hops), {10,11,12} as a triangle, {20,21} as a pair
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
    // the star-contraction option returns the identical labeling
    val stars = Dedup.duplicateClusters(pairs, algorithm = "stars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stars == got)
    Dedup.releaseIntermediates()
  }

  test("star contraction ≡ label propagation on randomized and star-heavy graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xC1C1)
    // randomized sparse graphs: chains, triangles, singleton pairs mixed
    for (trial <- 0 until 3) {
      val n = 60 + trial * 40
      val pairs = (0 until n).map { _ =>
        val a = rnd.nextInt(50).toLong; val b = rnd.nextInt(50).toLong
        (a, if (a == b) a + 1 else b)
      }.toDF("id_a", "id_b")
      val label = Dedup.duplicateClusters(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val stars = Dedup.duplicateClusters(pairs, algorithm = "stars")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(stars == label, s"trial $trial")
    }
    // the shape stars is FOR: one viral hub duplicated many times, with the
    // hub id NOT the minimum (forces re-pointing), plus a long chain
    val hub = (1 until 200).map(i => (500L, 500L + i))
    val chain = (1000L until 1040L).map(i => (i, i + 1))
    val pairs = (hub ++ chain :+ ((500L, 3L))).toDF("id_a", "id_b")
    val label = Dedup.duplicateClusters(pairs, maxIters = 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stars = Dedup.duplicateClusters(pairs, algorithm = "stars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stars == label)
    assert(stars(500L) == 3L && stars(699L) == 3L) // hub component min = 3
    assert(stars(1040L) == 1000L)
    Dedup.releaseIntermediates()
  }

  test("stratified sample: deterministic, plan-independent, absent strata dropped") {
    import spark.implicits._
    val rows = (0L until 1000L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "es"))
    val df = rows.toDF("doc_id", "lang")
    val rates = Map("en" -> 500, "de" -> 100)
    val once = TextCorpus.stratifiedSample(df, "doc_id", "lang", rates)
      .collect().map(_.getLong(0)).sorted.toSeq
    // same selection under a different physical plan (repartitioned input)
    val again = TextCorpus.stratifiedSample(df.repartition(7), "doc_id", "lang", rates)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(once == again && once.nonEmpty)
    // absent stratum fully dropped; kept rows reproduce the LCG arithmetic
    val byLang = TextCorpus.stratifiedSample(df, "doc_id", "lang", rates)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("es"))
    def bucket(i: Long) = (((i % 2147483648L) * 1103515245L + 12345L) % 2147483648L) % 1000L
    val expected = rows.filter { case (i, l) =>
      rates.get(l).exists(r => bucket(i) < r) }.map(_._1).sorted
    assert(once == expected)
  }

  test("contamination: shared-shingle counts against a benchmark slice") {
    import spark.implicits._
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // shares 4-shingle run with bench 100
      (2L, "totally different words here now ok"),
      (3L, "alpha beta gamma delta nothing else")    // shares a shorter run
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val out = TextCorpus.contamination(train, "doc_id", "text",
        bench, "doc_id", "text", shingleN = 3, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc 1 ≡ bench: all 4 distinct 3-shingles shared; doc 3 shares 2
    assert(out == Map((1L, 100L) -> 4L, (3L, 100L) -> 2L))
  }

  test("concat-chunk packing: distributed prefix-sum invariant to partition count") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xFACC)
    val docs = (0L until 200L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(40))("w").mkString(" "))).toDF("doc_id", "text")
    def run(parts: Int) = TextCorpus.concatChunks(docs, "doc_id", "text",
        capacity = 100, partitions = parts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    val one = run(1)      // trivially correct: single-partition cumsum
    assert(run(7) == one) // distributed offsets must agree exactly
    assert(run(64) == one) // more partitions than data
    // offsets are a gapless concatenation
    one.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 == a._3 + a._2, s"gap between ${a._1} and ${b._1}") }
    assert(one.head._3 == 0L)
    // chunk spans follow the arithmetic
    one.foreach { case (_, n, s, fc, lc) =>
      assert(fc == s / 100 && lc == (s + n - 1) / 100) }
    // STRING ids take the sampled-range fallback and must agree with the
    // integral path on the same ordered corpus
    val sdocs = docs.withColumn("doc_id", format_string("doc-%04d", col("doc_id")))
    val viaStrings = TextCorpus.concatChunks(sdocs, "doc_id", "text",
        capacity = 100, partitions = 7)
      .collect().map(r => (r.getString(0).drop(4).toLong, r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(viaStrings == one.map(t => (t._1, t._2, t._3)))
    Dedup.releaseIntermediates()
  }

  test("concat-chunk packing: plan stays O(1)-per-row at cluster partition counts") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xFACD)
    val docs = (0L until 300L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(40))("w").mkString(" "))).toDF("doc_id", "text")
    val out = TextCorpus.concatChunks(docs, "doc_id", "text",
      capacity = 100, partitions = 2048)
    // the base offset must arrive via a broadcast join, NOT an
    // O(nParts)-deep when-chain evaluated per row: at 2048 buckets a
    // chain would put thousands of CaseWhen branches in the plan
    val optimized = out.queryExecution.optimizedPlan.toString
    val caseBranches = "(?i)CASE WHEN".r.findAllIn(optimized).size
    assert(caseBranches < 16, s"when-chain leaked into the plan ($caseBranches branches)")
    assert(optimized.length < 100000, s"plan blowup: ${optimized.length} chars")
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    // and the result is still the exact gapless concatenation
    assert(rows.head._3 == 0L)
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 == a._3 + a._2, s"gap between ${a._1} and ${b._1}") }
    val joins = out.queryExecution.executedPlan.toString
    assert(joins.contains("BroadcastHashJoin") || joins.contains("BroadcastNestedLoopJoin")
      || joins.contains("AdaptiveSparkPlan"),
      "base-offset join is not broadcast")
    Dedup.releaseIntermediates()
  }

  test("lcg bucket: matches the documented sign-safe SQL mirror incl. negative keys") {
    import spark.implicits._
    val keys = Seq(-3L, -1L, 0L, 1L, 999L, 2147483647L, 2147483648L, -2147483649L,
      Long.MaxValue, Long.MinValue + 1)
    val got = keys.toDF("k")
      .select(col("k"), TextCorpus.lcgBucket(col("k")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = 2147483648L
    def mirror(k: Long) = {
      val r = ((k % m) + m) % m
      ((((r * 1103515245L + 12345L) % m) + m) % m) % 1000L
    }
    keys.foreach(k => assert(got(k) == mirror(k), s"key $k"))
  }

  test("topk aggregate: equals the window formulation on randomized groups") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(0x70CC)
    // duplicate values across groups probe the tie-break (value desc, payload asc)
    val rows = (0L until 3000L).map(i => (s"g${i % 17}", rnd.nextInt(50).toLong, i))
    val df = rows.toDF("g", "v", "p")
    val viaWindow = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("p"))).cast("long"))
      .filter(col("rn") <= 5).select("g", "p", "rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val viaAgg = df.groupBy("g")
      .agg(graft.functions.NativeAgg.topKPairs(col("v"), col("p"), 5).as("tk"))
      .select(col("g"), posexplode(col("tk")))
      .select(col("g"), col("col.p"), (col("pos") + 1).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("heavy hitters: exact above-threshold terms on a skewed stream") {
    import spark.implicits._
    // 40 "hot" docs of one token + a long tail, shuffled across partitions
    val hot = Seq.fill(500)("hotword")
    val tail = (0 until 3000).map(i => s"tail${i % 800}")
    val mid = Seq.fill(200)("warmword")
    val words = new scala.util.Random(7).shuffle(hot ++ tail ++ mid)
    val docs = words.grouped(25).zipWithIndex
      .map { case (w, i) => (i.toLong, w.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    // n = 3700 total occurrences
    val out = TextCorpus.heavyHitters(docs.repartition(8), "text", k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact truth at threshold n/10 = 370: only hotword (500)
    assert(out == Map("hotword" -> 500L))
    // looser threshold (n/20 = 185) catches warmword exactly too
    val out2 = TextCorpus.heavyHitters(docs, "text", k = 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out2 == Map("hotword" -> 500L, "warmword" -> 200L))
    Dedup.releaseIntermediates()
  }

  test("range join: equals brute-force inequality join, one row per qualifying pair") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xAB5E)
    val points = (0L until 400L).map(i => (i, rnd.nextInt(100000).toLong))
      .toDF("pid", "pts")
    // interval lengths straddle the bucket width (some span 0 buckets,
    // some many); starts may exceed ends rarely? keep start <= end
    val ivs = (0L until 120L).map { i =>
      val s = rnd.nextInt(100000).toLong
      (i, s, s + rnd.nextInt(5000).toLong)
    }.toDF("iid", "s", "e")
    for (bw <- Seq(100L, 1700L, 1000000L)) {
      val got = graft.operators.Temporal.rangeJoin(points, "pts", ivs, "s", "e", bw)
        .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val brute = points.crossJoin(ivs)
        .filter(col("pts") >= col("s") && col("pts") <= col("e"))
        .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // SEQ compare: each qualifying pair must appear exactly once (the
      // meet-in-one-bucket property), not just as a set
      assert(got.sorted == brute.sorted, s"bucketWidth=$bw")
    }
  }

  test("embedding guard: clustered corpus is split by refinement, planted dups survive") {
    val dim = 16
    val n = 100
    val rnd = new scala.util.Random(0xC1C1)
    // one hyperplane (planes=1, tables=1): flip each random vector's sign
    // so its dot with the plane is positive — the WHOLE corpus lands in a
    // single LSH cell, the worst-case clustered input
    val raw = Seq.tabulate(n) { i =>
      val v = Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
      (i.toLong, v)
    }
    val aligned = raw.map { case (id, v) =>
      val bucket = Similarity.bucketsOf(v.toSeq, planes = 1, tables = 1).head
      (id, if (bucket == 1L) v else v.map(x => -x))
    }
    // plant exact near-dups: a ×2-scaled copy of each vector (cosine 1.0,
    // identical signature under ANY hyperplane — recall is structural)
    val corpus = aligned ++ aligned.map { case (id, v) => (id + 100000L, v.map(_ * 2f)) }
    val df = corpus.toDF("vec_id", "embedding")
    // sanity: single cell confirmed
    assert(corpus.map(c => Similarity.bucketsOf(c._2.toSeq, 1, 1).head).toSet.size == 1)
    val pairs = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding",
        threshold = 0.999, planes = 1, tables = 1,
        maxBucketSize = 20, refinePlanes = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cos >= 0.999 on this seeded random corpus ⇔ the planted scaled pairs
    assert(pairs == aligned.map(c => (c._1, c._1 + 100000L)).toSet)
    // the refinement actually bounds pair volume: the hot cell's members
    // spread across many refined sub-buckets, none holding a large share
    val refined = df.select(Similarity.refineKey(col("embedding"), 8, dim).as("b2"))
      .groupBy("b2").count().collect().map(_.getLong(1))
    assert(refined.length > 10, s"refinement produced only ${refined.length} sub-buckets")
    assert(refined.max <= corpus.size / 4,
      s"largest refined sub-bucket ${refined.max} of ${corpus.size}")
    Dedup.releaseIntermediates()
  }
}
