package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.functions.TextFunctions

/** Corpus-level text statistics for training-data pipelines (the vocabulary
  * / document-frequency side of TF-IDF and filter-list building). Pure
  * DataFrame programs: one explode of per-doc DISTINCT tokens (so df counts
  * documents, not occurrences), one count shuffle keyed on the term — the
  * same shape at 5e2 or 5e9 documents, with map-side partial aggregation
  * soaking up Zipfian term skew. */
object TextCorpus {

  /** Document frequency of every token: (term, df). df counts DOCUMENTS —
    * the (id, term) pairs are deduplicated first, so re-delivered /
    * duplicated rows of the same document don't inflate counts. */
  def documentFrequency(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("term"))
      .dropDuplicates(idCol, "term")
      .groupBy("term").agg(count(lit(1)).as("df"))

  /** Top-n vocabulary by document frequency, deterministically ordered
    * (df desc, term asc) — the filter-list/vocab-build step. */
  def topVocabulary(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    documentFrequency(df, idCol, textCol)
      .orderBy(col("df").desc, col("term").asc).limit(n)

  /** Benchmark decontamination: training docs sharing ≥ `minOverlap`
    * DISTINCT n-gram shingles with any benchmark doc — the standard
    * n-gram-overlap contamination check run before a training mix ships.
    * Returns (train_id, bench_id, overlap) pairs.
    *
    * Shape at 100 TB: the benchmark side is small (eval suites are
    * thousands of docs) — its shingle posting list broadcasts, so the
    * train corpus is ONE pass with no train-side self-join and no
    * shuffle of train text. Both sides hash shingles to longs; counts
    * are per (train, bench) doc pair via map-side combine. */
  def contamination(
      train: DataFrame, trainId: String, trainText: String,
      bench: DataFrame, benchId: String, benchText: String,
      shingleN: Int = 3, minOverlap: Int = 1): DataFrame = {
    def posting(df: DataFrame, id: String, text: String, outId: String) =
      TextFunctions.shingleSets(df.select(col(id).as(outId), col(text)), outId, text, shingleN)
        .select(col(outId), explode(col("sh")).as("s"))
        .select(col(outId), xxhash64(col("s")).as("shh"))
    val trainP = posting(train, trainId, trainText, "train_id")
    val benchP = posting(bench, benchId, benchText, "bench_id")
    trainP.join(broadcast(benchP), Seq("shh"))
      .groupBy("train_id", "bench_id")
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  /** Per-document benchmark-contamination RATE — the GPT-3 appendix-C
    * "dirtiness" statistic: the fraction of a document's DISTINCT token
    * n-grams that appear anywhere in the benchmark corpus, as an exact
    * permille. Complements [[contamination]] (per-pair overlap counts,
    * flags WHO overlaps) and [[graft.operators.Dedup.contaminatedSpans]]
    * (WHERE the overlap sits) with HOW MUCH of each doc is contaminated —
    * the number a filtering threshold is actually set on.
    *
    * Shape at 100 TB: the benchmark's distinct gram hashes collect ONCE
    * (eval suites are metadata-scale next to a training corpus; the
    * driver-side set is cap-guarded with a loud refusal, never truncated)
    * and ride the closure as a codegen'd InSet probe — the corpus pass is
    * MAP-ONLY: per row one in-place window-hash scan
    * ([[graft.functions.HashKernels.kgramWindowHashes]] — no gram-string
    * or token-array allocation), one distinct, one set-membership filter.
    * No join, no exchange, train text never shuffles. Gram identity is the
    * 64-bit window hash (the corpus-wide convention of the dedup family —
    * collisions across ~2⁶⁴ indistinguishable at any real gram count).
    * Documents with fewer than `n` tokens have no n-grams: rate 0 over 0
    * grams. Returns (idCol, n_grams, n_hits, contamination_permille). */
  def contaminationRate(
      train: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8,
      maxBenchGrams: Int = 5000000): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(maxBenchGrams > 0, s"maxBenchGrams must be positive, got $maxBenchGrams")
    import org.apache.spark.sql.catalyst.expressions.InSet
    import org.apache.spark.sql.graft.Bridge
    val benchGrams = bench
      .select(explode(graft.functions.NativeHash.kgramWindowHashes(
        TextFunctions.normalizeWs(col(benchTextCol)), n)).as("gh"))
      .distinct().limit(maxBenchGrams + 1)
      .collect().map(_.getLong(0))
    if (benchGrams.length > maxBenchGrams)
      throw new IllegalStateException(
        s"contaminationRate: benchmark corpus has more than $maxBenchGrams " +
          "distinct n-grams — refusing a truncated reference set (raise " +
          "maxBenchGrams or shrink the benchmark side)")
    val hset: Set[Any] = benchGrams.iterator
      .map(java.lang.Long.valueOf(_): Any).toSet
    val grams = graft.functions.NativeHash.kgramWindowHashes(
      TextFunctions.normalizeWs(col(textCol)), n)
    train
      .select(col(idCol), array_distinct(grams).as("__dg"))
      .select(col(idCol),
        size(col("__dg")).cast("long").as("n_grams"),
        (if (benchGrams.isEmpty) lit(0L)
         else size(filter(col("__dg"),
           g => Bridge.column(InSet(Bridge.expression(g), hset)))).cast("long"))
          .as("n_hits"))
      .withColumn("contamination_permille",
        when(col("n_grams") > 0,
          expr("CAST(n_hits * 1000 DIV n_grams AS BIGINT)")).otherwise(lit(0L)))
  }

  /** Per-document TF-IDF keyword extraction: the top `k` tokens of each
    * document by `tf · idf_x1000`, integer-exact (`idf_x1000 = N·1000 DIV
    * df` — rational idf, no logarithm, so a SQL oracle replays every score
    * bit-for-bit; the log-idf ordering differs only in scale, not in which
    * terms rank high). Tie-break: score desc, term asc — fully
    * deterministic. The window partitions BY DOCUMENT (bounded by one
    * doc's vocabulary — never the per-language single-reducer trap that
    * [[scoreBuckets]] avoids). Term strings shuffle once into the
    * (doc, term) count; the df side is a map-side-combinable count joined
    * back on the term. Returns (idCol, term, tfidf_x1000, rank ≤ k). */
  def keywordsTfidf(
      df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val n = df.count()
    val tf = df
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("tfidf_x1000").desc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("tfidf_x1000",
        col("tf") * expr(s"CAST(${n * 1000L} DIV df AS BIGINT)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tfidf_x1000"), col("rank"))
  }

  /** Deterministic per-stratum hash sampling — the training-mix builder:
    * keep a row iff `lcgBucket(key) < rate(stratum) · m`. The "hash" is a
    * linear-congruential mix over the key column so the SAME selection is
    * reproducible anywhere (including a SQL oracle) — no RNG state, no
    * per-partition seeds, stable under repartitioning; rows keep or drop
    * independently of execution plan. `rates` maps stratum value →
    * per-mille keep rate; strata absent from the map are dropped. One
    * narrow pass, no shuffle. */
  def stratifiedSample(
      df: DataFrame, keyCol: String, stratumCol: String,
      ratesPerMille: Map[String, Int]): DataFrame = {
    val bucket = lcgBucket(col(keyCol))
    val keep = ratesPerMille.foldLeft(lit(false)) { case (acc, (stratum, rate)) =>
      acc || (col(stratumCol) === stratum && bucket < rate)
    }
    df.filter(keep)
  }

  /** The sampling bucket, all mods NON-NEGATIVE (Spark pmod): the key is
    * reduced BEFORE the multiply so the product stays ≤ 2^62 (no Long
    * overflow: ANSI Spark would throw and a SQL mirror would disagree on
    * wide keys). Engine-exact SQL mirror — note most engines' `%` keeps
    * the dividend's sign, so the mirror must re-add the modulus:
    * {{{
    *   ((((key % m + m) % m) * 1103515245 + 12345) % m + m) % m % 1000
    * }}}
    * with m = 2147483648 (for non-negative keys the plain `%` form is
    * identical). Integral keys only. */
  def lcgBucket(key: Column): Column =
    pmod(pmod(pmod(key.cast("long"), lit(2147483648L)) * 1103515245L + 12345L,
      lit(2147483648L)), lit(1000L))

  /** Data-mixture sampling by TOKEN budget: per group (domain, source,
    * language...), keep documents in the deterministic [[lcgBucket]]
    * pseudo-random order until the group's token budget is reached — "take
    * 100B tokens of web, 20B of code" as one operator. A document is kept
    * iff the tokens accumulated BEFORE it are still under the budget, so
    * the crossing document is included and every non-empty group with a
    * positive budget contributes at least one document. Groups absent from
    * `budgets` are dropped (the [[stratifiedSample]] contract). Token
    * counts are single-space split sizes — mirror with
    * `len(string_split(text, ' '))`.
    *
    * Scale shape: the running sum is NOT a per-group single-partition
    * window (a 100 TB group would land on one executor — the trap
    * [[concatChunks]] documents). Rows are bucketed by the deterministic
    * (group, lcgBucket) key — the PREFIX of the sample order — each bucket
    * computes a local cumsum, and the per-(group, bucket) totals (≤ 1000 ×
    * |groups| tiny rows) become broadcast base offsets on the driver.
    * Same answer at any partition count. */
  def tokenBudgetSample(
      df: DataFrame, idCol: String, textCol: String, groupCol: String,
      budgets: Map[String, Long]): DataFrame = {
    require(budgets.nonEmpty, "budgets must list at least one group")
    val spark = df.sparkSession
    val nt = size(split(col(textCol), " ")).cast("long")
    val base = df
      .filter(col(groupCol).isInCollection(budgets.keys.toSeq))
      .select(col(idCol), col(groupCol), nt.as("n_tokens"),
        lcgBucket(col(idCol)).as("__bk"))
      .repartition(col(groupCol), col("__bk"))
    val counted = Caching.spillPersistEager(base)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol, "__bk").orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val local = counted.withColumn("__cumBefore",
      coalesce(sum("n_tokens").over(w), lit(0L)))
    // per-(group, bucket) totals → per-group prefix bases, driver-side
    val totals = counted.groupBy(groupCol, "__bk")
      .agg(sum("n_tokens").as("t")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bases = totals.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.zip(sorted.scanLeft(0L)((acc, r) => acc + r._3).init).map {
        case ((_, bk, _), b) => (g, bk, b, budgets(g))
      }
    }
    import spark.implicits._
    val baseDf = bases.toDF(groupCol, "__bk", "__base", "__budget")
    local.join(broadcast(baseDf), Seq(groupCol, "__bk"))
      .filter(col("__cumBefore") + col("__base") < col("__budget"))
      .select(col(idCol), col(groupCol), col("n_tokens"))
  }

  /** Water-filling mixture allocation — "data mixing": split `totalBudget`
    * tokens across groups proportionally to integer `weights` ("1 part
    * wiki, 2 parts code, 5 parts web"), capping every group at its
    * AVAILABLE tokens and redistributing the surplus among the still-
    * uncapped groups, repeated until nothing caps (each round caps at
    * least one group, so ≤ |groups| rounds). Every proportional split
    * rounds by LARGEST REMAINDER (ties by group name ascending), so the
    * result is integer-exact, deterministic, and sums to
    * min(totalBudget, Σ avail). Driver arithmetic is BigInt — a
    * 100-trillion-token budget times a weight cannot overflow.
    *
    * Scale shape: ONE map-side-combinable agg over the corpus (per-group
    * token totals — ≤ |groups| rows reach the driver); the loop itself is
    * O(|groups|²) driver-side integer arithmetic. */
  def mixtureAllocate(
      df: DataFrame, textCol: String, groupCol: String,
      weights: Map[String, Long], totalBudget: Long): Map[String, Long] = {
    require(weights.nonEmpty, "weights must list at least one group")
    require(weights.values.forall(_ > 0), "weights must be positive")
    require(totalBudget >= 0, s"totalBudget must be >= 0, got $totalBudget")
    val totals = df.filter(col(groupCol).isInCollection(weights.keys.toSeq))
      .groupBy(groupCol)
      .agg(sum(size(split(col(textCol), " ")).cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    allocateDriver(weights, weights.keys.map(g =>
      g -> totals.getOrElse(g, 0L)).toMap, totalBudget)
  }

  /** The driver-side water-filling loop of [[mixtureAllocate]], exposed
    * for availability maps that are already known (and for specs). */
  private[graft] def allocateDriver(
      weights: Map[String, Long], avail: Map[String, Long],
      totalBudget: Long): Map[String, Long] = {
    var active = weights.keys.toSeq.sorted
    var fixed = Map.empty[String, Long]
    var rem = totalBudget
    while (active.nonEmpty && rem > 0) {
      val wSum = active.map(g => BigInt(weights(g))).sum
      val floorOf = active.map(g =>
        g -> (BigInt(rem) * weights(g) / wSum).toLong).toMap
      val leftover = (rem - floorOf.values.sum).toInt
      val bumped = active.sortBy(g =>
          (BigInt(rem) * weights(g) mod wSum, g))(
          Ordering.Tuple2(Ordering[BigInt].reverse, Ordering[String]))
        .take(leftover).toSet
      val share = active.map(g =>
        g -> (floorOf(g) + (if (bumped(g)) 1L else 0L))).toMap
      val capped = active.filter(g => share(g) >= avail(g))
      if (capped.isEmpty) { fixed ++= share; active = Nil; rem = 0 }
      else {
        capped.foreach { g => fixed += g -> avail(g); rem -= avail(g) }
        active = active.filterNot(capped.toSet)
      }
    }
    weights.keys.map(g => g -> fixed.getOrElse(g, 0L)).toMap
  }

  /** [[mixtureAllocate]] + [[tokenBudgetSample]] in one call: "1 part
    * wiki, 2 parts code, 5 parts web, N tokens total" as one operator —
    * the fixed-proportion corpus mixture a pretraining run requests. */
  def mixtureSample(
      df: DataFrame, idCol: String, textCol: String, groupCol: String,
      weights: Map[String, Long], totalBudget: Long): DataFrame =
    tokenBudgetSample(df, idCol, textCol, groupCol,
      mixtureAllocate(df, textCol, groupCol, weights, totalBudget))

  /** Temperature-based mixture sampling — the p^(1/T) domain reweighting
    * of multilingual/pretraining data mixing (upsample small domains,
    * damp dominant ones): per-group sampling weights ∝ (group token
    * total)^(1/T), then [[mixtureSample]]'s exact water-filling
    * allocation and deterministic LCG selection.
    *
    * Inverse temperatures are DYADIC — 1/T = 1/2^m via
    * `sqrtApplications` = m (T = 2 at m = 1, the canonical setting) —
    * because IEEE-754 `sqrt` is correctly rounded on every engine while
    * `pow` is not: the quantized weight floor(sqrt^∘m(tokens) · scale)
    * is a composition of correctly-rounded ops on exactly-representable
    * inputs (token totals < 2⁵³), so a SQL oracle replays it
    * bit-for-bit. Weights clamp to ≥ 1 so a listed-but-tiny group keeps
    * nonzero probability — the upsampling effect the technique exists
    * for. Cost: ONE extra map-side-combinable agg over the listed
    * groups (≤ |groups| rows to the driver); selection is
    * [[tokenBudgetSample]]'s bucketed-prefix-sum shape. */
  def temperatureMixtureSample(
      df: DataFrame, idCol: String, textCol: String, groupCol: String,
      groups: Seq[String], totalBudget: Long,
      sqrtApplications: Int = 1, scale: Long = 1000L): DataFrame = {
    require(groups.nonEmpty, "groups must be non-empty")
    require(sqrtApplications >= 1 && sqrtApplications <= 6,
      s"sqrtApplications must be in [1, 6], got $sqrtApplications")
    require(scale > 0, s"scale must be positive, got $scale")
    val totals = df.filter(col(groupCol).isInCollection(groups))
      .groupBy(groupCol)
      .agg(sum(size(split(col(textCol), " ")).cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = groups.map { g =>
      var x = totals.getOrElse(g, 0L).toDouble
      (0 until sqrtApplications).foreach(_ => x = math.sqrt(x))
      g -> math.max(1L, math.floor(x * scale).toLong)
    }.toMap
    tokenBudgetSample(df, idCol, textCol, groupCol,
      allocateDriver(weights,
        groups.map(g => g -> totals.getOrElse(g, 0L)).toMap, totalBudget))
  }

  /** Sequence packing (concat-then-chunk): documents are concatenated in
    * `idCol` order and split into `capacity`-token context windows; each
    * doc reports its global token start offset and the first/last chunk
    * it lands in — the bookkeeping a pretraining batch builder needs.
    *
    * The global running sum does NOT use a single-partition window (the
    * classic scale trap): rows are bucketed by DETERMINISTIC equal-width
    * id ranges, each bucket computes a local cumsum, and the per-bucket
    * totals — a tiny driver-side array — become broadcast base offsets.
    * Two narrow passes, no global sort on one executor, same answer at
    * any partition count (offsets depend only on id order). */
  def concatChunks(
      df: DataFrame, idCol: String, textCol: String,
      capacity: Int, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nParts = math.max(1, if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions)
    val integralId = df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    // INTEGRAL ids: the bucket is a DETERMINISTIC, ORDER-MONOTONIC
    // function of the id VALUE (stride division from a min/max probe) —
    // not spark_partition_id over sample-based range partitioning, whose
    // boundaries could differ between the totals action and the final
    // plan (or on any re-execution after cache eviction). Count-skewed
    // buckets only skew work, never results. Other orderable id types
    // fall back to sampled range partitioning, which the EAGER persist
    // pins for the function's two actions (release the cache only after
    // consuming the result).
    val prepared =
      if (integralId) {
        val bounds = df.agg(min(col(idCol)).cast("long"), max(col(idCol)).cast("long")).head()
        if (bounds.isNullAt(0)) // empty or all-null ids: keep the id type
          return df.select(col(idCol), lit(0L).as("n_tokens"),
            lit(0L).as("start_offset"), lit(0L).as("first_chunk"),
            lit(0L).as("last_chunk")).limit(0)
        val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
        // BigInt span: hi - lo + 1 itself can exceed Long for extreme id
        // ranges; id DIV stride (truncation is monotonic) avoids any
        // (id - lo) subtraction on the executors
        val span = BigInt(hi) - BigInt(lo) + 1
        val stride = ((span / nParts + 1).min(BigInt(Long.MaxValue))).toLong
        val base = lo / stride // same truncating division as SQL DIV
        // null ids sort first under the window's ASC order → first bucket
        val bucketOf = coalesce(
          expr(s"CAST((CAST(`$idCol` AS BIGINT) DIV ${stride}L) - ${base}L AS INT)"),
          lit(Int.MinValue))
        df.select(col(idCol), TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
            bucketOf.as("__pid"))
          .repartition(nParts, col("__pid"))
      } else
        df.select(col(idCol), TextFunctions.tokenCount(col(textCol)).as("n_tokens"))
          .repartitionByRange(nParts, col(idCol))
          .select(col(idCol), col("n_tokens"), spark_partition_id().as("__pid"))
    // persisted eagerly: tokenize runs once, and (fallback path) both
    // actions must see the SAME sampled partitioning
    val counted = Caching.spillPersistEager(prepared)
    // ROWS frame, not the default RANGE frame: RANGE includes ORDER BY
    // peers, so duplicate ids would double-count both rows' n_tokens into
    // each __cum and diverge from the ROWS-semantics oracle
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val local = counted.withColumn("__cum", sum("n_tokens").over(w))
    // per-bucket totals: ≤ nParts rows — driver prefix-sum, then handed
    // back as a BROADCAST-joined (pid, base) frame. NOT a when-chain over
    // pids: that is an O(nParts)-node expression evaluated per row, a
    // plan-size blowup at cluster shuffle-partition counts (10k+). The
    // broadcast hash join is O(1) per row and O(nParts) total plan size.
    val partTotals = counted.groupBy("__pid").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bases: Seq[(Int, Long)] = {
      val sorted = partTotals.keys.toSeq.sorted
      sorted.zip(sorted.scanLeft(0L)((acc, p) => acc + partTotals(p)).init)
    }
    import spark.implicits._
    val baseDf = bases.toDF("__pid", "__base")
    local
      .join(broadcast(baseDf), Seq("__pid"))
      .withColumn("start_offset", col("__cum") - col("n_tokens") + col("__base"))
      // integer DIV, not double `/`: offsets at extreme scale would lose
      // precision past 2^53 (start_offset ≥ 0, so DIV ≡ floor)
      .withColumn("first_chunk", expr(s"start_offset DIV ${capacity}L"))
      .withColumn("last_chunk",
        expr(s"(start_offset + n_tokens - 1) DIV ${capacity}L"))
      .select(idCol, "n_tokens", "start_offset", "first_chunk", "last_chunk")
  }

  /** EXACT heavy hitters via the two-pass sketch+verify shape: pass 1 runs
    * a Misra-Gries sketch (bounded state, map-side mergeable — the
    * guarantee: any term with count > n/(capacity+1) is in the candidate
    * set); pass 2 re-counts ONLY the ≤ capacity candidates exactly and
    * keeps those with count·k > n. Output = exactly the terms above the
    * 1/k frequency threshold with exact counts — sketch speed, exact
    * answer, at any scale (capacity defaults to 2k for slack). */
  /** Deterministic KMV approximate-distinct per group: the k smallest
    * DISTINCT values of a caller-supplied non-negative hash column
    * (`0 ≤ h < hashBound`) ride a [[graft.functions.NativeAgg
    * .kMinDistinct]] O(k)-state aggregate — map-side combinable, so a
    * 100 TB distinct-cardinality census never shuffles distinct values
    * (`count(DISTINCT)`) or materializes the domain (`collect_set`).
    * UNLIKE HLL-style sketches the whole statistic is deterministic (the
    * hash is the randomness) and integer-exact, so an external engine
    * replays it bit-for-bit: with fewer than k kept the count is EXACT;
    * at k the classic KMV estimate applies as
    * `(k−1)·hashBound DIV (kth_min + 1)` (relative error ~1/√k).
    * Returns (group, n_kept, kth_min, est_distinct). NULL hashes never
    * enter the sketch (SQL aggregate semantics), so a group whose hash
    * column is ALL null keeps an empty array: it reports n_kept 0,
    * kth_min NULL (guarded — a bare element_at(-1) on an empty array
    * throws under ANSI mode) and est_distinct 0. */
  /** DETERMINISTIC fixed-size per-group sample — bottom-k by hash: each
    * group keeps the k rows with the SMALLEST caller-supplied non-negative
    * hash (ties to the lowest id). The hash is the randomness, so the
    * sample is uniform yet fully deterministic and externally replayable
    * (`row_number() OVER (ORDER BY hash, id) <= k` in any engine) — the
    * reservoir-sampling replacement whose result does not depend on
    * partitioning, merge order, or a seed side-channel.
    *
    * Shape at 100 TB: O(k) state per group riding the
    * [[graft.functions.NativeAgg.topKPairs]] bounded-heap aggregate —
    * map-side combinable, so a fixed-size per-source sample never sorts
    * or materializes the long tail the way the row_number window would.
    * Rows with a null hash or id never enter (SQL aggregate semantics);
    * negative hashes refuse loudly at execution time. Returns
    * (group, sample_rank 1..k by ascending hash, id). */
  def sampleBottomK(
      df: DataFrame, groupCol: String, idCol: String, hashCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val guarded = when(col(hashCol) < 0, raise_error(concat(
        lit(s"graft sampleBottomK: negative hash in $hashCol ("),
        col(hashCol).cast("string"),
        lit(") — supply a non-negative hash (md5-prefix convention)"))))
      .otherwise(col(hashCol))
    df.groupBy(col(groupCol))
      .agg(graft.functions.NativeAgg.topKPairs(
        guarded * -1L, col(idCol), k).as("__kept"))
      .select(col(groupCol), posexplode(col("__kept")))
      .select(col(groupCol), (col("pos") + 1L).cast("long").as("sample_rank"),
        col("col.p").as(idCol))
  }

  /** Priorities above this clamp are "certainly kept": `w·bound/(h+1)`
    * blows past BIGINT when the weight is large and the hash tiny, so both
    * engines clamp at 2^62 — order among clamped rows falls to the id
    * tie-break, identically on both sides. */
  val PriorityCap: Long = 1L << 62

  /** WEIGHTED priority sample per group (Duffield–Lund–Thorup priority
    * sampling): each item draws priority `q = (w·hashBound) DIV (h+1)` —
    * the integer-exact form of `w/u` with `u = (h+1)/hashBound` uniform
    * from the caller's deterministic hash — and the k HIGHEST-priority
    * items are kept, ties on q breaking to the smaller id. `est_weight =
    * max(w, τ)` with τ the (k+1)-th priority (0 when the group has ≤ k
    * items, where the sample is the whole group and exact) is the DLT
    * unbiased estimator: summing it over the sample estimates the group's
    * total weight. The whole statistic — priorities, kept set, τ, the
    * estimates — is hash-deterministic and integer-exact, so the DuckDB
    * oracle replays it row-for-row (the [[sampleBottomK]] discipline,
    * weighted).
    *
    * Shape at scale: O(k) bounded-heap state per group, map-side
    * combinable ([[graft.functions.NativeAgg.topKPairs]] at k+1) — no
    * row_number sort of the long tail — then the k·|groups| sample
    * broadcasts back against a second corpus scan to recover weights (two
    * pushdown-friendly scans beat persisting a corpus-sized projection).
    * `weightCol` must be integral and POSITIVE, `hashCol` in
    * [0, hashBound) — violations refuse loudly at execution time;
    * (group, id) must be unique (the join-back fans out otherwise).
    * Returns (group, id, weight, priority, est_weight). */
  def samplePriority(
      df: DataFrame, groupCol: String, idCol: String, hashCol: String,
      weightCol: String, k: Int, hashBound: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(hashBound > 0, s"hashBound must be positive, got $hashBound")
    val integral: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    require(integral.contains(df.schema(weightCol).dataType),
      s"weightCol $weightCol must be integral, got " +
        s"${df.schema(weightCol).dataType}")
    val h = when(col(hashCol) < 0 || col(hashCol) >= hashBound,
        raise_error(concat(
          lit(s"graft samplePriority: hash outside [0, $hashBound) ("),
          col(hashCol).cast("string"), lit(") — fix the hash projection"))))
      .otherwise(col(hashCol))
    val wv = when(col(weightCol) <= 0, raise_error(concat(
        lit(s"graft samplePriority: non-positive weight in $weightCol ("),
        col(weightCol).cast("string"),
        lit(") — priority sampling needs positive weights"))))
      .otherwise(col(weightCol).cast("long"))
    // the clamp must be decided BEFORE any division lands in a BIGINT:
    // Spark's DIV returns LONG, so an unclamped w·bound/(h+1) above 2^63
    // would overflow to NULL and silently drop the HEAVIEST items from the
    // heap — exactly the rows priority sampling must keep. Comparing the
    // cross-products (multiplication only, exact in DECIMAL(38):
    // w·bound ≤ 2^123 < 10^38) is equivalent to comparing the quotient
    // against the cap, and the surviving division is ≤ cap by construction.
    val prio = df
      .select(col(groupCol), col(idCol), h.as("__h"), wv.as("__w"))
      .withColumn("__q", expr(
        s"CASE WHEN CAST(__w AS DECIMAL(38,0)) * $hashBound > " +
          s"CAST(${PriorityCap} AS DECIMAL(38,0)) * (CAST(__h AS DECIMAL(38,0)) + 1) " +
          s"THEN ${PriorityCap}L " +
          s"ELSE (CAST(__w AS DECIMAL(38,0)) * $hashBound) DIV " +
          "(CAST(__h AS DECIMAL(38,0)) + 1) END"))
    val sample = prio.groupBy(col(groupCol))
      .agg(graft.functions.NativeAgg.topKPairs(col("__q"), col(idCol), k + 1)
        .as("__kept"))
      .select(col(groupCol),
        when(size(col("__kept")) > k,
          element_at(col("__kept"), k + 1).getField("v"))
          .otherwise(lit(0L)).as("__tau"),
        explode(slice(col("__kept"), 1, k)).as("__e"))
      .select(col(groupCol), col("__e.p").as(idCol), col("__tau"))
    prio.join(broadcast(sample), Seq(groupCol, idCol))
      .select(col(groupCol), col(idCol), col("__w").as("weight"),
        col("__q").as("priority"),
        greatest(col("__w"), col("__tau")).as("est_weight"))
  }

  def distinctSketch(
      df: DataFrame, groupCol: String, hashCol: String, k: Int,
      hashBound: Long): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(hashBound > 0, s"hashBound must be positive, got $hashBound")
    df.groupBy(col(groupCol))
      .agg(graft.functions.NativeAgg.kMinDistinct(col(hashCol), k).as("__mins"))
      .select(col(groupCol),
        size(col("__mins")).cast("long").as("n_kept"),
        when(size(col("__mins")) > 0, element_at(col("__mins"), -1)).as("kth_min"),
        when(size(col("__mins")) < k, size(col("__mins")).cast("long"))
          .otherwise(expr(
            s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * $hashBound) DIV " +
              "(CAST(element_at(__mins, -1) AS DECIMAL(38,0)) + 1) AS BIGINT)"))
          .as("est_distinct"))
  }

  def heavyHitters(
      df: DataFrame, textCol: String, k: Int,
      capacity: Int = 0): DataFrame = {
    val cap = if (capacity > 0) capacity else 2 * k
    require(cap >= k, "capacity must be >= k for the n/k guarantee")
    // occurrences feed both passes — tokenize once. NOT spread: the kernel
    // is a bare tokenize+explode, cheaper than the exchange a spread adds
    // (measured 0.49 → 0.88 s at sf0.1 when spread here)
    val occ = Caching.spillPersistEager(
      df.select(explode(TextFunctions.tokens(col(textCol))).as("term")))
    val row = occ.agg(
      graft.functions.NativeAgg.misraGries(xxhash64(col("term")), cap).as("cand"),
      count(lit(1)).as("n")).head()
    val cands = row.getSeq[Long](0)
    val n = row.getLong(1)
    occ.filter(xxhash64(col("term")).isin(cands: _*))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > n)
  }

  /** Per-(doc, term) statistics — the exact-integer core of TF-IDF:
    * tf counts OCCURRENCES in the doc, df counts DOCUMENTS containing the
    * term. One explode + two count shuffles (map-side combined); the
    * float idf weighting is left to the caller (log choices vary), so
    * every number here is engine-exact. */
  def termStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // not spread: tokenize+explode is cheaper than the exchange (measured
    // 0.4 → 1.0 s at sf0.1 with a spread here); the groupBys shuffle anyway
    val occ = df.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = occ.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfq = occ.select(col(idCol), col("term")).dropDuplicates(idCol, "term")
      .groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfq, "term").select(col(idCol), col("term"), col("tf"), col("df"))
  }

  /** BM25 lexical retrieval (Robertson/Sparck-Jones), top-k docs for a
    * literal term query — in EXACT integer arithmetic so any engine
    * reproduces the ranking bit-for-bit. Standard BM25 takes ln() in the
    * idf and float division in the length normalizer; two engines' libm
    * can differ in ULPs, which flips ranks on near-ties. This variant
    * keeps BM25's structure but replaces both with scaled truncating
    * integer division (matching DuckDB's `//` exactly):
    *
    *   idf_x1e3(t) = ((2·(N − df_t) + 1) · 1000) div (2·df_t + 1)
    *                 — the classic (N − df + 0.5)/(df + 0.5) ratio,
    *                 scaled instead of log-damped
    *   w_x1e6(t,d) = (tf·(k1N+k1D)·bD·TL·10^6)
    *                 div (tf·k1D·bD·TL + k1N·(bD−bN)·TL + k1N·bN·len·N)
    *                 — tf·(k1+1) / (tf + k1·(1−b + b·len/avglen)) with
    *                 k1 = k1N/k1D, b = bN/bD and avglen = TL/N, cleared of
    *                 denominators (TL = corpus token count)
    *   score_x1e6(d) = Σ_t (idf_x1e3 · w_x1e6) div 1000
    *
    * Defaults k1 = 12/10, b = 3/4 — the classic 1.2/0.75. Returns
    * (rank, doc_id, score_x1e6) for the k best (score desc, doc_id asc);
    * only docs containing ≥ 1 query term score.
    *
    * Shape at 100 TB: one corpus pass for per-doc lengths (narrow rows,
    * persisted), one for query-term occurrences — the isin filter runs
    * map-side, so only matching (doc, term) rows ever shuffle; df per term
    * is ≤ |q| rows (broadcast); the score is one aggregation keyed by doc
    * and the top-k is a TakeOrdered, never a full sort. Only the two
    * corpus totals (N, TL) reach the driver. Arithmetic bounds: the wide
    * products (tf·(k1N+k1D)·bD·TL·10^6 exceeds a long already at
    * tf·TL ≳ 10^11 — a few-billion-token corpus) run in DECIMAL(38,0),
    * mirrored by HUGEINT in the oracle: exact integer arithmetic on both
    * sides, identical values, safe to ~10^38 — far past any real corpus.
    * Per-term contributions and the per-doc sum stay longs (bounded by
    * idf ≤ (2N+1)·10^3/3 times w ≤ (k1+1)·10^6). */
  def bm25TopK(
      df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1Num: Int = 12, k1Den: Int = 10,
      bNum: Int = 3, bDen: Int = 4): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1Num >= 0 && k1Den > 0, "k1 must be a non-negative rational")
    require(bNum >= 0 && bDen > 0 && bNum <= bDen, "b must be in [0, 1]")
    val q = queryTerms.map(_.toLowerCase).distinct
    val toks = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("__t"))
    // narrow per-doc lengths, persisted: feeds the corpus totals AND the
    // per-doc normalizer join
    val lens = Caching.spillPersistEager(
      toks.select(col("doc_id"), size(col("__t")).cast("long").as("len")))
    val totRow = lens.agg(count(lit(1)).cast("long"), sum("len")).head()
    val nDocs = totRow.getLong(0)
    val totLen = Option(totRow.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
    if (nDocs == 0L || totLen == 0L)
      return lens.select(lit(0L).as("rank"), col("doc_id"),
        lit(0L).as("score_x1e6")).limit(0)
    val occ = toks.select(col("doc_id"), explode(col("__t")).as("term"))
      .filter(col("term").isin(q: _*))
    val tf = occ.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    bm25ScoreTopK(tf, lens, nDocs, totLen, k, k1Num, k1Den, bNum, bDen)
  }

  /** The BM25 scoring tail shared by [[bm25TopK]] (one-shot) and
    * [[bm25Serve]] (persisted index): `tf` is the query-filtered
    * (doc_id, term, tf) relation, `lens` the per-doc lengths. */
  private def bm25ScoreTopK(
      tf: DataFrame, lens: DataFrame, nDocs: Long, totLen: Long, k: Int,
      k1Num: Int, k1Den: Int, bNum: Int, bDen: Int): DataFrame = {
    // tf rows are distinct (doc, term) — df_t is a count over them; ≤ |q|
    // rows, broadcast into the scoring join
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val wNum = (k1Num + k1Den).toLong * bDen
    val wDen1 = k1Den.toLong * bDen
    val wDen2 = k1Num.toLong * (bDen - bNum)
    val wDen3 = k1Num.toLong * bNum
    // DECIMAL(38,0) intermediates: the tf·TL products overflow a long on
    // multi-billion-token corpora; IntegralDivide over decimals truncates
    // exactly like long `div` / DuckDB `//` and returns a long
    val scored = tf.join(broadcast(dfq), "term").join(lens, "doc_id")
      .select(col("doc_id"),
        expr("(CAST(((2 * (" + nDocs + "L - df) + 1) * 1000) div (2 * df + 1) " +
          "AS DECIMAL(38,0)) * " +
          s"((CAST(tf AS DECIMAL(38,0)) * ${wNum}L * ${totLen}L * 1000000) div " +
          s"(CAST(tf AS DECIMAL(38,0)) * ${wDen1}L * ${totLen}L + " +
          s"CAST(${wDen2}L AS DECIMAL(38,0)) * ${totLen}L + " +
          s"CAST(${wDen3}L AS DECIMAL(38,0)) * len * ${nDocs}L))) div 1000")
          .as("c"))
      .groupBy("doc_id").agg(sum("c").as("score_x1e6"))
      .orderBy(col("score_x1e6").desc, col("doc_id").asc).limit(k)
    scored.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score_x1e6").desc, col("doc_id").asc)).cast("long"))
      .select("rank", "doc_id", "score_x1e6")
  }

  /** PERSISTED inverted index for [[bm25TopK]]-style serving — the search
    * shape where the corpus is tokenized ONCE and every later query runs
    * against the stored postings: returns
    * (postings — (term, doc_id, tf), lens — (doc_id, len)). Together they
    * are the exact sufficient statistic for BM25: df(t) is a count over a
    * term's postings, and the corpus totals (N, TL) aggregate from the
    * narrow lens relation — nothing else is needed, so the index folds by
    * plain doc-disjoint union ([[bm25IndexFold]]).
    *
    * Postings are term-first: stored sorted/partitioned by term, a
    * query's `term IN (…)` filter pushes into the parquet scan and only
    * the probed terms' rows are ever read — the 100 TB serving property
    * ([[bm25Serve]]'s PlanCheck pin). */
  def bm25Index(df: DataFrame, idCol: String, textCol: String): (DataFrame, DataFrame) = {
    val toks = df.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("__t"))
    val lens = toks.select(col("doc_id"), size(col("__t")).cast("long").as("len"))
    val postings = toks.select(col("doc_id"), explode(col("__t")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .select(col("term"), col("doc_id"), col("tf"))
    (postings, lens)
  }

  /** Fold a new batch's index into a persisted one: plain unions — BUT
    * batch docs must be NEW (a re-ingested doc_id would double its
    * postings and silently inflate every score it touches), so the folded
    * lens carries a raise_error guard that fires if any batch doc already
    * exists. The guard rides the lens lineage: every serve aggregates
    * lens for (N, TL), so no query can be answered from a corrupted
    * fold. */
  def bm25IndexFold(
      postings: DataFrame, lens: DataFrame,
      batchPostings: DataFrame, batchLens: DataFrame): (DataFrame, DataFrame) = {
    requireBm25Index(postings, lens, "bm25IndexFold")
    requireBm25Index(batchPostings, batchLens, "bm25IndexFold (batch)")
    val guardedBatchLens = batchLens
      .join(lens.select(col("doc_id"), lit(1).as("__seen")), Seq("doc_id"), "left")
      .withColumn("len",
        when(col("__seen").isNotNull,
          raise_error(concat(lit("graft bm25Index: doc "),
            col("doc_id").cast("string"),
            lit(" is already indexed — re-ingesting would double its " +
              "postings; rebuild the index or dedup the batch upstream"))))
          .otherwise(col("len")))
      .select("doc_id", "len")
    (postings.unionByName(batchPostings), lens.unionByName(guardedBatchLens))
  }

  private def requireBm25Index(
      postings: DataFrame, lens: DataFrame, op: String): Unit = {
    require(postings.columns.toSeq == Seq("term", "doc_id", "tf"),
      s"$op expects postings (term, doc_id, tf), got ${postings.columns.mkString(", ")}")
    require(lens.columns.toSeq == Seq("doc_id", "len"),
      s"$op expects lens (doc_id, len), got ${lens.columns.mkString(", ")}")
  }

  /** Serve a BM25 top-k query from a PERSISTED [[bm25Index]] — identical
    * ranking to [[bm25TopK]] over the indexed corpus, with no
    * re-tokenization: the query terms filter the postings (pushed into
    * the parquet scan when the index is read from storage), df comes from
    * the filtered postings, and only the two corpus totals aggregate from
    * the narrow lens relation. */
  def bm25Serve(
      postings: DataFrame, lens: DataFrame,
      queryTerms: Seq[String], k: Int,
      k1Num: Int = 12, k1Den: Int = 10,
      bNum: Int = 3, bDen: Int = 4): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1Num >= 0 && k1Den > 0, "k1 must be a non-negative rational")
    require(bNum >= 0 && bDen > 0 && bNum <= bDen, "b must be in [0, 1]")
    requireBm25Index(postings, lens, "bm25Serve")
    val q = queryTerms.map(_.toLowerCase).distinct
    val totRow = lens.agg(count(lit(1)).cast("long"), sum("len")).head()
    val nDocs = totRow.getLong(0)
    val totLen = Option(totRow.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
    if (nDocs == 0L || totLen == 0L)
      return lens.select(lit(0L).as("rank"), col("doc_id"),
        lit(0L).as("score_x1e6")).limit(0)
    val tf = postings.filter(col("term").isin(q: _*))
      .select(col("doc_id"), col("term"), col("tf"))
    bm25ScoreTopK(tf, lens, nDocs, totLen, k, k1Num, k1Den, bNum, bDen)
  }

  /** SLIDING-WINDOW chunking with overlap — the RAG/context-window
    * chunker: each document splits into token windows of `chunkTokens`
    * starting every `strideTokens` (overlap = chunk − stride), the last
    * window clamped to the document end. Returns
    * (id, chunk_idx, n_tokens, chunk_text). A document whose normalized
    * text is empty emits ONE empty chunk — the house tokenizer yields
    * [""] for empty text, and the chunker follows it rather than
    * special-casing. Chunk starts are every multiple of the stride below the
    * token count — tail windows shorter than the overlap still emit
    * (deterministic contract; filter on n_tokens downstream if a model
    * needs minimum context).
    *
    * Shape at scale: pure per-row projection arithmetic — one tokenize,
    * a bounded `sequence` explode (⌈n/stride⌉ rows per doc, proportional
    * to output size), codegen slicing; no shuffle at all, so it pipelines
    * into whatever written layout follows. */
  def slidingChunks(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(strideTokens >= 1 && strideTokens <= chunkTokens,
      s"strideTokens must be in [1, chunkTokens], got $strideTokens")
    df.select(col(idCol),
        TextFunctions.tokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__t"),
        explode(expr(s"sequence(0, __n - 1, $strideTokens)")).as("__start"))
      .select(col(idCol),
        expr(s"CAST(__start DIV $strideTokens AS BIGINT)").as("chunk_idx"),
        expr(s"CAST(size(slice(__t, __start + 1, $chunkTokens)) AS BIGINT)")
          .as("n_tokens"),
        expr(s"array_join(slice(__t, __start + 1, $chunkTokens), ' ')")
          .as("chunk_text"))
  }

  /** Statistical (corpus-LM) novelty scoring — the integer-exact core of
    * CCNet-style language-model filtering: train a bigram model on the
    * corpus itself, score each document by how many of its bigrams are NOT
    * "common" (count ≥ an adaptive threshold of corpusBigrams/2000 + 1, so
    * the semantics scale with the corpus instead of degenerating at larger
    * sf). High novelty ≈ high perplexity under the corpus LM — the usual
    * quality/outlier filter signal — but every output is an exact integer
    * (counts and a truncating permille), so the result is hash-comparable
    * against an oracle, unlike float log-prob sums whose value depends on
    * summation order.
    *
    * Shape at scale: one tokenize pass feeds bigram explode; the model is
    * one count shuffle (map-side combined); scoring is one anti-join on the
    * bigram key (AQE broadcasts the common set when it is small) plus one
    * per-doc count shuffle. Nothing but the threshold scalar reaches the
    * driver. */
  def bigramNovelty(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val n1 = greatest(size(toks) - 1, lit(0))
    val bg = zip_with(
      slice(toks, lit(1), n1),
      slice(toks, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    val exploded = df.select(col(idCol), explode(bg).as("bg"))
    // the model (bigram → count) is small; persist it so the threshold scan
    // and the commonness filter don't re-tokenize the corpus
    val counts = Caching.spillPersistEager(
      exploded.groupBy("bg").agg(count(lit(1)).as("c")))
    val corpusBigrams = Option(counts.agg(sum(col("c"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val k = corpusBigrams / 2000L + 1L
    val common = counts.filter(col("c") >= k)
    val novel = exploded.join(common, Seq("bg"), "left_anti")
      .groupBy(idCol).agg(count(lit(1)).as("novel_bigrams"))
    df.select(col(idCol),
        greatest(size(toks) - 1, lit(0)).cast("long").as("total_bigrams"))
      .join(novel, Seq(idCol), "left")
      .na.fill(0L, Seq("novel_bigrams"))
      .select(col(idCol), col("total_bigrams"), col("novel_bigrams"),
        when(col("total_bigrams") > 0,
          expr("novel_bigrams * 1000 div total_bigrams"))
          .otherwise(0L).cast("long").as("novelty_permille"))
  }

  /** Corpus bigram language-model scoring — the CCNet-style "score
    * documents by LM likelihood, filter the tail" pretraining step,
    * re-expressed in EXACT integer arithmetic so any engine reproduces
    * it bit-for-bit (no float log-prob: two engines' `ln` can differ in
    * ULPs, which flips rounded outputs on boundary values). The model is
    * add-one-smoothed bigram conditional frequency trained ON the corpus:
    * per bigram p_x1e6 = (c(w1,w2) + 1) · 1e6 div (h(w1) + V), with
    * h(w1) = bigram-history occurrences and V = corpus vocabulary size;
    * per document lm_x1e6 = Σ p_x1e6 div n_bigrams. A low score means
    * the document's transitions are rare in the corpus — the same
    * rank-ordering signal as log-likelihood (integer div of a monotone
    * per-bigram statistic), exactly SQL-mirrorable.
    *
    * Shape at 100 TB: the exploded bigram stream is consumed three times
    * (count model, history model, scoring join) — persisted once, spill-
    * safe. Both count models are map-side-combinable groupBys (Zipfian
    * skew soaks into partial aggregation); the scoring joins are N:1
    * against aggregated sides, so no row ever fans out. Output:
    * (doc_id, n_bigrams, lm_x1e6) for every doc with ≥ 1 bigram. */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val n1 = greatest(size(toks) - 1, lit(0))
    val pairs = zip_with(
      slice(toks, lit(1), n1),
      slice(toks, lit(2), n1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val ex = Caching.spillPersistEager(
      df.select(col(idCol).as("doc_id"), explode(pairs).as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2")))
    val c2 = ex.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val hist = ex.groupBy("w1").agg(count(lit(1)).as("h"))
    val vocab = df.select(explode(toks).as("t")).agg(countDistinct("t")).head().getLong(0)
    ex.join(c2, Seq("w1", "w2"))
      .join(hist, Seq("w1"))
      .select(col("doc_id"),
        expr(s"(c2 + 1) * 1000000 div (h + ${vocab}L)").as("p"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("p").as("sp"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("sp div n_bigrams").cast("long").as("lm_x1e6"))
  }

  /** CROSS-corpus bigram LM scoring — the exact CCNet shape: the model
    * trains on a REFERENCE corpus (their Wikipedia-trained KenLM) and
    * scores a DIFFERENT target corpus (the crawl), where [[bigramLmScore]]
    * trains and scores the same corpus. Same integer-exact statistic:
    * p_x1e6 = (c_ref(w1,w2) + 1) · 1e6 div (h_ref(w1) + V_ref), with
    * bigrams the reference never saw taking the add-one-smoothed floor
    * (c=0, h=0) — a target doc full of transitions unseen in the clean
    * corpus scores low, which is the filter signal. With ref == target
    * this reduces to [[bigramLmScore]] exactly (every bigram then exists
    * in the model, so the left joins fill nothing).
    *
    * Shape at 100 TB: the model sides are map-side-combinable groupBys
    * over the REFERENCE (typically the small, curated side); scoring is
    * two N:1 left joins of the target bigram stream against aggregated
    * model sides — no row fans out, and only bigram pairs shuffle.
    * Output: (doc_id, n_bigrams, lm_x1e6) for target docs with ≥ 1
    * bigram. */
  def bigramLmScoreAgainst(
      ref: DataFrame, target: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def bigrams(df: DataFrame): DataFrame = {
      val toks = TextFunctions.tokens(col(textCol))
      val n1 = greatest(size(toks) - 1, lit(0))
      val pairs = zip_with(
        slice(toks, lit(1), n1),
        slice(toks, lit(2), n1),
        (a, b) => struct(a.as("w1"), b.as("w2")))
      df.select(col(idCol).as("doc_id"), explode(pairs).as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    }
    val exRef = Caching.spillPersistEager(bigrams(ref))
    val c2 = exRef.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val hist = exRef.groupBy("w1").agg(count(lit(1)).as("h"))
    val vocab = ref.select(explode(TextFunctions.tokens(col(textCol))).as("t"))
      .agg(countDistinct("t")).head().getLong(0)
    bigrams(target)
      .join(c2, Seq("w1", "w2"), "left").na.fill(0L, Seq("c2"))
      .join(hist, Seq("w1"), "left").na.fill(0L, Seq("h"))
      .select(col("doc_id"),
        expr(s"(c2 + 1) * 1000000 div (h + ${vocab}L)").as("p"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("p").as("sp"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("sp div n_bigrams").cast("long").as("lm_x1e6"))
  }

  /** Deterministic global shuffle + fixed-size shard assignment for
    * training export: every document gets a pseudo-random but REPRODUCIBLE
    * global rank (order by (lcg-mixed key, id) — same answer at any
    * partition count, any plan, any engine), and shards of exactly
    * `rowsPerShard` rows cut along that order — "shuffle the corpus with
    * seed S and write 8192-row shards" as one operator, without
    * `rand()`'s per-partition RNG state or a nondeterministic
    * `repartition`.
    *
    * Scale shape: the global rank is NOT a single-partition window (the
    * [[concatChunks]] trap). The shuffle key's value range [0, 2^31) is
    * cut into `buckets` equal-width slices — an ORDER-MONOTONIC prefix of
    * the sort order, so concatenating buckets in bucket order IS the
    * global order. Each bucket ranks locally after one hash shuffle; the
    * per-bucket counts (≤ `buckets` longs) become driver-side prefix
    * bases handed back as a broadcast join. The LCG mixes ids uniformly,
    * so buckets are balanced regardless of id clustering.
    *
    * Output: (id, shard, pos) with shard = rank div rowsPerShard and pos
    * the offset inside the shard. SQL mirror of the key (m = 2147483648),
    * for NON-NEGATIVE ids and seed — the regime of every oracle here:
    * {{{ (((id % m + seed) % m) * 1103515245 + 12345) % m }}}
    * then `row_number() OVER (ORDER BY key, id) - 1` for the rank.
    * (The Spark side uses `pmod`, so negative ids still shard correctly;
    * ANSI `%` is sign-preserving, so a general-id SQL mirror must wrap
    * each step as `((x % m) + m) % m` to match.) */
  def deterministicShards(
      df: DataFrame, idCol: String, seed: Long, rowsPerShard: Long,
      buckets: Int = 1024): DataFrame = {
    require(rowsPerShard > 0, "rowsPerShard must be positive")
    require(buckets > 0 && buckets <= (1 << 20), "buckets must be in [1, 2^20]")
    val spark = df.sparkSession
    val m = 2147483648L
    // key ∈ [0, m): the seed shifts the id BEFORE the LCG multiply — a
    // post-multiply "+ seed" would only rotate the key space and leave the
    // relative order (the actual shuffle) seed-independent. The id is
    // reduced mod m first, so the product stays ≤ 2^62 and ANSI overflow
    // cannot fire; pmod keeps negative ids non-negative like the SQL
    // mirror's `% m + m` form
    val key = pmod(pmod(pmod(col(idCol).cast("long"), lit(m))
      + (seed % m), lit(m)) * 1103515245L + 12345L, lit(m))
    val width = m / buckets + (if (m % buckets == 0) 0L else 1L)
    val base = df.select(col(idCol), key.as("__key"))
      .withColumn("__bk", (col("__key") / width).cast("int"))
      .repartition(math.min(buckets, spark.sessionState.conf.numShufflePartitions
        max 1), col("__bk"))
    val counted = Caching.spillPersistEager(base)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__bk").orderBy(col("__key"), col(idCol))
    val local = counted.withColumn("__rn",
      row_number().over(w).cast("long") - 1L)
    val totals = counted.groupBy("__bk").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bases: Seq[(Int, Long)] = {
      val sorted = totals.keys.toSeq.sorted
      sorted.zip(sorted.scanLeft(0L)((acc, b) => acc + totals(b)).init)
    }
    import spark.implicits._
    val baseDf = bases.toDF("__bk", "__base")
    local.join(broadcast(baseDf), Seq("__bk"))
      .withColumn("__rank", col("__rn") + col("__base"))
      // integer DIV: ranks can exceed 2^53 at extreme scale, double `/`
      // would round shard boundaries
      .select(col(idCol), expr(s"__rank DIV ${rowsPerShard}L").as("shard"),
        pmod(col("__rank"), lit(rowsPerShard)).as("pos"))
  }

  /** Corpus DATA CARD: the one-aggregation summary every dataset release
    * ships — document/token/char counts, exact distinct-content count and
    * duplicate rate, and per-language doc counts. One narrow pass + one
    * count-distinct shuffle (the md5 fingerprint is the distinct key, so
    * partial aggregation soaks the Zipf head). Returns tidy (metric,
    * value) rows; languages appear as `docs_lang_<lang>`. All integers —
    * exact at any scale (the dup rate is a per-mille integer). */
  def corpusCard(df: DataFrame, idCol: String, textCol: String,
      langCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol),
      TextFunctions.fingerprint(col(textCol)).as("__fp"),
      TextFunctions.tokenCount(col(textCol)).as("__tok"),
      length(col(textCol)).cast("long").as("__ch"),
      langCol.map(c => col(c)).getOrElse(lit(null).cast("string")).as("__lang"))
    // sums are null on an empty corpus — coalesce so the card reads zeros
    val row = base.agg(
      count(lit(1)).as("docs"),
      coalesce(sum("__tok"), lit(0L)).as("tokens"),
      coalesce(sum("__ch"), lit(0L)).as("chars"),
      countDistinct("__fp").as("distinct_docs")).head()
    val (docs, tokens, chars, distinct) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val core = Seq(
      ("docs", docs), ("tokens", tokens), ("chars", chars),
      ("distinct_docs", distinct),
      ("dup_rate_x1000", if (docs == 0) 0L else (docs - distinct) * 1000L / docs))
    val langs =
      if (langCol.isEmpty) Seq.empty[(String, Long)]
      else base.groupBy("__lang").agg(count(lit(1)).as("n"))
        .collect().map(r => (s"docs_lang_${Option(r.getString(0)).getOrElse("null")}",
          r.getLong(1))).toSeq
    (core ++ langs).toDF("metric", "value")
  }

  /** Deterministic train/val/test split labels — pure function of the id
    * (LCG-mixed, same generator as [[deterministicShards]]) so the split
    * is stable across runs, engines, and partitionings, with no sampling
    * state. `valPerMille`/`testPerMille` select by mixed-key residue mod
    * 1000. Returns (id, split ∈ train|val|test). */
  def splitLabels(
      df: DataFrame, idCol: String, seed: Long,
      valPerMille: Int, testPerMille: Int): DataFrame = {
    require(valPerMille >= 0 && testPerMille >= 0 &&
      valPerMille + testPerMille <= 1000, "per-mille fractions must fit in [0, 1000]")
    val m = 2147483648L
    val key = pmod(pmod(pmod(col(idCol).cast("long"), lit(m))
      + (seed % m), lit(m)) * 1103515245L + 12345L, lit(m))
    val bucket = pmod(key, lit(1000L))
    df.select(col(idCol),
      when(bucket < valPerMille, lit("val"))
        .when(bucket < valPerMille + testPerMille, lit("test"))
        .otherwise(lit("train")).as("split"))
  }

  /** Sliding-window document chunking — the long-document preparation step
    * (sequence models want ≤ `chunkTokens`-token pieces; `overlap` tokens
    * of context carry across adjacent chunks). Chunk i of a document
    * covers normalized-token positions [i·step, i·step + chunkTokens) with
    * step = chunkTokens − overlap; the last chunk may be short, and every
    * document yields ≥ 1 chunk. Returns (id, chunk_idx, chunk_text,
    * n_tokens). Pure per-row fan-out (posexplode over a computed
    * sequence) — no shuffle, no state; at 100 TB this is a narrow map
    * whose output is ~(1 + overlap/step)× the corpus. */
  def chunkDocs(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap ($overlap) must be in [0, chunkTokens)")
    val step = chunkTokens - overlap
    // null-text docs yield ZERO chunks (size(null) = -1 would otherwise
    // make sequence(0, -1) count DOWN and emit two spurious null chunks);
    // the greatest(0, …) clamp keeps degenerate token arrays at one chunk
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        TextFunctions.tokens(col(textCol)).as("__tk"))
      .select(col(idCol), col("__tk"),
        posexplode(sequence(lit(0), greatest(lit(0),
          floor((size(col("__tk")) - 1) / step)).cast("int"))).as(Seq("chunk_idx", "__i")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("__tk"), col("chunk_idx") * step + 1,
          lit(chunkTokens))).as("chunk_text"),
        size(slice(col("__tk"), col("chunk_idx") * step + 1,
          lit(chunkTokens))).cast("long").as("n_tokens"))
  }

  /** EXACT distributed ordinary-least-squares fit — train the quality
    * model ON the cluster, reproducibly. Features and label must be
    * INTEGER-valued columns (counts, capped ratios — the standard quality
    * signals), so the normal equations X'X w = X'y accumulate as EXACT
    * long sums in ONE map-side-combinable aggregation over the corpus
    * (d(d+3)/2 scalars — no matrix library, no per-row state, no second
    * pass), and the d×d solve happens driver-side in BigInt via Cramer's
    * rule — no floating point anywhere, so any engine reproduces the
    * weights bit-for-bit (float summation order differs across engines
    * and run-to-run; integer sums cannot).
    *
    * Returns (feature, w_x1000): each weight as floor-magnitude
    * (truncate-toward-zero, BigInt `/` ≡ DuckDB HUGEINT `//`) thousandths
    * — the same fixed-point convention the scoring kernel
    * ([[graft.functions.NativeHash.linearTextScore]]-style appliers)
    * consumes. An `intercept` row leads. Rows with a NULL feature or
    * label are excluded (they'd poison the sums).
    *
    * 100 TB: the corpus pass is a single narrow scan + partial agg; the
    * driver solve is O(d·d!) BigInt work on d ≤ ~6 features. Overflow:
    * long moment sums are exact while Σ f·f' < 2^63 (cap features so
    * max|f|²·N stays under ~9e18 — e.g. 255-capped counts support 140
    * trillion rows); the BigInt solve itself cannot overflow. */
  def fitLinearModelX1000(
      df: DataFrame, features: Seq[(String, Column)],
      label: Column): DataFrame = {
    val spark = df.sparkSession
    require(features.nonEmpty, "need at least one feature")
    val d = features.size + 1
    val xs: Seq[Column] = lit(1L) +: features.map(_._2.cast("long"))
    val y = label.cast("long")
    val clean = df.filter(y.isNotNull && xs.tail.map(_.isNotNull).reduce(_ && _))
    val pairs = for { i <- 0 until d; j <- i until d } yield (i, j)
    val aggs = pairs.map { case (i, j) => sum(xs(i) * xs(j)).as(s"m_${i}_$j") } ++
      (0 until d).map(i => sum(xs(i) * y).as(s"v_$i"))
    val row = clean.agg(aggs.head, aggs.tail: _*).head()
    // all moment sums are null iff no row survived the null filter — fail
    // with the documented contract instead of an NPE in getLong
    require(!row.isNullAt(0),
      "fitLinearModelX1000 needs at least one row with non-null features and label")
    val idx = pairs.zipWithIndex.toMap
    def m(i: Int, j: Int): BigInt =
      BigInt(row.getLong(idx(if (i <= j) (i, j) else (j, i))))
    val a = Array.tabulate(d, d)((i, j) => m(i, j))
    val b = Array.tabulate(d)(i => BigInt(row.getLong(pairs.size + i)))
    def det(mat: Array[Array[BigInt]]): BigInt = mat.length match {
      case 1 => mat(0)(0)
      case n =>
        (0 until n).foldLeft(BigInt(0)) { (acc, c) =>
          val minor = mat.tail.map(r => r.patch(c, Nil, 1))
          val term = mat(0)(c) * det(minor)
          if (c % 2 == 0) acc + term else acc - term
        }
    }
    val detA = det(a)
    require(detA != 0,
      "singular normal equations — features are linearly dependent on this corpus")
    val names = "intercept" +: features.map(_._1)
    val rows = (0 until d).map { i =>
      val ai = Array.tabulate(d, d)((r, c) => if (c == i) b(r) else a(r)(c))
      // BigInt `/` truncates toward zero — DuckDB HUGEINT `//` semantics
      (names(i), ((det(ai) * 1000) / detA).toLong)
    }
    import spark.implicits._
    rows.toDF("feature", "w_x1000")
  }

  /** Train a byte-pair-encoding merge table on the corpus — the Sennrich
    * et al. 2016 algorithm in its word-HISTOGRAM form: ONE distributed
    * pass tokenizes to (distinct word, frequency) (one shuffle; the
    * histogram is orders of magnitude smaller than the corpus,
    * Zipf-partials map-side, and hard-capped at `maxVocabWords` rows), the
    * capped histogram collects ONCE, and the merge loop runs DRIVER-SIDE
    * over it — the standard trainer shape (the histogram is small by
    * construction; a per-merge Spark job would serialize 32 000 rounds of
    * driver latency for a real vocab, days of wall-clock for work the
    * driver does in seconds).
    *
    * Per round: take the most frequent adjacent pair (count desc, pair
    * asc — deterministic tie-break), then re-segment ONLY the words whose
    * current segmentation contains the merged pair adjacently, with the
    * SAME greedy lowest-rank-first kernel the distributed apply uses
    * ([[graft.functions.HashKernels.bpeEncode]]) — a word without the
    * adjacency segments identically under the grown table (the new merge
    * has the highest rank, so greedy only ever reaches it where nothing
    * else applies and the pair is adjacent), so pair counts update
    * incrementally and exactly. Returns the merges in rank order, ready
    * for [[TextFunctions.bpeTokens]]/[[TextFunctions.bpeTokenCount]].
    *
    * 100 TB: the corpus pass happens once (the histogram groupBy); the
    * driver loop touches ≤ `maxVocabWords` words (capping bounds memory
    * and round cost at gigascale — standard practice, and EXACT for any
    * pair whose count within the kept words already exceeds the dropped
    * tail). */
  def bpeTrainMerges(
      df: DataFrame, textCol: String, numMerges: Int,
      maxVocabWords: Int = 1000000): Seq[(String, String)] = {
    val hist: Array[(String, Long)] =
      df.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w").asc).limit(maxVocabWords)
        .collect().map(r => (r.getString(0), r.getLong(1)))
    trainMergesDriver(hist, numMerges)
  }

  /** Driver-side BPE merge loop over a (word, freq) histogram — exact,
    * incremental pair-count bookkeeping (see [[bpeTrainMerges]]). */
  private[graft] def trainMergesDriver(
      hist: Array[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    // initial segmentation = code points (what greedy with no merges yields)
    val segs: Array[Array[String]] = hist.map { case (w, _) =>
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var k = 0
      while (k < w.length) {
        val cp = w.codePointAt(k)
        out += new String(Character.toChars(cp))
        k += Character.charCount(cp)
      }
      out.toArray
    }
    val cnt = new java.util.HashMap[String, java.lang.Long]()
    // sparse pair → word-index sets (a BitSet per pair would be 125 KB
    // per distinct pair at a 1M-word vocab)
    val occ = new java.util.HashMap[String, java.util.HashSet[Integer]]()
    def applyPairs(i: Int, sign: Long): Unit = {
      val tk = segs(i); val n = hist(i)._2
      val boxed = Integer.valueOf(i)
      var x = 0
      while (x < tk.length - 1) {
        val p = tk(x) + " " + tk(x + 1)
        val c = cnt.merge(p, java.lang.Long.valueOf(sign * n), (a, b) =>
          java.lang.Long.valueOf(a.longValue() + b.longValue()))
        if (c.longValue() <= 0) cnt.remove(p)
        if (sign > 0) {
          occ.computeIfAbsent(p, _ => new java.util.HashSet[Integer]()).add(boxed)
        } else {
          val s = occ.get(p)
          if (s != null) { s.remove(boxed); if (s.isEmpty) occ.remove(p) }
        }
        x += 1
      }
    }
    segs.indices.foreach(applyPairs(_, 1L))
    val ranks = new java.util.HashMap[String, Integer]()
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // best pair: count desc, pair-string asc (same order the SQL form used)
      var bestP: String = null
      var bestC = 0L
      cnt.forEach { (p, c) =>
        if (c.longValue() > bestC ||
          (c.longValue() == bestC && bestP != null && p.compareTo(bestP) < 0)) {
          bestP = p; bestC = c.longValue()
        }
      }
      if (bestP == null) exhausted = true
      else {
        val Array(a, b) = bestP.split(" ", 2)
        merges += ((a, b))
        ranks.put(bestP, Integer.valueOf(round))
        // only words currently containing the adjacency can change
        val touched = occ.get(bestP)
        if (touched != null) {
          val idxs = touched.asScala.toArray.map(_.intValue())
          idxs.foreach { i =>
            applyPairs(i, -1L)
            val seg = graft.functions.HashKernels.bpeEncode(
              org.apache.spark.unsafe.types.UTF8String.fromString(hist(i)._1), ranks)
            segs(i) = (0 until seg.numElements())
              .map(j => seg.getUTF8String(j).toString).toArray
            applyPairs(i, 1L)
          }
        }
      }
      round += 1
    }
    merges.toSeq
  }

  /** DSIR-style importance scores for data selection (hashed n-gram
    * importance weighting, after the public DSIR recipe — "Data Selection
    * for Language Models via Importance Resampling", Xie et al. 2023):
    * rank the SOURCE documents (rows where `isTarget` is false) by how
    * target-like their hashed-bigram profile is.
    *
    * Features are adjacent-token bigrams of the normalized text, hashed to
    * a 4096-way key = the first 3 hex chars of md5(bigram) — a string key
    * both engines compute identically, so the contract is integer-exact.
    * Per-feature importance weight (floor division, all BIGINT):
    *   w_f = ((target_count_f + 1) · scale) div (source_count_f + 1)
    * (+1 Laplace smoothing on both histograms); a document's score is the
    * sum of w_f over its bigram OCCURRENCES. Documents with fewer than two
    * tokens have no bigrams and no score row.
    *
    * Scale shape (100 TB): ONE pass over the corpus builds the exploded
    * (id, tgt, feature) postings (persisted); the two histograms are a
    * 4096-row map-side-combinable agg; scoring re-reads the postings with
    * the weight table BROADCAST, so corpus text is never shuffled — the
    * only doc-keyed exchange carries (id, partial score) pairs with
    * map-side combine. Overflow bound: Long holds w_f sums while the
    * target corpus stays under ~9·10¹² bigrams at the default scale —
    * targets in importance resampling are small by construction.
    * Returns (id, n_bigrams, dsir_score) for source docs. */
  def dsirScores(
      df: DataFrame, idCol: String, textCol: String, isTarget: Column,
      scale: Long = 1000000L): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    val toks = TextFunctions.tokens(col("__gr_text"))
    val n = size(toks)
    val bigrams = zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val posting = Caching.spillPersistEager(
      Caching.spread(df.select(col(idCol).as("id"), isTarget.as("tgt"),
          col(textCol).as("__gr_text")))
        .select(col("id"), col("tgt"), explode(bigrams).as("bg"))
        .select(col("id"), col("tgt"),
          substring(md5(col("bg").cast("binary")), 1, 3).as("f")))
    val hist = posting.groupBy("f").agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("tf"),
      sum(when(col("tgt"), 0L).otherwise(1L)).as("sf"))
    val weights = hist.select(col("f"),
      expr(s"((tf + 1L) * ${scale}L) div (sf + 1L)").as("wf"))
    posting.filter(!col("tgt"))
      .join(broadcast(weights), Seq("f"))
      .groupBy("id").agg(
        count(lit(1)).as("n_bigrams"),
        sum("wf").as("dsir_score"))
  }

  /** Top-`k` most target-like source documents under [[dsirScores]] —
    * deterministic total order (score desc, id asc), planned as a
    * TakeOrdered (no global sort materialization). The greedy top-k is the
    * exact-oracle stand-in for DSIR's gumbel resampling step: sampling
    * needs randomness, selection needs only the ranking. The seeded
    * sampling step itself is [[dsirSample]]. */
  def dsirSelect(
      df: DataFrame, idCol: String, textCol: String, isTarget: Column,
      k: Int, scale: Long = 1000000L): DataFrame =
    dsirScores(df, idCol, textCol, isTarget, scale)
      .orderBy(col("dsir_score").desc, col("id").asc).limit(k)

  /** Quantization width of [[dsirExpTableX1e6]]: the 31-bit LCG key space
    * splits into this many equal buckets (key div 2²¹ indexes the table). */
  private[graft] val DsirSampleBuckets = 1024

  /** ⌊−ln((b + 0.5)/B) · 10⁶⌋ for b ∈ [0, B): the integer-quantized
    * standard-exponential sample [[dsirSample]] draws per document.
    * StrictMath (fdlibm — bit-specified on every JVM) computes it once;
    * the DuckDB oracle embeds these SAME integers literally (a VALUES
    * table generated from this array), so no engine ever evaluates a
    * transcendental at query time and the contract stays integer-exact.
    * Range: 7 (b = B−1) … 7,624,618 (b = 0). */
  private[graft] lazy val dsirExpTableX1e6: IndexedSeq[Long] =
    (0 until DsirSampleBuckets).map(b => math.floor(
      -StrictMath.log((b + 0.5) / DsirSampleBuckets) * 1e6).toLong)

  /** SEEDED DSIR resampling — the sampling step of the public DSIR recipe
    * (Xie et al. 2023 resample ∝ importance weight; [[dsirSelect]] is the
    * deterministic-ranking stand-in): draw `k` source documents WITHOUT
    * replacement with probability proportional to their [[dsirScores]]
    * importance score, deterministically from `seed`.
    *
    * Mechanism — gumbel-top-k via the EXPONENTIAL RACE equivalence
    * (Efraimidis–Spirakis): keeping the k smallest e_i / w_i with
    * e_i ~ Exp(1) selects exactly like keeping the k largest
    * ln(w_i) + Gumbel_i, and needs ONE transcendental draw instead of
    * two. Here e_i is quantized: the house LCG mixes (id, seed) into a
    * 31-bit key, the key's high bits pick one of [[DsirSampleBuckets]]
    * equal-probability buckets, and the bucket's ⌊−ln((b+0.5)/B)·10⁶⌋
    * value comes from the PRECOMPUTED integer table — so the ranking key
    * e_i / w_i is a division of two exact integers (each < 2⁵³),
    * correctly rounded identically by every IEEE-754 engine: the
    * selection replays bit-for-bit in a SQL oracle with the same embedded
    * table, and is a pure function of (id, seed) — stable under any
    * partitioning, plan, or engine. Ties (same bucket AND same score)
    * break by id. Quantization truncates each draw to its bucket's
    * representative (1/B probability mass each) — the sampling law is
    * exact over bucket representatives and converges to the continuous
    * gumbel law as B grows; determinism and replayability are exact at
    * any B. Zero-score documents carry zero sampling probability and are
    * excluded structurally. Planned as a TakeOrdered over the scored
    * relation — no global sort, nothing driver-side but the k winners.
    * Returns (id, n_bigrams, dsir_score) like [[dsirSelect]]. */
  def dsirSample(
      df: DataFrame, idCol: String, textCol: String, isTarget: Column,
      k: Int, seed: Long = 0L, scale: Long = 1000000L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val m = 2147483648L
    val width = m / DsirSampleBuckets
    val key = pmod(pmod(pmod(col("id").cast("long"), lit(m))
      + (seed % m), lit(m)) * 1103515245L + 12345L, lit(m))
    // bucket = key div width, computed exactly in double space: the
    // numerator is an exact multiple of width and both operands are
    // < 2³¹, so the division is exact and the cast cannot misround
    val bucket = ((key - pmod(key, lit(width))) / lit(width)).cast("int")
    dsirScores(df, idCol, textCol, isTarget, scale)
      .filter(col("dsir_score") > 0L)
      .withColumn("__gr_e",
        element_at(typedLit(dsirExpTableX1e6), bucket + 1))
      .withColumn("__gr_race",
        col("__gr_e").cast("double") / col("dsir_score").cast("double"))
      .orderBy(col("__gr_race").asc, col("id").asc).limit(k)
      .select(col("id"), col("n_bigrams"), col("dsir_score"))
  }

  /** CCNet-style per-group score bucketing (head/middle/tail at the
    * default k = 3): each group's INTEGER score distribution is cut into
    * `k` equal-mass buckets by threshold scores, and every row is
    * assigned `1 + (number of thresholds strictly below its score)` —
    * ascending buckets, ties always sharing a bucket (the CCNet contract:
    * cuts are on score VALUES computed from the distribution, not exact
    * row-count quantiles, so equal scores are never split). Threshold j
    * is the smallest score whose ascending cumulative count satisfies
    * `cum · k ≥ j · total` — pure integer arithmetic, replayable in SQL.
    *
    * Scale shape (100 TB): NO per-group window — "PARTITION BY language"
    * over a corpus is the textbook single-reducer trap (one language can
    * be half the corpus). Instead ONE map-side-combinable count over
    * (group, score) — bounded by distinct pairs, cap-guarded with a loud
    * refusal, not by corpus rows — cumulates driver-side into per-group
    * threshold arrays that ride the closure into a broadcast join, and
    * the assignment is one map-only projection. Returns the input plus a
    * `bucket` column. */
  def scoreBuckets(
      df: DataFrame, scoreCol: String, groupCol: String, k: Int = 3,
      maxHistRows: Int = 1000000): DataFrame = {
    require(k >= 2, s"k must be at least 2, got $k")
    require(maxHistRows > 0, s"maxHistRows must be positive, got $maxHistRows")
    val spark = df.sparkSession
    import spark.implicits._
    // any atomic group type works: the histogram and the join key are both
    // the group cast to string (1:1 for the usual int/long domain ids).
    // NULL group or NULL score rows are excluded from the histogram (a NULL
    // can't rank in a score distribution) and pass through with bucket NULL.
    val gStr = col(groupCol).cast("string")
    val hist = df
      .filter(gStr.isNotNull && col(scoreCol).isNotNull)
      .groupBy(gStr.as("__g"), col(scoreCol).cast("long").as("__s"))
      .agg(count(lit(1)).as("__c"))
      .limit(maxHistRows + 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    if (hist.length > maxHistRows)
      throw new IllegalStateException(
        s"scoreBuckets: more than $maxHistRows distinct (group, score) pairs — " +
          "refusing a truncated histogram (coarsen the score or raise maxHistRows)")
    val cuts: Seq[(String, Seq[Long])] = hist.groupBy(_._1).map { case (g, rows) =>
      val sorted = rows.sortBy(_._2)
      val total = sorted.map(_._3).sum
      var cum = 0L
      val cumBy = sorted.map { case (_, s, c) => cum += c; (s, cum) }
      val cs = (1 until k).map { j =>
        // smallest score with cum·k ≥ j·total (BigInt: no overflow at any corpus size)
        cumBy.find { case (_, cm) => BigInt(cm) * k >= BigInt(j) * total }.get._1
      }
      g -> cs
    }.toSeq
    val cutsDf = broadcast(cuts.toDF("__g", "__cuts"))
    // LEFT join: every input row survives — null/unseen groups get __cuts
    // NULL, and 1 + size(NULL) / a NULL score comparison both yield bucket
    // NULL (size(NULL) is NULL; a NULL score never enters the lambda filter)
    df.join(cutsDf, gStr === col("__g"), "left")
      .withColumn("bucket",
        when(col(scoreCol).isNull, lit(null).cast("long")).otherwise(
          (lit(1) + size(filter(col("__cuts"),
            c => col(scoreCol).cast("long") > c))).cast("long")))
      .drop("__g", "__cuts")
  }

  /** Fixed `segWords`-word-group segmentation of `textCol`, positionally
    * complete: ⌈len/segWords⌉ segments, the last one short, ≥ 1 segment for
    * any text (the empty string is its own single segment). The word-group
    * stands in for a "line" in corpora without line structure — the unit of
    * [[boilerplateSegments]]/[[removeBoilerplate]]. SQL mirror (1-based
    * inclusive slices): `t[i*W+1 : i*W+W]` for i in [0, ⌈len/W⌉). */
  private[graft] def segmentArray(textCol: Column, segWords: Int): Column = {
    require(segWords > 0, s"segWords must be positive, got $segWords")
    val toks = split(textCol, " ")
    // integer ceil; both operands are exact in double space (counts < 2^31)
    val nseg = ((size(toks) + (segWords - 1)) / segWords).cast("int")
    transform(sequence(lit(0), greatest(nseg, lit(1)) - 1),
      i => array_join(slice(toks, i * segWords + 1, lit(segWords)), " "))
  }

  /** WITHIN-document segment dedup — the Gopher/MassiveText "remove
    * duplicated paragraphs within a document" rule, with fixed word-groups
    * as the paragraph unit (the same segment contract as
    * [[boilerplateSegments]]): every repeat of an earlier segment in the
    * SAME document is dropped, first occurrences keep their order
    * (`array_distinct` preserves first-occurrence order). Distinct from
    * [[removeBoilerplate]] (cross-corpus frequency) and from token-level
    * dedup (a repeated 8-word paragraph of individually-common words is
    * invisible to both). Pure per-row projection — nothing shuffles at any
    * corpus size. Returns (idCol, clean_text, n_segments, n_removed). */
  def dedupSegmentsWithinDoc(
      df: DataFrame, idCol: String, textCol: String, segWords: Int = 8): DataFrame = {
    val segs = segmentArray(col(textCol), segWords)
    val kept = array_distinct(segs)
    df.select(col(idCol),
      array_join(kept, " ").as("clean_text"),
      size(segs).cast("long").as("n_segments"),
      (size(segs) - size(kept)).cast("long").as("n_removed"))
  }

  /** Corpus-frequent BOILERPLATE segments: the `segWords`-word groups that
    * appear in ≥ `minDocs` DISTINCT documents — the CCNet/RefinedWeb
    * frequent-line filter list (headers, footers, cookie banners, license
    * blurbs), built exactly in two passes.
    *
    * Pass 1 censuses 8-byte segment HASHES over per-document-DISTINCT
    * segments: only (hash) longs shuffle, with map-side combine soaking the
    * Zipfian head — document text never shuffles. Pass 2 recounts ONLY the
    * candidate hashes' RAW segment strings (again per-doc-distinct, again
    * map-side combinable), so a hash collision can only promote an extra
    * candidate that the string-keyed recount then judges exactly — a
    * collision can never remove an innocent segment. The result is small by
    * construction (≤ total_segments / minDocs) and additionally bounded by
    * `maxBoilerplate`: exceeding it throws rather than silently truncating
    * the filter list (a truncated list would UNDER-clean — the failure mode
    * must be loud). Returns the boilerplate segment strings, sorted. */
  def boilerplateSegments(
      df: DataFrame, idCol: String, textCol: String,
      segWords: Int = 8, minDocs: Int = 10,
      maxBoilerplate: Int = 100000): Array[String] = {
    require(minDocs >= 2, s"minDocs must be at least 2, got $minDocs")
    require(maxBoilerplate > 0, s"maxBoilerplate must be positive, got $maxBoilerplate")
    // tokenize+segment ONCE: both census passes re-read the persisted
    // (hash, seg) postings instead of re-splitting the corpus text (the
    // dsirScores posting pattern — pass 2 was a full second tokenize)
    val postings = Caching.spillPersistEager(
      df.select(col(idCol).as("id"),
          explode(array_distinct(segmentArray(col(textCol), segWords))).as("seg"))
        .select(xxhash64(col("seg")).as("h"), col("seg")))
    val candidates = postings
      .groupBy("h").agg(count(lit(1)).as("hdf"))
      .filter(col("hdf") >= minDocs)
      .select("h").limit(maxBoilerplate + 1)
      .collect().map(_.getLong(0))
    if (candidates.length > maxBoilerplate)
      throw new IllegalStateException(
        s"boilerplateSegments: more than $maxBoilerplate candidate segments at " +
          s"minDocs=$minDocs — refusing to truncate the filter list (raise " +
          "maxBoilerplate or minDocs)")
    if (candidates.isEmpty) return Array.empty
    candidateRecount(postings, candidates)
      .groupBy("seg").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select("seg").collect().map(_.getString(0))
      .sorted
  }

  /** Pass-2 candidate pruning: keep postings whose hash is in the
    * candidate set — a typed InSet probe, NOT `.isin(...)`: at the 100k
    * cap an In(...) literal list is a 100k-arm expression tree the driver
    * spends seconds analyzing before the optimizer collapses it; InSet is
    * the collapsed form directly (O(1) hash probe per row, codegen'd). */
  private[graft] def candidateRecount(
      postings: DataFrame, candidates: Array[Long]): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val candSet: Set[Any] =
      candidates.iterator.map(l => java.lang.Long.valueOf(l): Any).toSet
    postings.filter(Bridge.column(
      org.apache.spark.sql.catalyst.expressions.InSet(
        Bridge.expression(col("h")), candSet)))
  }

  /** Per-document-DISTINCT segment census: (seg, df) with df counting
    * documents. THE incremental-maintenance shape for a rolling corpus:
    * census each INGEST BATCH as it arrives (cost ∝ batch, map-side
    * combinable) and fold it into a stored census with
    * [[segmentCensusMerge]] — old text is never re-scanned, and
    * [[boilerplateFromCensus]] re-derives the filter list from the fold
    * alone. The census is ONE row per distinct segment (the same
    * row-per-key contract as the persisted MinHash/IVF indexes); a merge
    * shuffles distinct segments, never documents. For a one-shot corpus
    * prefer [[boilerplateSegments]], whose hash-pruned first pass avoids
    * shuffling segment strings at all. */
  def segmentCensus(
      df: DataFrame, idCol: String, textCol: String, segWords: Int = 8): DataFrame =
    df.select(col(idCol).as("id"),
        explode(array_distinct(segmentArray(col(textCol), segWords))).as("seg"))
      .groupBy("seg").agg(count(lit(1)).as("df"))

  /** Fold a batch census into a stored one (union + sum; exact as long as
    * batches partition the corpus by document — each doc censused once). */
  def segmentCensusMerge(stored: DataFrame, batch: DataFrame): DataFrame =
    stored.unionByName(batch).groupBy("seg").agg(sum("df").as("df"))

  /** The boilerplate filter list from a (merged) census — same threshold,
    * cap, and loud refusal as [[boilerplateSegments]], no corpus scan. */
  def boilerplateFromCensus(
      census: DataFrame, minDocs: Int = 10,
      maxBoilerplate: Int = 100000): Array[String] = {
    require(minDocs >= 2, s"minDocs must be at least 2, got $minDocs")
    require(maxBoilerplate > 0, s"maxBoilerplate must be positive, got $maxBoilerplate")
    val hot = census.filter(col("df") >= minDocs)
      .select("seg").limit(maxBoilerplate + 1)
      .collect().map(_.getString(0))
    if (hot.length > maxBoilerplate)
      throw new IllegalStateException(
        s"boilerplateFromCensus: more than $maxBoilerplate segments at " +
          s"minDocs=$minDocs — refusing to truncate the filter list (raise " +
          "maxBoilerplate or minDocs)")
    hot.sorted
  }

  /** Strip a boilerplate filter list out of every document — ONE shuffle-free
    * projection: segments are rebuilt positionally, membership-tested against
    * the set (an InSet hash probe, O(1) per segment, codegen'd), and the
    * survivors re-joined. Within-doc repeats of a boilerplate segment all go;
    * order and repeats of surviving segments are preserved; a document that
    * was pure boilerplate keeps its row with empty text (dropping it is the
    * caller's policy decision). At 100 TB this is a map-only pass — the
    * filter list rides the closure, no join, no exchange. Returns
    * (idCol, clean_text, n_segments, n_removed). */
  def removeBoilerplate(
      df: DataFrame, idCol: String, textCol: String,
      boilerplate: Seq[String], segWords: Int = 8): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.InSet
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.graft.Bridge
    val hset: Set[Any] = boilerplate.iterator
      .map(s => UTF8String.fromString(s): Any).toSet
    val segs = segmentArray(col(textCol), segWords)
    val kept =
      if (boilerplate.isEmpty) segs
      else filter(segs, s => !Bridge.column(InSet(Bridge.expression(s), hset)))
    df.select(col(idCol),
      array_join(kept, " ").as("clean_text"),
      size(segs).cast("long").as("n_segments"),
      (size(segs) - size(kept)).cast("long").as("n_removed"))
  }

  /** Train a CCNet/fastText-style linear QUALITY CLASSIFIER in-engine,
    * integer-exact: a full-batch perceptron over whitespace-token COUNT
    * features, labels ∈ {+1, −1}. Returns (weights, bias) in exactly the
    * shape [[graft.functions.NativeHash.linearTextScore]] applies — train
    * on a labeled sample, score the corpus with the existing codegen'd
    * map-only kernel (the CCNet pipeline's "train a fastText filter on
    * Wikipedia-vs-crawl, score everything" step, Wenzek et al. 2020).
    *
    * Full-batch, not SGD: the epoch-e update is
    * `w += Σ_{d: label_d · margin_d ≤ 0} label_d · count_d` — a pure
    * aggregate, so training is partition- and order-invariant (bit-exact
    * on any cluster layout) and replayable in SQL epoch by epoch.
    * Margins are computed by the SAME kernel that applies the model, so
    * train and apply can never disagree on tokenization.
    *
    * Scale shape: the vocabulary is the top-`vocabSize` tokens by document
    * frequency (ties by token — deterministic), built with one
    * map-side-combinable census and a TakeOrdered; each epoch is one
    * map-only scoring pass (weights ride the closure) plus one aggregate
    * that shuffles only the misclassified docs' vocab tokens with map-side
    * combine — the driver holds ≤ vocabSize longs. Converged (no
    * misclassified rows) stops early: remaining epochs are no-ops. */
  def trainQualityClassifier(
      df: DataFrame, labelCol: String, textCol: String,
      epochs: Int = 3, vocabSize: Int = 10000): (Map[String, Long], Long) = {
    require(epochs >= 1, s"epochs must be at least 1, got $epochs")
    require(vocabSize >= 1, s"vocabSize must be at least 1, got $vocabSize")
    import org.apache.spark.sql.catalyst.expressions.InSet
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.unsafe.types.UTF8String
    val lbl = col(labelCol).cast("long")
    if (df.filter(lbl.isNull || (lbl =!= 1L && lbl =!= -1L)).limit(1).count() > 0)
      throw new IllegalArgumentException(
        s"trainQualityClassifier: $labelCol must be exactly +1 or -1 on every row")
    val vocab: Array[String] = df
      .select(explode(array_distinct(split(col(textCol), " "))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok"))
      .limit(vocabSize)
      .collect().map(_.getString(0))
    val vocabSet: Set[Any] =
      vocab.iterator.map(s => UTF8String.fromString(s): Any).toSet
    // bias rides the same aggregate as the token updates via a sentinel no
    // space-split token can be (it contains a space)
    val Bias = " bias"
    var w = Map.empty[String, Long]
    var b = 0L
    var converged = false
    (1 to epochs).foreach { _ =>
      if (!converged) {
        val margin = graft.functions.NativeHash.linearTextScore(col(textCol), w, b)
        val mis = df.filter(lbl * margin <= 0L)
        val vocabToks = filter(split(col(textCol), " "),
          t => Bridge.column(InSet(Bridge.expression(t), vocabSet)))
        val upd = mis.select(lbl.as("l"),
            explode(concat(array(lit(Bias)), vocabToks)).as("tok"))
          .groupBy("tok").agg(sum(col("l")).as("g"))
          .collect()
        if (upd.isEmpty) converged = true
        else upd.foreach { r =>
          val tok = r.getString(0)
          val g = r.getLong(1)
          if (tok == Bias) b += g
          else w = w.updated(tok, w.getOrElse(tok, 0L) + g)
        }
      }
    }
    (w.filter(_._2 != 0L), b)
  }
}
