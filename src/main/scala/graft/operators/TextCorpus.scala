package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

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

  /** The sampling bucket: (((key mod 2^31)·1103515245 + 12345) mod 2^31)
    * mod 1000 — the key is reduced BEFORE the multiply so the product
    * stays ≤ 2^62 (no Long overflow: ANSI Spark would throw and a SQL
    * mirror would disagree on wide keys); plain integer arithmetic so any
    * engine reproduces the selection bit-for-bit. Integral keys only. */
  def lcgBucket(key: Column): Column =
    pmod(pmod(pmod(key.cast("long"), lit(2147483648L)) * 1103515245L + 12345L,
      lit(2147483648L)), lit(1000L))

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
    val nParts = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // the bucket is a DETERMINISTIC function of the id VALUE (equal-width
    // id ranges from a min/max probe) — NOT spark_partition_id over
    // sample-based range partitioning, whose boundaries could differ
    // between the totals action and the final plan (or on any
    // re-execution after cache eviction), silently corrupting offsets.
    // Mildly count-skewed buckets only skew work, never results.
    val bounds = df.agg(min(col(idCol)).cast("long"), max(col(idCol)).cast("long")).head()
    if (bounds.isNullAt(0))
      return df.sparkSession.emptyDataFrame
        .withColumn(idCol, lit(null).cast("long"))
        .withColumn("n_tokens", lit(0L)).withColumn("start_offset", lit(0L))
        .withColumn("first_chunk", lit(0L)).withColumn("last_chunk", lit(0L))
        .limit(0)
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val span = math.max(1L, hi - lo + 1L)
    // stride division (not multiply-then-divide) so huge id spans can't
    // overflow; SQL DIV = true integer division (Column `/` is double and
    // loses precision past 2^53); at most nParts buckets, some empty
    val stride = span / nParts + 1L
    val bucketOf = expr(s"CAST((CAST(`$idCol` AS BIGINT) - ${lo}L) DIV ${stride}L AS INT)")
    // persisted eagerly: tokenize runs once, not once per consumer
    val counted = Caching.spillPersistEager(df
      .select(col(idCol), TextFunctions.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("__pid", bucketOf)
      .repartition(nParts, col("__pid")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(idCol)
    val local = counted.withColumn("__cum", sum("n_tokens").over(w))
    // per-bucket totals: ≤ nParts rows — driver prefix-sum + broadcast
    val partTotals = counted.groupBy("__pid").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bases: Map[Int, Long] = {
      val sorted = partTotals.keys.toSeq.sorted
      sorted.zip(sorted.scanLeft(0L)((acc, p) => acc + partTotals(p)).init).toMap
    }
    val baseCol = bases.foldLeft(lit(0L)) { case (acc, (pid, base)) =>
      when(col("__pid") === pid, base).otherwise(acc)
    }
    local
      .withColumn("start_offset", col("__cum") - col("n_tokens") + baseCol)
      .withColumn("first_chunk", floor(col("start_offset") / capacity))
      .withColumn("last_chunk",
        floor((col("start_offset") + col("n_tokens") - 1) / capacity))
      .select(idCol, "n_tokens", "start_offset", "first_chunk", "last_chunk")
  }

  /** EXACT heavy hitters via the two-pass sketch+verify shape: pass 1 runs
    * a Misra-Gries sketch (bounded state, map-side mergeable — the
    * guarantee: any term with count > n/(capacity+1) is in the candidate
    * set); pass 2 re-counts ONLY the ≤ capacity candidates exactly and
    * keeps those with count·k > n. Output = exactly the terms above the
    * 1/k frequency threshold with exact counts — sketch speed, exact
    * answer, at any scale (capacity defaults to 2k for slack). */
  def heavyHitters(
      df: DataFrame, textCol: String, k: Int,
      capacity: Int = 0): DataFrame = {
    val cap = if (capacity > 0) capacity else 2 * k
    require(cap >= k, "capacity must be >= k for the n/k guarantee")
    // occurrences feed both passes — tokenize once
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
    val occ = df.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = occ.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfq = occ.select(col(idCol), col("term")).dropDuplicates(idCol, "term")
      .groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfq, "term").select(col(idCol), col("term"), col("tf"), col("df"))
  }
}
