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

  /** The sampling bucket: ((key·1103515245 + 12345) mod 2^31) mod 1000 —
    * plain integer arithmetic so any engine reproduces the selection
    * bit-for-bit. Requires an integral key column. */
  def lcgBucket(key: Column): Column =
    pmod(pmod(key.cast("long") * 1103515245L + 12345L, lit(2147483648L)), lit(1000L))
}
