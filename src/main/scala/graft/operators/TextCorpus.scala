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
}
