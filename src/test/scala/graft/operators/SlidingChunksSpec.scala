package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[TextCorpus.slidingChunks]] — the overlap chunker: exact windows,
  * clamped tails, empty-doc behavior, contracts. */
class SlidingChunksSpec extends SparkSuite {
  import spark.implicits._

  test("windows, overlap, and the clamped tail are exact") {
    val df = Seq((1L, "a b c d e f g"), (2L, "x y"), (3L, ""))
      .toDF("doc_id", "text")
    val got = TextCorpus.slidingChunks(df, "doc_id", "text", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got == Set(
      (1L, 0L, 4L, "a b c d"),
      (1L, 1L, 4L, "c d e f"),
      (1L, 2L, 3L, "e f g"),   // clamped tail
      (1L, 3L, 1L, "g"),       // sub-overlap tail still emits
      (2L, 0L, 2L, "x y"),
      (3L, 0L, 1L, "")))       // tokens("") is [""] — one empty chunk
    // chunk == stride: disjoint windows, no overlap
    val dj = TextCorpus.slidingChunks(df, "doc_id", "text", 3, 3)
      .filter(col("doc_id") === 1L).collect().map(_.getString(3)).toSet
    assert(dj == Set("a b c", "d e f", "g"))
  }

  test("contracts refuse") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextCorpus.slidingChunks(df, "doc_id", "text", 0, 1)
    }
    intercept[IllegalArgumentException] {
      TextCorpus.slidingChunks(df, "doc_id", "text", 4, 5)
    }
    intercept[IllegalArgumentException] {
      TextCorpus.slidingChunks(df, "doc_id", "text", 4, 0)
    }
  }
}
