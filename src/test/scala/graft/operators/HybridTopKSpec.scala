package graft.operators

import graft.SparkSuite

/** Hybrid Borda-fusion retrieval: hand-computed fused order and the
  * pool-boundary penalty semantics. */
class HybridTopKSpec extends SparkSuite {
  import spark.implicits._

  // text relevance and vector relevance deliberately disagree:
  //   id 1: 2 query terms, vector orthogonal to q
  //   id 2: 1 query term, vector = q (cosine 1)
  //   id 3: 0 query terms, vector close to q
  //   id 4: 2 query terms, vector close to q  -> best fused
  private def corpus = Seq(
    (1L, "alpha beta noise", Array(0.0f, 1.0f)),
    (2L, "alpha other words", Array(1.0f, 0.0f)),
    (3L, "nothing shared here", Array(0.9f, 0.1f)),
    (4L, "alpha beta close", Array(0.8f, 0.2f))).toDF("id", "text", "v")

  test("fuses text and vector ranks by exact Borda sum") {
    val out = Similarity.hybridTopK(corpus, "id", "text", "v",
        Seq("alpha", "beta"), Seq(1.0f, 0.0f), kTop = 4, pool = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // text ranks (ts desc, id): 1->1, 4->2, 2->3, 3->4
    // vec ranks (cos desc, id): 2->1, 3->2, 4->3, 1->4
    // borda: 1:5, 2:4, 3:6, 4:5 -> order: 2(4), 1(5), 4(5), 3(6)
    assert(out.toSeq === Seq((1L, 2L, 4L), (2L, 1L, 5L), (3L, 4L, 5L), (4L, 3L, 6L)))
  }

  test("pool boundaries: one-sided members take the penalty, outsiders vanish") {
    // pool=1: text pool = {1}, vec pool = {2}. Candidates = pool union
    // (docs 3, 4 are in NEITHER pool and are absent — retrieval only ever
    // surfaces pool members); each one-sided member takes the missing
    // modality's penalty rank pool+1=2 → borda 1: 1+2=3, 2: 2+1=3
    val out = Similarity.hybridTopK(corpus, "id", "text", "v",
        Seq("alpha", "beta"), Seq(1.0f, 0.0f), kTop = 4, pool = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 3L), (2L, 3L)))
  }
}
