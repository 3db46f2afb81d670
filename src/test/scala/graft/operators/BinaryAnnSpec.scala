package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Binary sign quantization + Hamming-shortlist ANN ([[Similarity.binarySign]],
  * [[Similarity.topKBinary]], kernels `SignBits`/`HammingToQuery`). */
class BinaryAnnSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private def vec(dim: Int): Seq[Float] = Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)

  test("packed Hamming equals component-wise sign disagreement, dim 70") {
    val dim = 70 // exercises the partial second word
    val q = vec(dim)
    val rows = (0L until 50L).map(i => (i, vec(dim)))
    val df = rows.toDF("id", "v")
    val got = Similarity.binarySign(df, "id", "v")
      .select(col("id"), graft.functions.NativeHash.hammingToQuery(
        col("bits"), Similarity.signBitsOf(q)).as("ham"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, v) =>
      val expect = v.zip(q).count { case (a, b) => (a >= 0) != (b >= 0) }.toLong
      assert(got(id) == expect, s"id $id")
    }
  }

  test("negative zero packs as a set bit (IEEE >= 0 rule)") {
    val df = Seq((1L, Seq(-0.0f, -1.0f, 0.0f))).toDF("id", "v")
    val bits = Similarity.binarySign(df, "id", "v")
      .select("bits").head().getSeq[Long](0)
    assert(bits == Seq(0x5L)) // bits 0 and 2 set, bit 1 clear
  }

  test("topKBinary with shortlist = corpus equals exact brute-force top-k") {
    val dim = 64
    val q = vec(dim)
    val rows = (0L until 200L).map(i => (i, vec(dim)))
    val df = rows.toDF("id", "v")
    val got = Similarity.topKBinary(df, "id", "v", q, kTop = 10, shortlist = 200)
      .select("rank", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val expect = rows.map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, s) => (-s, id) }.take(10)
      .zipWithIndex.map { case ((id, _), i) => ((i + 1).toLong, id) }
    assert(got == expect)
  }

  test("null vectors are excluded from the shortlist, not crashed on") {
    val dim = 8
    val q = vec(dim)
    val df = Seq((1L, Some(vec(dim))), (2L, None), (3L, Some(vec(dim))))
      .toDF("id", "v")
    val got = Similarity.topKBinary(df, "id", "v", q, kTop = 3, shortlist = 10)
    assert(got.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("query dim mismatch raises") {
    val df = Seq((1L, vec(16))).toDF("id", "v")
    val e = intercept[IllegalArgumentException](
      Similarity.topKBinary(df, "id", "v", vec(8), 1))
    assert(e.getMessage.contains("dim"))
  }

  test("SQ8: kernel integer dot equals the driver-side reference") {
    val dim = 48
    val q = vec(dim)
    val q8 = Similarity.sq8Of(q)
    val rows = (0L until 60L).map(i => (i, vec(dim)))
    val got = Similarity.quantizeInt8(rows.toDF("id", "v"), "v")
      .select(col("id"), graft.functions.NativeHash.intDotToQuery(col("q"), q8).as("dot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, v) =>
      val c8 = Similarity.sq8Of(v) // same rule as the column quantizer
      val expect = c8.zip(q8).map { case (a, b) => a.toLong * b }.sum
      assert(got(id) == expect, s"id $id")
    }
    assert(Similarity.sq8Of(Seq(0f, 0f)).toSeq == Seq(0, 0)) // zero vector
  }

  test("topKSq8 with shortlist = corpus equals exact brute-force top-k") {
    val dim = 64
    val q = vec(dim)
    val rows = (0L until 200L).map(i => (i, vec(dim)))
    val df = rows.toDF("id", "v")
    val got = Similarity.topKSq8(df, "id", "v", q, kTop = 10, shortlist = 200)
      .select("rank", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val expect = rows.map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, s) => (-s, id) }.take(10)
      .zipWithIndex.map { case ((id, _), i) => ((i + 1).toLong, id) }
    assert(got == expect)
    // null vectors excluded, dim mismatch refused — the family contract
    val withNull = Seq((1L, Some(vec(dim))), (2L, None)).toDF("id", "v")
    assert(Similarity.topKSq8(withNull, "id", "v", q, 2, 10).count() == 1L)
    val e = intercept[IllegalArgumentException](
      Similarity.topKSq8(df, "id", "v", vec(8), 1))
    assert(e.getMessage.contains("dim"))
    // the persisted-index serving path returns the identical top-k after
    // a parquet round-trip of the codes alone
    val dir = tmpDir("sq8-idx-spec")
    Similarity.sq8Index(df, "id", "v").write.mode("overwrite").parquet(dir)
    val served = Similarity.topKSq8Indexed(spark.read.parquet(dir), df,
        "id", "v", q, kTop = 10, shortlist = 200)
      .select("rank", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served == expect)
    val e2 = intercept[IllegalArgumentException](
      Similarity.topKSq8Indexed(df.select(col("id")), df, "id", "v", q, 1))
    assert(e2.getMessage.contains("sq8Index"))
  }
}
