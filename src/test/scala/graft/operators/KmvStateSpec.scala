package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Sketches.kmvState]] family and [[Sketches.quantileTransform]] —
  * persisted KMV: fold-through-parquet equals the one-shot sketch, the
  * trim-fold is idempotent (maintainer replays are guard-free), the served
  * overlap equals the corpus-side pairing; the quantile transform maps
  * rows to exact rank permilles on singleton buckets. */
class KmvStateSpec extends SparkSuite {
  import spark.implicits._

  private val Bound = 1152921504606846976L
  private val K = 32

  private def md5Hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def corpus(n: Int) =
    (1 to n).map(i => (s"g${i % 2}", md5Hash60(s"k$i"))).toDF("g", "h")

  test("state round-trip + fold ≡ one-shot distinctSketch; fold idempotent") {
    val df = corpus(2000)
    val dir = java.nio.file.Files.createTempDirectory("kmv-rt")
    Sketches.kmvState(df.filter(col("h") % 2 === 0), "g", "h", K)
      .write.mode("overwrite").parquet(dir.toString)
    val state = spark.read.parquet(dir.toString)
    val batch = Sketches.kmvState(df.filter(col("h") % 2 === 1), "g", "h", K)
    val folded = Sketches.kmvFold(Sketches.kmvFold(state, batch, K), batch, K)
    val served = Sketches.kmvOf(folded, K, Bound)
      .collect().map(_.toSeq).toSet
    val oneShot = TextCorpus.distinctSketch(df, "g", "h", K, Bound)
      .collect().map(_.toSeq).toSet
    assert(served == oneShot)
  }

  test("maintainer replay is guard-free (idempotent trim-fold)") {
    val root = java.nio.file.Files.createTempDirectory("kmv-replay")
    val dir = root.toString + "/tbl"
    val b0 = corpus(300)
    val b1 = corpus(600).filter(col("h") % 3 === 0)
    def served = Sketches.kmvOf(
      new graft.store.VersionedTable(spark, dir).read(), K, Bound)
      .collect().map(_.toSeq).toSet
    graft.streaming.StreamingIngest.kmvIngestBatch(b0, 0L, "g", "h", K, dir, "a")
    graft.streaming.StreamingIngest.kmvIngestBatch(b1, 1L, "g", "h", K, dir, "a")
    val after = served
    graft.streaming.StreamingIngest.kmvIngestBatch(b1, 1L, "g", "h", K, dir, "a")
    assert(served == after)
  }

  test("served overlap equals the corpus-side pairing") {
    val df = corpus(1500)
    val state = Sketches.kmvState(df, "g", "h", K)
    val fromState = Sketches.kmvOverlapOf(state, K, Bound)
      .collect().map(_.toSeq).toSet
    val fromCorpus = Sketches.distinctOverlap(df, "g", "h", K, Bound)
      .collect().map(_.toSeq).toSet
    assert(fromState == fromCorpus)
  }

  test("capacity-stamp mismatches refuse") {
    val st = Sketches.kmvState(corpus(50), "g", "h", K)
    intercept[IllegalArgumentException] { Sketches.kmvFold(st, st, 64) }
    intercept[IllegalArgumentException] { Sketches.kmvOf(st, 64, Bound) }
    intercept[IllegalArgumentException] { Sketches.kmvOverlapOf(st, 64, Bound) }
  }

  test("quantile transform: exact rank permilles on singleton buckets") {
    // values 1..100 under mantissaBits 6 are singleton buckets → the
    // covering-bucket cumulative IS the rank: est = rank·1000 DIV 100
    val df = (1L to 100L).map(v => ("g", v, v)).toDF("g", "id", "v")
    val got = Sketches.quantileTransform(df, "g", "v", mantissaBits = 6)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got(1L) == 10L && got(50L) == 500L && got(100L) == 1000L)
    assert((1L to 100L).forall(v => got(v) == v * 1000 / 100))
  }

  test("quantile transform: null values pass through with null permille") {
    val df = Seq(("g", 1L, Option(5L)), ("g", 2L, Option.empty[Long]))
      .toDF("g", "id", "v")
    val got = Sketches.quantileTransform(df, "g", "v")
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got(2L).isEmpty && got(1L).nonEmpty)
    intercept[IllegalArgumentException] {
      Sketches.quantileTransform(df.withColumn("__x", lit(1)), "g", "v")
    }
  }
}
