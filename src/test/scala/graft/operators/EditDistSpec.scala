package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** editDistancePairs ≡ brute force on randomized corpora — the pruning
  * layers (length band, q-gram count filter, banded DP) must be
  * recall-complete, including short-string and empty-string edges. */
class EditDistSpec extends SparkSuite {
  import spark.implicits._

  private def brute(docs: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      dist = lev(ta, tb) if dist <= d
    } yield (ia, ib, dist.toLong)).toSet

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("randomized corpus with planted near-duplicates matches brute force") {
    val rnd = new scala.util.Random(1234)
    val alphabet = "abcdef"
    def word(n: Int) = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    val originals = (0L until 60L).map(i => (i, word(20 + rnd.nextInt(60))))
    // plant mutated copies: deletes, substitutions, inserts
    val mutated = originals.take(20).map { case (i, s) =>
      val b = new StringBuilder(s)
      (0 until rnd.nextInt(4)).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 if b.nonEmpty => b.deleteCharAt(rnd.nextInt(b.length))
          case 1 if b.nonEmpty => b.setCharAt(rnd.nextInt(b.length), alphabet(rnd.nextInt(6)))
          case _ => b.insert(rnd.nextInt(b.length + 1), alphabet(rnd.nextInt(6)))
        }
      }
      (i + 1000L, b.toString)
    }
    // edge cases: empty and sub-q-length strings
    val edges = Seq((5000L, ""), (5001L, ""), (5002L, "ab"), (5003L, "ac"), (5004L, "abc"))
    val docs = originals ++ mutated ++ edges
    for (d <- Seq(0, 2, 5)) {
      val got = Dedup.editDistancePairs(
          docs.toDF("id", "txt"), "id", "txt", maxDist = d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == brute(docs, d), s"mismatch at maxDist=$d")
    }
  }
}
