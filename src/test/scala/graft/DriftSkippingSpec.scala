package graft

import org.apache.spark.sql.functions._

import graft.SchemaDrift
import graft.store.VersionedTable

/** Data skipping under schema drift — the soundness corners where a pushed
  * filter references a column some dir generations don't have (drift-added)
  * or store under a narrower type (widened): pruning must never drop a row
  * the filter would keep. */
class DriftSkippingSpec extends SparkSuite {
  import spark.implicits._

  test("filter on a drift-added column stays exact across generations") {
    val root = tmpDir("drift-skip")
    val t = new VersionedTable(spark, root)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    t.append(Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "s", "extra"))
    t.append(Seq((5L, "e", 50L)).toDF("id", "s", "extra"))
    // old-generation rows read extra as NULL — they can never satisfy the
    // equality, and pruning must not break that
    assert(t.read().filter($"extra" === 40L).select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(4L))
    assert(t.read().filter($"extra".isNull).count() == 2)
    // stats on the NEW generation still prune between its dirs
    assert(t.readWhere($"extra" === 50L).select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("filter on a widened column prunes with the narrow generation's stats") {
    val root = tmpDir("widen-skip")
    val t = new VersionedTable(spark, root)
    t.append(Seq((1, 10)).toDF("id", "v")) // v: int
    t.append(Seq((2, 5000000000L)).toDF("id", "v"), drift = SchemaDrift.Full) // v → long
    assert(t.schema("v").dataType == org.apache.spark.sql.types.LongType)
    // the long-typed literal must compare soundly against the int-gen stats
    // (safe cast unwrap int→long), keeping exactly the right rows
    assert(t.read().filter($"v" === 10L).select("id")
      .collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(t.read().filter($"v" > 100L).select("id")
      .collect().map(_.getInt(0)).toSeq == Seq(2))
    // randomized cross-check on a mixed-width table
    val rnd = new scala.util.Random(5)
    val t2 = new VersionedTable(spark, tmpDir("widen-skip2"))
    t2.append(Seq.fill(50)((rnd.nextInt(100), rnd.nextInt(1000))).toDF("id", "v"))
    t2.append(Seq.fill(50)((rnd.nextInt(100), rnd.nextLong())).toDF("id", "v"),
      drift = SchemaDrift.Full)
    Seq($"v" > 500L, $"v" <= 0L, $"v" === 7L).foreach { p =>
      val viaScan = t2.read().collect().filter(r => !r.isNullAt(1))
      val expected = t2.read().filter(p).count()
      assert(t2.readWhere(p).count() == expected, s"mismatch for $p")
      assert(viaScan.nonEmpty)
    }
  }
}
