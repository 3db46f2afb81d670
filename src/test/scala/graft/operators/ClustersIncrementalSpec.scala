package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Dedup.clustersIncremental]] — persisted-label clustering: star
  * edges preserve connectivity, cross-batch merges relabel to the true
  * min, singletons pass through. */
class ClustersIncrementalSpec extends SparkSuite {
  import spark.implicits._

  test("fold-through-parquet ≡ one-shot; cross-batch components merge to the true min") {
    // components: {1,2,3} via (1-2),(2-3); {10,11}; new edge 3-10 merges them
    val first = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val second = Seq((3L, 10L), (20L, 21L)).toDF("id_a", "id_b")
    val dir = java.nio.file.Files.createTempDirectory("cc-spec")
    try {
      Dedup.duplicateClusters(first).write.mode("overwrite").parquet(dir.toString)
      val labels = spark.read.parquet(dir.toString)
      val got = Dedup.clustersIncremental(labels, second)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val oneShot = Dedup.duplicateClusters(first.unionByName(second))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == oneShot)
      assert(got(11L) == 1L && got(10L) == 1L, "merged component must take the true min")
      assert(got(20L) == 20L && got(21L) == 20L)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir.toFile)
      Dedup.releaseIntermediates()
    }
  }

  test("labels untouched by the batch keep their clusters; shape refuses") {
    val labels = Seq((1L, 1L), (2L, 1L), (7L, 7L)).toDF("id", "cluster_id")
    val got = Dedup.clustersIncremental(labels, Seq((30L, 31L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the {1,2} component survives via 2's star edge; the stored singleton
    // row 7 passes through; the new pair clusters
    assert(got == Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 30L -> 30L, 31L -> 30L))
    intercept[IllegalArgumentException] {
      Dedup.clustersIncremental(labels.withColumnRenamed("id", "doc"),
        Seq((1L, 2L)).toDF("id_a", "id_b"))
    }
    Dedup.releaseIntermediates()
  }
}
