package graft

import org.apache.spark.sql.functions._

/** One-off wall/candidate probe for the tf-idf cosine gate at a given SF
  * (default sf0.1): prints candidates + wall for the gate parameterization.
  * Run: sbt "Test/runMain graft.TfidfProbe [sfDir] [runs]". */
object TfidfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSuite.spark
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to runs).foreach { r =>
      val obs = new org.apache.spark.sql.Observation(s"tfidf-probe-$r")
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.tfidfCosinePairs(docs, "doc_id", "text",
        threshold = graft.queries.Catalog.TfidfGateThreshold,
        maxDocFreq = Some(graft.queries.Catalog.TfidfGateMaxDocFreq),
        candidateObs = Some(obs)).count()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.operators.Dedup.releaseIntermediates()
      println(f"RUN $r wall=$wall%.2f s rows=$n candidates=${obs.get("candidates")}")
    }
  }
}
