package graft

import org.apache.spark.sql.functions._

/** Ad-hoc plan audit of the incremental minhash path: index postings must
  * stay narrow, the hot-bucket guard must broadcast, and the verify joins
  * must not re-shingle the corpus. Run:
  * sbt "Test/runMain graft.IncPlanDrive <sfDir>". */
object IncPlanDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val corpus = spark.read.parquet(s"$d/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("inc-plan-idx").toString
    graft.operators.Dedup.minhashIndex(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val index = spark.read.parquet(dir)
    val batch = corpus.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val obs = org.apache.spark.sql.Observation()
    val out = graft.operators.Dedup.minhashLshIncremental(
      batch, index, "doc_id", "text", threshold = 0.5, candidateObs = Some(obs))
    out.explain("formatted")
    val plan = out.queryExecution.executedPlan.toString
    def check(what: String, ok: Boolean): Unit =
      println(s"${if (ok) "PASS" else "FAIL"}  $what")
    check("oversized-bucket guard broadcast anti-join",
      plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"))
    check("no cartesian / nested-loop joins",
      !plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    println(s"rows=${out.count()}")
    println(s"minhash_candidates=${obs.get("candidates")}")
    // the span operator's counter, over the same corpus — the two numbers
    // plan audits compare when sizing persistPositions
    val spanObs = org.apache.spark.sql.Observation()
    val spans = graft.operators.Dedup.duplicateSpans(
      corpus, "doc_id", "text", 8, candidateObs = Some(spanObs))
    println(s"span_rows=${spans.count()}")
    println(s"span_candidates=${spanObs.get("candidates")}")
  }
}
