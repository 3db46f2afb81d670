package graft

import org.apache.spark.sql.SparkSession

/** Manual drive of the SQL-function registration surface.
  * Run: sbt "Test/runMain graft.ExtDrive" */
object ExtDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("via spark.sql (extensions-injected):")
    spark.sql(
      """SELECT graft_simhash(split('the quick brown fox', ' ')) AS sig,
                graft_minhash(split('the quick brown fox', ' '), 8) AS mh""").show(false)
    println("determinism check (same input twice):")
    val a = spark.sql("SELECT graft_simhash(split('hello world x', ' '))").head().getLong(0)
    val b = spark.sql("SELECT graft_simhash(split('hello world x', ' '))").head().getLong(0)
    println(s"equal: ${a == b} ($a)")
    println("PROBE wrong input type:")
    try { spark.sql("SELECT graft_simhash(42)").show() }
    catch { case e: Exception => println("error (expected): " + e.getMessage.split("\n").head) }
    println("PROBE non-literal numHashes:")
    try { spark.sql("SELECT graft_minhash(split('a b',' '), 1+7)").show() }
    catch { case e: Exception => println("error: " + e.getMessage.split("\n").head) }
    spark.stop()
  }
}
