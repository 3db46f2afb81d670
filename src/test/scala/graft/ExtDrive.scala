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
    println("aggregates via SQL (graft_topk / graft_misra_gries):")
    spark.sql("""SELECT g, graft_topk(v, p, 2) AS top2
      FROM VALUES ('a', 5L, 1L), ('a', 9L, 2L), ('a', 7L, 3L), ('b', 1L, 4L)
        AS t(g, v, p) GROUP BY g ORDER BY g""").show(false)
    val top = spark.sql("""SELECT graft_topk(v, p, 2) AS tk
      FROM VALUES (5L, 1L), (9L, 2L), (7L, 3L) AS t(v, p)""")
      .selectExpr("tk[0].p", "tk[1].p").head()
    println(s"top2 payloads: ${top.getLong(0)}, ${top.getLong(1)} (expect 2, 3)")
    val mg = spark.sql("""SELECT graft_misra_gries(x, 2) AS c
      FROM VALUES (1L),(1L),(1L),(2L),(3L),(1L) AS t(x)""").head().getSeq[Long](0)
    println(s"misra-gries candidates contain heavy item 1: ${mg.contains(1L)}")
    println("graft_cosine via SQL:")
    val cos = spark.sql(
      "SELECT graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F))").head().getDouble(0)
    println(s"cos identical vectors = $cos (expect 1.0)")
    println("graft_phrase_matches via SQL:")
    val ph = spark.sql(
      """SELECT graft_phrase_matches('aa b aa aa', array('aa', 'b aa'))""")
      .head().getLong(0)
    println(s"phrase hits = $ph (expect 4: three 'aa' + one 'b aa')")
    println("PROBE non-literal phrase array:")
    try { spark.sql("SELECT graft_phrase_matches('x', array(rand()::string))").show() }
    catch { case e: Exception => println("error (expected): " + e.getMessage.split("\n").head) }
    spark.stop()
  }
}
