package graft

/** Scratch drive: run the deletion-vector gates at sf0.01 and dump parquet
  * + oracle SQL for a DuckDB parity pre-check (tools/oracle_check.py). */
object DvGateDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    val d = "/root/testdata/sf0.01"
    val names = Seq("store_dv_delete", "store_dv_mirror", "store_dv_merge", "streaming_table_source")
    names.foreach { n =>
      val df = graft.queries.Catalog.queries(n)(spark, d)
      df.coalesce(1).write.mode("overwrite").parquet(s"/tmp/dvgate/$n")
      println(s"GATE $n rows=" + spark.read.parquet(s"/tmp/dvgate/$n").count())
    }
    val sql = names.map(n => s""""$n": ${ujsonQ(graft.queries.Catalog.oracleSql(n))}""")
      .mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/dvgate/oracle_sql.json"),
      sql.getBytes("UTF-8"))
  }
  private def ujsonQ(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
