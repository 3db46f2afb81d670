package graft

/** Scratch drive: dump the dedup_spans gate at sf0.001 for DuckDB parity. */
object SpanGateDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val df = graft.queries.Catalog.queries("dedup_spans")(spark, d)
    df.write.mode("overwrite").parquet("/tmp/gate-out/dedup_spans")
    println("GATE dedup_spans rows=" +
      spark.read.parquet("/tmp/gate-out/dedup_spans").count())
  }
}
