package graft

/** Ad-hoc single-gate driver: args(0)=gate name, args(1)=sf dir. Dumps the gate
  * result to /tmp/gate-out/<name> for DuckDB comparison. */
object GateDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val df = graft.queries.Catalog.queries(name)(spark, dir)
    df.write.mode("overwrite").parquet(s"/tmp/gate-out/$name")
    println(s"GATE $name rows=" + spark.read.parquet(s"/tmp/gate-out/$name").count())
  }
}
