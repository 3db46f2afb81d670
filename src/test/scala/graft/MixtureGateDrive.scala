package graft

/** Scratch drive: run the sample_mixture gate at all three SFs and dump
  * parquet + its oracle SQL for a DuckDB parity check. */
object MixtureGateDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1").foreach { d =>
      val sf = d.split('/').last
      val df = graft.queries.Catalog.queries("sample_mixture")(spark, d)
      df.write.mode("overwrite").parquet(s"/tmp/gate-out/mixture-$sf")
      println(s"GATE sample_mixture $sf rows=" +
        spark.read.parquet(s"/tmp/gate-out/mixture-$sf").count())
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/gate-out/mixture-oracle.sql"),
      graft.queries.Catalog.oracleSql("sample_mixture").getBytes("UTF-8")): Unit
  }
}
