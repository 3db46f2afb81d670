package graft
object EditDistTimeDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    val t0 = System.nanoTime()
    val n = graft.queries.Catalog.queries("dedup_editdist")(spark, "/root/testdata/sf0.1").count()
    println(f"EDITDIST sf0.1 pairs=$n time=${(System.nanoTime()-t0)/1e9}%.2fs")
  }
}
