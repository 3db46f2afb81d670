package graft

/** Scratch: plan + timing audit of dedup_spans at sf0.01. */
object SpanPlanDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    val d = "/root/testdata/sf0.01"
    val df = graft.queries.Catalog.queries("dedup_spans")(spark, d)
    df.explain("formatted")
    val t0 = System.nanoTime()
    println("rows=" + df.count() + " sec=" + (System.nanoTime() - t0) / 1e9)
  }
}
