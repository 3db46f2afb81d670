package graft
import org.apache.spark.sql.SparkSession
object ComplexStoreDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions",4)
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cx").toString
    // the latent-bug repro: array column, append, then another append — the
    // second commit used to die on an unresolvable nullable cast
    val t = new graft.store.VersionedTable(spark, s"$tmp/t")
    t.overwrite(Seq((1L, Seq(1.0f,2.0f))).toDF("id","emb"))
    t.append(Seq((2L, Seq(3.0f))).toDF("id","emb"))
    t.append(Seq((3L, Seq(4.0f))).toDF("id","emb"))
    println("3 commits with array column: " + t.read().count() + " rows (expect 3)")
    // real embeddings through the store with time travel
    val e = new graft.store.VersionedTable(spark, s"$tmp/e")
    e.overwrite(spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    e.append(spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    println("embeddings through store: " + e.read().count() + " rows (expect 1000), v0=" + e.readVersion(0).count())
    // PROBE: widen float-array -> double-array mid-stream under Full drift
    e.append(Seq((99999L, Seq(1.0d), 0)).toDF("vec_id","embedding","label"), SchemaDrift.Full)
    println("widened emb type: " + e.schema("embedding").dataType.simpleString + " rows=" + e.read().count())
    spark.stop()
  }
}
