package graft

import org.apache.spark.sql.functions._

import graft.sources.DataFrameSource

/** Multi-table orchestration: N tables sync concurrently, failures are
  * isolated per table, results come back in input order. */
class SyncAllSpec extends SparkSuite {
  import spark.implicits._

  test("syncAll runs tables concurrently and isolates failures") {
    val dirA = tmpDir("syncall-a")
    val dirB = tmpDir("syncall-b")
    val dirC = tmpDir("syncall-c")
    val a = (1 to 100).map(i => (i.toLong, s"a$i", 1L)).toDF("id", "v", "ver")
    val b = (1 to 50).map(i => (i.toLong, s"b$i", 1L)).toDF("id", "v", "ver")
    // table C's source explodes on read → its sync must fail alone
    val inner = new DataFrameSource(a, Seq("id"))
    val poison = new graft.sources.Source {
      def read(s: org.apache.spark.sql.SparkSession) = throw new RuntimeException("boom")
      def columns(s: org.apache.spark.sql.SparkSession) = inner.columns(s)
      def primaryKeys(s: org.apache.spark.sql.SparkSession) = inner.primaryKeys(s)
    }
    val cfg = WriteConfig(deltaCol = Some("ver"))
    val results = Graft.syncAll(spark, Seq(
      Graft.TableSync(new DataFrameSource(a, Seq("id")), dirA, cfg),
      Graft.TableSync(new DataFrameSource(b, Seq("id")), dirB, cfg),
      Graft.TableSync(poison, dirC, cfg)), parallelism = 3)
    assert(results.size == 3)
    assert(results(0).isRight && results(1).isRight)
    assert(results(2).isLeft)
    assert(new graft.store.VersionedTable(spark, s"$dirA/delta").read().count() == 100)
    assert(new graft.store.VersionedTable(spark, s"$dirB/delta").read().count() == 50)
    // a second orchestrated run delta-syncs both healthy tables (NoLoad)
    val again = Graft.syncAll(spark, Seq(
      Graft.TableSync(new DataFrameSource(a, Seq("id")), dirA, cfg),
      Graft.TableSync(new DataFrameSource(b, Seq("id")), dirB, cfg)), parallelism = 2)
    assert(again.forall(_.isRight))
  }
}
