package graft.store

import graft.SparkSuite

/** A second writer racing the same version slot must fail loudly instead of
  * silently replacing a committed manifest (the put-if-absent guarantee the
  * engine's lock normally makes unnecessary). */
class ConcurrentCommitSpec extends SparkSuite {
  import spark.implicits._

  test("publishing an already-committed version throws") {
    val root = tmpDir("concurrent-commit")
    val t = new VersionedTable(spark, root)
    t.append(Seq((1, "a")).toDF("id", "s"))
    val m = VersionedTable.Manifest(0L, Nil, t.schema.json, Map.empty)
    intercept[java.util.ConcurrentModificationException] {
      t.writeManifest(m)
    }
    // the committed version is untouched
    assert(t.read().count() == 1)
  }
}
