package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[Graph.triangles]] — degree-oriented triangle census: exact per-node
  * counts on known graphs, symmetrization/dedup/self-loop hygiene, and
  * brute-force equality on a randomized graph. */
class TrianglesSpec extends SparkSuite {
  import spark.implicits._

  private def tri(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangles(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: every vertex in 3 triangles; path and star have none") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(tri(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty)
    assert(tri(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))).isEmpty)
  }

  test("duplicate, reversed, and self-loop edges do not change the census") {
    val t = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val noisy = t ++ Seq((2L, 1L), (3L, 2L), (1L, 2L), (4L, 4L))
    assert(tri(noisy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("hub with one closing rim edge: exactly one triangle") {
    // star center 0 with spokes 1..6, plus rim edge (3, 4)
    val g = (1L to 6L).map(i => (0L, i)) :+ (3L, 4L)
    assert(tri(g) == Map(0L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("matches brute-force enumeration on a randomized graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 400).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }.distinct
    val adj = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val want = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes; j <- nodes if j > i && adj(i)(j)
      k <- nodes if k > j && adj(i)(k) && adj(j)(k)
    } { want(i) += 1; want(j) += 1; want(k) += 1 }
    assert(tri(edges) == want.toMap)
  }

  test("partition count does not change the census") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 1L), (2L, 4L))
    val one = Graph.triangles(g.toDF("a", "b").coalesce(1), "a", "b")
      .collect().map(_.toSeq).toSet
    val many = Graph.triangles(g.toDF("a", "b").repartition(32), "a", "b")
      .collect().map(_.toSeq).toSet
    assert(one == many)
  }
}
