package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CosinePair, MinHashSignature, MisraGries, SimHash64, TopKPairs}

/** SparkSessionExtensions entry point: registers the native expressions
  * and aggregates as SQL functions so `spark.sql("SELECT graft_simhash
  * (...)")` works cluster-wide. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or call
  * [[GraftExtensions.register]] on an existing session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an int literal, got $other")
  }

  /** The shared (identifier, info, builder) list — injected at session
    * build AND registrable imperatively. Aggregate functions return the
    * bare AggregateFunction: the analyzer wraps them exactly like the
    * built-in max/percentile_approx entries. */
  private[graft] val builders: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_minhash(shingles, numHashes)")
        MinHashSignature(children.head, intLit(children(1), "numHashes"))
      }),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHash64(children.head)),
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosinePair].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_cosine(vec_a, vec_b)")
        CosinePair(children(0), children(1))
      }),
    (FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKPairs].getName, "graft_topk"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_topk(value, payload, k)")
        TopKPairs(children(0), children(1), intLit(children(2), "k"))
      }),
    (FunctionIdentifier("graft_misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "graft_misra_gries"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_misra_gries(item, capacity)")
        MisraGries(children.head, intLit(children(1), "capacity"))
      }))

  /** Imperative registration on a live session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (id, info, b) => reg.registerFunction(id, info, b) }
  }
}
