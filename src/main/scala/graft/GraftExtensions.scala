package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CosinePair, KGramWindowHashes, MinHashSignature, MisraGries, SimHash64, TopKPairs}

/** SparkSessionExtensions entry point: registers the native expressions
  * and aggregates as SQL functions so `spark.sql("SELECT graft_simhash
  * (...)")` works cluster-wide. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or call
  * [[GraftExtensions.register]] on an existing session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach(ext.injectFunction)
    GraftExtensions.tableBuilders.foreach(ext.injectTableFunction)
  }
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
    (FunctionIdentifier("graft_kgram_hashes"),
      new ExpressionInfo(classOf[KGramWindowHashes].getName, "graft_kgram_hashes"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_kgram_hashes(text, k)")
        KGramWindowHashes(children.head, intLit(children(1), "k"))
      }),
    (FunctionIdentifier("graft_misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "graft_misra_gries"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_misra_gries(item, capacity)")
        MisraGries(children.head, intLit(children(1), "capacity"))
      }),
    (FunctionIdentifier("graft_dup_ngram_coverage"),
      new ExpressionInfo(classOf[graft.functions.DupNgramCoverage].getName,
        "graft_dup_ngram_coverage"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dup_ngram_coverage(text, n)")
        graft.functions.DupNgramCoverage(children.head, intLit(children(1), "n"))
      }),
    (FunctionIdentifier("graft_top_ngram_coverage"),
      new ExpressionInfo(classOf[graft.functions.DupNgramCoverage].getName,
        "graft_top_ngram_coverage"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_top_ngram_coverage(text, n)")
        graft.functions.DupNgramCoverage(children.head, intLit(children(1), "n"),
          top = true)
      }),
    (FunctionIdentifier("graft_phrase_matches"),
      new ExpressionInfo(classOf[graft.functions.PhraseMatchCount].getName,
        "graft_phrase_matches"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_phrase_matches(text, array('phrase', ...))")
        graft.functions.PhraseMatchCount(children.head,
          strArrayLit(children(1), "phrases"))
      }))

  /** A foldable array<string> literal (e.g. `array('a', 'b')`) → Seq. */
  private def strArrayLit(e: Expression, what: String): Seq[String] = {
    val ok = e.foldable && (e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    })
    if (!ok) throw new IllegalArgumentException(
      s"$what must be a foldable array<string> literal, got $e")
    val data = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until data.numElements()).map { i =>
      val u = data.getUTF8String(i)
      if (u == null) throw new IllegalArgumentException(
        s"$what must not contain NULL elements (element $i is NULL)")
      u.toString
    }
  }

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(s, org.apache.spark.sql.types.StringType) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Table-valued functions over the versioned store, for SQL-only users:
    * {{{
    *   SELECT * FROM graft_table('/data/dest/delta')           -- snapshot
    *   SELECT * FROM graft_table('/data/dest/delta', 3)        -- versionAsOf
    *   SELECT * FROM graft_changes('/data/dest/delta', 1, 5)   -- CDF slice
    *   SELECT * FROM graft_change_feed('/data/dest/delta', 1, 5) -- _change_type feed
    *   SELECT * FROM graft_history('/data/dest/delta')         -- DESCRIBE HISTORY
    *   SELECT * FROM delta_table('/ext/tbl')                   -- FOREIGN Delta snapshot
    *   SELECT * FROM delta_changes('/ext/tbl', 1, 5)           -- FOREIGN table_changes
    *   SELECT * FROM delta_row_ids('/ext/tbl')                 -- + _row_id identity
    * }}}
    * The builder runs at analysis time on the driver; the returned plan is
    * the same manifest-backed scan the Scala API produces (GraftFileIndex
    * skipping, pushdown, codegen all intact — a WHERE on the TVF prunes
    * dirs like any other filtered read). */
  private[graft] val tableBuilders: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = {
    def table(path: Expression) = new graft.store.VersionedTable(
      org.apache.spark.sql.SparkSession.active, strLit(path, "path"))
    Seq(
      (FunctionIdentifier("graft_table"),
        new ExpressionInfo(classOf[graft.store.VersionedTable].getName, "graft_table"),
        (children: Seq[Expression]) => {
          require(children.size == 1 || children.size == 2,
            "graft_table(path[, versionAsOf])")
          val t = table(children.head)
          val df = if (children.size == 2) t.readVersion(longLit(children(1), "versionAsOf"))
            else t.read()
          df.queryExecution.logical
        }),
      (FunctionIdentifier("graft_changes"),
        new ExpressionInfo(classOf[graft.store.VersionedTable].getName, "graft_changes"),
        (children: Seq[Expression]) => {
          require(children.size == 3, "graft_changes(path, fromVersion, toVersion)")
          table(children.head).readChanges(
            longLit(children(1), "fromVersion"), longLit(children(2), "toVersion"))
            .queryExecution.logical
        }),
      (FunctionIdentifier("graft_change_feed"),
        new ExpressionInfo(classOf[graft.store.VersionedTable].getName, "graft_change_feed"),
        (children: Seq[Expression]) => {
          require(children.size == 3, "graft_change_feed(path, fromVersion, toVersion)")
          table(children.head).readChangeFeed(
            longLit(children(1), "fromVersion"), longLit(children(2), "toVersion"))
            .queryExecution.logical
        }),
      (FunctionIdentifier("graft_history"),
        new ExpressionInfo(classOf[graft.store.VersionedTable].getName, "graft_history"),
        (children: Seq[Expression]) => {
          require(children.size == 1, "graft_history(path)")
          table(children.head).history().queryExecution.logical
        }),
      // FOREIGN Delta tables, SQL-only: the external reader
      // (checkpoint+JSON resolution, column mapping, DVs, stats skipping)
      // and the batch change feed ride plain SELECTs — no Delta jar
      (FunctionIdentifier("delta_table"),
        new ExpressionInfo(classOf[graft.store.DeltaTable.type].getName, "delta_table"),
        (children: Seq[Expression]) => {
          require(children.size == 1 || children.size == 2,
            "delta_table(path[, versionAsOf])")
          val spark = org.apache.spark.sql.SparkSession.active
          graft.store.DeltaTable.read(spark, strLit(children.head, "path"),
            versionAsOf = children.lift(1).map(longLit(_, "versionAsOf")))
            .queryExecution.logical
        }),
      (FunctionIdentifier("delta_changes"),
        new ExpressionInfo(classOf[graft.store.DeltaTable.type].getName, "delta_changes"),
        (children: Seq[Expression]) => {
          require(children.size == 3, "delta_changes(path, fromVersion, toVersion)")
          val spark = org.apache.spark.sql.SparkSession.active
          graft.store.DeltaTable.readChanges(spark, strLit(children.head, "path"),
            longLit(children(1), "fromVersion"), longLit(children(2), "toVersion"))
            .queryExecution.logical
        }),
      // row-tracked foreign tables: the snapshot plus the protocol's
      // stable `_row_id` / `_row_commit_version` identity columns
      (FunctionIdentifier("delta_row_ids"),
        new ExpressionInfo(classOf[graft.store.DeltaTable.type].getName, "delta_row_ids"),
        (children: Seq[Expression]) => {
          require(children.size == 1 || children.size == 2,
            "delta_row_ids(path[, versionAsOf])")
          val spark = org.apache.spark.sql.SparkSession.active
          graft.store.DeltaTable.read(spark, strLit(children.head, "path"),
            versionAsOf = children.lift(1).map(longLit(_, "versionAsOf")),
            rowIds = true)
            .queryExecution.logical
        }))
  }

  /** Imperative registration on a live session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (id, info, b) => reg.registerFunction(id, info, b) }
    val treg = spark.sessionState.tableFunctionRegistry
    tableBuilders.foreach { case (id, info, b) => treg.registerFunction(id, info, b) }
  }
}
