package org.apache.spark.sql.graft

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.store.DirStats

/** Manifest-backed [[FileIndex]]: the seam that makes graft's per-dir stats
  * skipping TRANSPARENT to Catalyst (the delta-spark architecture — Delta
  * plugs its transaction-log file listing into Spark's file source exactly
  * this way, keeping the vectorized parquet reader, pushdown, and codegen
  * while owning WHICH files get listed).
  *
  * At planning time Spark hands `listFiles` the pushed `dataFilters`
  * (already resolved catalyst conjuncts — including filters Catalyst
  * derived, not just what the user typed); dirs whose recorded
  * min/max/nullCount stats refute them are dropped WITHOUT ever issuing a
  * file-listing RPC. At 100 TB that is the difference between listing a
  * handful of trailing dirs and listing the whole table before the first
  * task launches. Surviving dirs are listed lazily and cached per index
  * instance (one plan = one listing), then parquet row-group pruning takes
  * over inside the scan.
  */
final class GraftFileIndex(
    spark: SparkSession,
    tableRoot: Path,
    dirs: Seq[(String, Option[DirStats.Stats])],
    dataSchema: StructType) extends FileIndex {

  private val fs = tableRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val listed = TrieMap.empty[String, Array[FileStatus]]

  /** (selected, total) dirs of the last `listFiles` — plan-diagnostic hook
    * for specs and PlanCheck. */
  @volatile var lastPruning: Option[(Int, Int)] = None

  private def filesOf(dir: String): Array[FileStatus] =
    listed.getOrElseUpdate(dir,
      fs.listStatus(new Path(tableRoot, s"data/$dir")).filter { st =>
        st.isFile && st.getPath.getName.endsWith(".parquet") &&
          !st.getPath.getName.startsWith(".") && !st.getPath.getName.startsWith("_")
      })

  override def rootPaths: Seq[Path] = Seq(tableRoot)

  override def partitionSchema: StructType = StructType(Nil)

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val conjuncts = dataFilters.flatMap(DirStats.conjunctsOfExpr)
    val keep =
      if (conjuncts.isEmpty) dirs
      else dirs.filter { case (_, stats) => DirStats.maybeMatches(stats, conjuncts) }
    lastPruning = Some((keep.size, dirs.size))
    Seq(PartitionDirectory(InternalRow.empty, keep.toArray.flatMap(d => filesOf(d._1))))
  }

  override def inputFiles: Array[String] =
    dirs.toArray.flatMap(d => filesOf(d._1)).map(_.getPath.toString)

  override def refresh(): Unit = listed.clear()

  /** Exact when every dir carries byte stats (all post-upgrade commits);
    * otherwise a deliberately huge estimate so the planner never broadcasts
    * a relation it cannot size. */
  override def sizeInBytes: Long = {
    val sizes = dirs.map(_._2.flatMap(s => if (s.bytes > 0) Some(s.bytes) else None))
    if (sizes.forall(_.isDefined)) sizes.flatten.sum else Long.MaxValue / 4
  }
}

object GraftFileIndex {
  /** Plan a parquet scan over `dirs` through the manifest-backed index. */
  def scan(
      spark: SparkSession, tableRoot: String,
      dirs: Seq[(String, Option[DirStats.Stats])],
      schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val index = new GraftFileIndex(cs, new Path(tableRoot), dirs, schema)
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty[String, String])(cs)
    cs.baseRelationToDataFrame(relation)
  }
}
