package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Cast, Expression, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.store.DirStats

/** One live file of an external Delta table: absolute path, log-recorded
  * size/mtime (no filesystem listing needed — the log IS the listing),
  * partition values as the protocol's string map (None = null), and
  * per-FILE stats parsed from the `add.stats` JSON when present. */
final case class DeltaFileEntry(
    path: Path,
    size: Long,
    mtime: Long,
    partitionValues: Map[String, Option[String]],
    stats: Option[DirStats.Stats])

/** [[FileIndex]] over an external Delta table's live add-set — the read-side
  * counterpart of [[GraftFileIndex]] (same architecture delta-spark uses:
  * the transaction log supplies the file listing AND the skipping stats, so
  * planning never issues a directory-listing RPC and Spark's vectorized
  * parquet reader handles the scan).
  *
  * Pruning happens at two grains, both from pushed filters at planning:
  *  - partition pruning: `partitionFilters` are bound by NAME to the
  *    partition schema (the same name-binding `PartitioningAwareFileIndex`
  *    does) and evaluated against each distinct partition tuple;
  *  - file skipping: `dataFilters` conjuncts are tested against each
  *    file's `add.stats` min/max/nullCount via [[DirStats.maybeMatches]]
  *    (missing stats never prune — sound).
  */
final class DeltaFileIndex(
    spark: SparkSession,
    tableRoot: Path,
    entries: Seq[DeltaFileEntry],
    override val partitionSchema: StructType,
    dataSchema: StructType) extends FileIndex {

  /** (selected files, total files) of the last `listFiles` — diagnostics. */
  @volatile var lastPruning: Option[(Int, Int)] = None

  private val zoneId = Option(spark.sessionState.conf.sessionLocalTimeZone)

  /** Partition values string → typed internal value, with Spark's own Cast
    * (the protocol serializes partition values exactly as castable SQL
    * strings: PROTOCOL.md "Partition Value Serialization"). */
  private def partRow(pv: Map[String, Option[String]]): InternalRow =
    InternalRow.fromSeq(partitionSchema.fields.toSeq.map { f =>
      pv.getOrElse(f.name, None) match {
        case None => null
        case Some(s) =>
          Cast(Literal(UTF8String.fromString(s), StringType), f.dataType, zoneId)
            .eval(InternalRow.empty)
      }
    })

  private lazy val grouped: Seq[(InternalRow, Seq[DeltaFileEntry])] =
    if (partitionSchema.isEmpty) Seq((InternalRow.empty, entries))
    else entries.groupBy(_.partitionValues).toSeq.map { case (pv, es) => (partRow(pv), es) }

  private def statusOf(e: DeltaFileEntry): FileStatus =
    new FileStatus(e.size, false, 1, 128L * 1024 * 1024, e.mtime, e.path)

  override def rootPaths: Seq[Path] = Seq(tableRoot)

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // bind partition predicates by (case-insensitive) name, the way
    // PartitioningAwareFileIndex.prunePartitions does
    val partPred = if (partitionFilters.isEmpty) None else Some(
      Predicate.create(partitionFilters.reduce(And).transform {
        case a: AttributeReference =>
          val idx = partitionSchema.fieldNames.indexWhere(_.equalsIgnoreCase(a.name))
          BoundReference(idx, partitionSchema.fields(idx).dataType, nullable = true)
      }, Nil))
    val conjuncts = dataFilters.flatMap(DirStats.conjunctsOfExpr)
    var kept = 0
    val out = grouped.flatMap { case (row, es) =>
      if (partPred.forall(_.eval(row))) {
        val keep =
          if (conjuncts.isEmpty) es
          else es.filter(e => DirStats.maybeMatches(e.stats, conjuncts))
        kept += keep.size
        if (keep.isEmpty) None
        else Some(PartitionDirectory(row, keep.map(statusOf).toArray))
      } else None
    }
    lastPruning = Some((kept, entries.size))
    out
  }

  override def inputFiles: Array[String] = entries.map(_.path.toString).toArray

  override def refresh(): Unit = ()

  /** Exact: every add action carries its size. */
  override def sizeInBytes: Long = entries.map(_.size).sum
}

object DeltaFileIndex {
  /** Plan a parquet scan over the live add-set. Output columns are
    * dataSchema ++ partitionSchema (Spark's file-source layout); callers
    * reorder to the table's declared order. */
  def scan(
      spark: SparkSession, tableRoot: Path,
      entries: Seq[DeltaFileEntry],
      partitionSchema: StructType,
      dataSchema: StructType): org.apache.spark.sql.DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val index = new DeltaFileIndex(cs, tableRoot, entries, partitionSchema, dataSchema)
    val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      location = index,
      partitionSchema = partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat(),
      options = Map.empty[String, String])(cs)
    cs.baseRelationToDataFrame(relation)
  }
}
