package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{SparkSession, classic}

/** `private[sql]` seams a V1 streaming `Source` implementation needs (the
  * delta-spark architecture: `DeltaSource.getBatch` returns batch scans
  * whose leaves are re-marked `isStreaming = true` so MicroBatchExecution
  * accepts them in place of the streaming relation). */
object StreamingBridge {

  /** Re-mark every batch leaf of `df`'s analyzed plan as streaming. */
  def asStreaming(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
      case loc: LocalRelation if !loc.isStreaming => loc.copy(isStreaming = true)
      case rdd: org.apache.spark.sql.execution.LogicalRDD if !rdd.isStreaming =>
        rdd.copy(isStreaming = true)(cs, None, None)
    }
    classic.Dataset.ofRows(cs, plan)
  }

  /** Empty DataFrame whose plan is already streaming (an empty micro-batch
    * for ranges with no qualifying commits). */
  def emptyStreaming(spark: SparkSession, schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      cs.sparkContext.emptyRDD[InternalRow], schema, isStreaming = true)
  }
}
