package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. ExpressionUtils is private[sql], so
  * custom native expressions (graft.expressions.*) go through this
  * package-located shim — the conventional pattern for Spark extension
  * libraries. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree to a catalyst Expression.
    * Function-registry builders need this: the lazy ColumnNodeExpression
    * wrapper from `expression` is only converted at the Dataset API
    * boundary, and expressions produced by a FunctionBuilder never pass
    * that boundary — they would reach codegen unconverted. */
  def expressionEager(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Analyzed logical plan of a frame (for building custom plan nodes). */
  def logicalPlan(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Wrap a logical plan back into a DataFrame. */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Checkpoint RDDs referenced by a frame's plan (LogicalRDD leaves).
    * Dataset.unpersist routes through the CacheManager, which never
    * holds localCheckpoint blocks — freeing them needs the RDD itself. */
  def checkpointRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect { case l: execution.LogicalRDD => l.rdd }

  /** A batch DataFrame over parquet `paths` whose plan is flagged
    * isStreaming=true — what a V1 streaming Source must hand back from
    * getBatch (FileStreamSource's own construction): the scan stays a
    * declarative file relation (pushdown, pruning intact) while
    * satisfying MicroBatchExecution's streaming-leaf assertion. */
  def streamingParquetBatch(
      spark: SparkSession,
      paths: Seq[String],
      schema: types.StructType): DataFrame = {
    val ss = spark.asInstanceOf[classic.SparkSession]
    if (paths.isEmpty)
      ss.internalCreateDataFrame(
        ss.sparkContext.emptyRDD[catalyst.InternalRow], schema, isStreaming = true)
    else {
      val ds = execution.datasources.DataSource(
        ss, className = "parquet", paths = paths, userSpecifiedSchema = Some(schema))
      classic.Dataset.ofRows(ss,
        execution.datasources.LogicalRelation(
          ds.resolveRelation(checkFilesExist = false), isStreaming = true))
    }
  }

  /** Wrap a DETERMINISTIC batch frame as the micro-batch a V1 streaming
    * Source hands back from getBatch: the frame's physical RDD under an
    * isStreaming=true leaf (the construction MemoryStream and the V1
    * KafkaSource use — `internalCreateDataFrame(rdd, schema,
    * isStreaming = true)`). The RDD lineage is lazy and executes on the
    * executors inside the streaming query; nothing is materialized to
    * staging storage, so a source whose slices are pure computation
    * (e.g. the rate source's arithmetic over range) pays ZERO I/O per
    * micro-batch and leaves nothing to reclaim. The caller owns
    * determinism: a WAL replay re-plans the same offset range and must
    * recompute identical rows. `schema` is the SOURCE's declared schema
    * — arithmetic plans mark division results nullable, and the
    * micro-batch must carry the schema the provider advertised (the
    * caller guarantees no actual nulls). */
  def streamingBatch(df: DataFrame, schema: types.StructType): DataFrame = {
    val ss = df.sparkSession.asInstanceOf[classic.SparkSession]
    ss.internalCreateDataFrame(df.queryExecution.toRdd, schema, isStreaming = true)
  }

  /** Block until the async listener bus has delivered everything posted
    * so far (bounded). QueryExecutionListener callbacks ride this bus,
    * so "bus empty" == "every completed action's observed metrics have
    * reached their listeners" — the deterministic way to wait for
    * metrics instead of polling with a fixed grace period. Returns true
    * if the bus drained inside the timeout. `listenerBus` is
    * private[spark]; this shim lives under org.apache.spark so the
    * access is legal. */
  def waitListenerBusEmpty(spark: SparkSession, timeoutMillis: Long): Boolean =
    try { spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMillis); true }
    catch { case _: java.util.concurrent.TimeoutException => false }
}
