package graft.streaming

import graft.GraftCache
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Drains a memory-sink table into a self-contained DataFrame and drops
  * the temp view, so repeated builder invocations (Verify + Bench + spec
  * runs in one session) don't accumulate per-invocation result tables
  * in the catalog for the session lifetime. The localCheckpoint
  * materializes the rows independent of the dropped view and is
  * GraftCache-registered for harness teardown.
  */
object MemoryResult {

  def drain(s: SparkSession, name: String)(order: DataFrame => DataFrame): DataFrame = {
    val mat = GraftCache.register(order(s.table(name)).localCheckpoint(eager = true))
    s.catalog.dropTempView(name)
    mat
  }
}
