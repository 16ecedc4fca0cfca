package graft.streaming

import graft.GraftCache
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Drains a memory-sink table into a self-contained DataFrame and drops
  * the temp view, so repeated builder invocations (Verify + Bench + spec
  * runs in one session) don't accumulate per-invocation result tables
  * in the catalog for the session lifetime. The localCheckpoint
  * materializes the rows independent of the dropped view; its blocks
  * live OUTSIDE the CacheManager (Dataset.unpersist can't reach them),
  * so teardown registers the checkpointed RDDs themselves and
  * GraftCache.clear unpersists those directly.
  */
object MemoryResult {

  def drain(s: SparkSession, name: String)(order: DataFrame => DataFrame): DataFrame = {
    val mat = order(s.table(name)).localCheckpoint(eager = true)
    val rdds = org.apache.spark.sql.graftbridge.Bridge.checkpointRdds(mat)
    GraftCache.registerCleanup(() => rdds.foreach(_.unpersist(blocking = false)))
    s.catalog.dropTempView(name)
    mat
  }
}
