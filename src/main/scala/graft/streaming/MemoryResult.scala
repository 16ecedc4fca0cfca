package graft.streaming

import java.util.Collections

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
  *
  * LIFETIME CONTRACT: a drained frame is only usable until the next
  * `GraftCache.clear()`. Clearing unpersists the checkpoint blocks and
  * the frame's lineage is already truncated (that is what
  * localCheckpoint means), so a later action on it fails with
  * missing-block errors rather than recomputing. Callers must force
  * (write/collect) the result before any clear — the harness does —
  * and can assert the hazard explicitly via [[isLive]].
  */
object MemoryResult {

  // Weak keys: the registry must not keep result frames reachable after
  // callers drop them. The cleanup thunk below does hold a strong ref
  // until the next GraftCache.clear(), which is exactly the window in
  // which the frame is usable.
  private val live =
    Collections.synchronizedMap(new java.util.WeakHashMap[DataFrame, java.lang.Boolean]())

  /** True while `df`'s checkpoint blocks are still persisted — i.e. the
    * frame was produced by [[drain]] and no GraftCache.clear() has run
    * since. Specs assert this before reusing a drained result. */
  def isLive(df: DataFrame): Boolean = live.containsKey(df)

  def drain(s: SparkSession, name: String)(order: DataFrame => DataFrame): DataFrame = {
    val mat = order(s.table(name)).localCheckpoint(eager = true)
    val rdds = org.apache.spark.sql.graftbridge.Bridge.checkpointRdds(mat)
    live.put(mat, java.lang.Boolean.TRUE)
    GraftCache.registerCleanup { () =>
      rdds.foreach(_.unpersist(blocking = false))
      live.remove(mat)
    }
    s.catalog.dropTempView(name)
    mat
  }
}
