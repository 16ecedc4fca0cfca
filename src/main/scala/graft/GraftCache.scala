package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset

/** Session-scoped registry for graft-owned persisted plans.
  *
  * Operators persist small intermediates (near-dup pair sets, shingle
  * relations) so multiple consumers inside one query share a single
  * computation. In a long-lived session those cached blocks would
  * otherwise accumulate: the harnesses (Verify / Bench) call [[clear]]
  * between queries, and library users embedding the catalogs can do the
  * same at their own batch boundaries.
  */
object GraftCache {

  private val registered = ArrayBuffer.empty[Dataset[_]]
  private val cleanups = ArrayBuffer.empty[() => Unit]

  /** Register an already-persisted dataset for later cleanup. */
  def register[T](ds: Dataset[T]): Dataset[T] = synchronized {
    registered += ds
    ds
  }

  /** Register an arbitrary cleanup thunk for blocks Dataset.unpersist
    * cannot reach (e.g. localCheckpoint RDD blocks, which live outside
    * the CacheManager — see MemoryResult). */
  def registerCleanup(f: () => Unit): Unit = synchronized {
    cleanups += f
  }

  /** Materialize a stage with its lineage TRUNCATED (localCheckpoint →
    * one flat LogicalRDD leaf) and register the block cleanup. Use
    * this instead of persist() whenever the stage sits ON TOP OF
    * another cached/persisted stage: nested cache levels reprint
    * their initial plans in the plan-description string on every
    * action under AQE — the O(2^depth) pathology the wikidata fixpoint
    * scaladoc documents — and a flat leaf keeps every downstream plan
    * constant-size. Measured on wd_modularity: 11.4 → 5.9 s warm from
    * this change alone. persist() remains right for DEPTH-1 stages
    * (directly over sources), where the plan nesting doesn't occur
    * and lazy materialization is preserved. */
  def truncate[T](ds: Dataset[T]): Dataset[T] = {
    val t = ds.localCheckpoint(eager = true)
    registerCleanup(() =>
      t.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => t.unpersist(blocking = false)
      })
    t
  }

  /** Unpersist every registered dataset, run every cleanup thunk, and
    * forget them all. The unpersist BLOCKS: with blocking=false the
    * block-removal storm of one query's caches runs concurrently with
    * whatever executes next, and the harnesses charge that eviction to
    * the NEXT query's timed window — measured as a 4-6x slowdown of the
    * successor after a cache-heavy predecessor (DocStress r11: a 13 s
    * query timed at 51 s). Blocking pins the cost to the clear() call
    * itself, which every harness runs between timings. */
  def clear(): Unit = synchronized {
    registered.foreach(_.unpersist(blocking = true))
    registered.clear()
    cleanups.foreach(f => f())
    cleanups.clear()
  }
}
