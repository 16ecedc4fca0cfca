package graft

import java.util.{Collections, WeakHashMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.slf4j.LoggerFactory

/** Surfaces graft-owned observed metrics (`Dataset.observe` nodes named
  * `graft_*`) in the logs after every query — e.g. how many degenerate
  * LSH buckets or df-capped shingles the dedup guards dropped, so the
  * recall trade those caps make is visible in production instead of
  * silent (identical-doc floods are intentionally left to exact dedup).
  */
object GraftMetrics {

  private val log = LoggerFactory.getLogger(getClass)

  private val installed =
    Collections.synchronizedMap(new WeakHashMap[SparkSession, java.lang.Boolean]())

  private val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach {
        case (name, row) if name.startsWith("graft_") =>
          val kv = Option(row.schema)
            .map(_.fieldNames.zip(row.toSeq).map { case (k, v) => s"$k=$v" }.mkString(", "))
            .getOrElse(row.toString)
          // a nonzero DROP counter is a recall trade in effect — surface
          // it even at the default WARN session log level. Keyed on the
          // field-name convention (dropped_*/capped_*) so ordinary
          // counts (rows processed etc.) in future metrics stay at INFO.
          val dropped = Option(row.schema).exists(_.fieldNames.zip(row.toSeq).exists {
            case (k, n: Long) => (k.startsWith("dropped_") || k.startsWith("capped_")) && n != 0L
            case (k, n: Int) => (k.startsWith("dropped_") || k.startsWith("capped_")) && n != 0
            case _ => false
          })
          if (dropped) log.warn(s"$name: $kv") else log.info(s"$name: $kv")
        case _ =>
      }
    override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit = ()
  }

  /** Idempotently attach the metric logger to a session. */
  def install(spark: SparkSession): Unit =
    if (installed.put(spark, java.lang.Boolean.TRUE) == null)
      spark.listenerManager.register(listener)

  /** Run `body` (which should execute at least one action whose plan
    * carries graft_* observe nodes) and return its result together with
    * the captured metrics: metricName -> (fieldName -> value).
    *
    * This is the library-facing REPORT channel — the logging listener
    * above is the ops channel. QueryExecutionListener dispatch rides the
    * async listener bus, but every completed action has POSTED its
    * SQLExecutionEnd before the action call returns — so after `body`
    * returns, draining the bus (Bridge.waitListenerBusEmpty) is both
    * necessary and sufficient: multi-action bodies lose no late batches
    * (the old first-non-empty exit could), and a body with no observe
    * nodes returns as soon as the bus idles instead of burning the full
    * timeout. A plan whose observe nodes sit under an already-
    * materialized cached relation legitimately reports nothing (the
    * capped computation did not re-run) → empty map, not an error.
    */
  def collect[T](spark: SparkSession, waitSecs: Int = 10)(body: => T): (T, Map[String, Map[String, Any]]) = {
    val seen = new java.util.concurrent.ConcurrentHashMap[String, Map[String, Any]]()
    val capture = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach {
          case (name, row) if name.startsWith("graft_") =>
            val fields = Option(row.schema)
              .map(_.fieldNames.zip(row.toSeq).toMap)
              .getOrElse(Map.empty[String, Any])
            seen.put(name, fields)
          case _ =>
        }
      override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit = ()
    }
    spark.listenerManager.register(capture)
    try {
      val result = body
      val drained =
        org.apache.spark.sql.graftbridge.Bridge.waitListenerBusEmpty(spark, waitSecs * 1000L)
      if (!drained) {
        // Bus still busy at the deadline (shared-session contention):
        // fall back to a short bounded poll so an in-flight batch that
        // was about to land still gets captured.
        val deadline = System.nanoTime() + 2L * 1000 * 1000 * 1000
        while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      }
      import scala.jdk.CollectionConverters._
      (result, seen.asScala.toMap)
    } finally spark.listenerManager.unregister(capture)
  }
}
