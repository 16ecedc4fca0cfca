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
}
