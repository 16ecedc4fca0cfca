package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.graftbridge.Bridge

/** User-facing entry points for the custom operators. */
object GraftOps {

  /** Top k rows per group by `orderCols` (use .desc/.asc Columns; bare
    * columns sort ascending). Equivalent to row_number-over-window +
    * filter, without the per-group sort. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], k: Int, orderCols: Column*): DataFrame = {
    val spark = df.sparkSession
    // idempotently make the planner aware of the node
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    val ordering = orderCols.map(c =>
      Bridge.expressionEager(c) match {
        case s: SortOrder => s
        case e => SortOrder(e, Ascending)
      })
    val node = TopKPerGroupNode(
      groupCols.map(Bridge.expressionEager),
      ordering,
      k,
      Bridge.logicalPlan(df))
    Bridge.ofRows(spark, node)
  }
}
