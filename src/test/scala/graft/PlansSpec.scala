package graft

import graft.plans.GraftOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom operator path: TopKPerGroupNode -> strategy -> bounded-heap
  * exec. Must be plan-visibly sort-free and value-identical to the
  * window formulation. */
class PlansSpec extends AnyFunSuite {
  import TestSpark._

  test("topKPerGroup equals window+filter and plans without Window/Sort") {
    val orders = Tables(spark, sf).orders.select("o_custkey", "o_orderkey", "o_totalprice")
    val custom = GraftOps
      .topKPerGroup(orders, Seq(col("o_custkey")), 3, col("o_totalprice").desc, col("o_orderkey"))
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .drop("rn")

    val sortKeys = Seq(col("o_custkey"), col("o_orderkey"))
    assert(
      custom.orderBy(sortKeys: _*).collect() === viaWindow.orderBy(sortKeys: _*).collect())

    assert(PlanCheck.has[graft.plans.TopKPerGroupExec](custom), PlanCheck.render(custom))
    assert(
      !PlanCheck.has[org.apache.spark.sql.execution.window.WindowExec](custom),
      PlanCheck.render(custom))
    assert(!PlanCheck.has[org.apache.spark.sql.execution.SortExec](custom), PlanCheck.render(custom))
  }

  test("TopKRewriteRule turns window+filter+drop(rn) into the custom operator") {
    val orders = Tables(spark, sf).orders.select("o_custkey", "o_orderkey", "o_totalprice")
    // strategy must be known to the planner for the rewritten node
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKPerGroupStrategy
    }
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.TopKRewriteRule
    try {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      def topk = orders
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey") // rn projected away -> rewrite fires
      val on = topk
      assert(PlanCheck.has[graft.plans.TopKPerGroupExec](on), PlanCheck.render(on))
      assert(
        !PlanCheck.has[org.apache.spark.sql.execution.window.WindowGroupLimitExec](on) &&
          !PlanCheck.has[org.apache.spark.sql.execution.window.WindowExec](on),
        PlanCheck.render(on))
      assert(!PlanCheck.has[org.apache.spark.sql.execution.SortExec](on), PlanCheck.render(on))
      // opt-out switch: disabling the conf keeps Spark's window plan
      spark.conf.set(graft.plans.TopKRewriteRule.EnabledKey, "false")
      try {
        val off = topk
        assert(!PlanCheck.has[graft.plans.TopKPerGroupExec](off), PlanCheck.render(off))
        assert(
          PlanCheck.has[org.apache.spark.sql.execution.window.WindowExec](off),
          PlanCheck.render(off))
      } finally spark.conf.unset(graft.plans.TopKRewriteRule.EnabledKey)
      // keeping rn blocks the rewrite (conservative)
      val keepRn = orders
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
      assert(
        PlanCheck.has[org.apache.spark.sql.execution.window.WindowExec](keepRn),
        PlanCheck.render(keepRn))
      // values identical to the un-rewritten plan
      val expected = keepRn.select("o_custkey", "o_orderkey")
      assert(
        topk.orderBy("o_custkey", "o_orderkey").collect() ===
          expected.orderBy("o_custkey", "o_orderkey").collect())
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.TopKRewriteRule)
    }
  }

  test("topKPerGroup with k larger than any group returns everything") {
    val orders = Tables(spark, sf).orders.select("o_custkey", "o_orderkey")
    val all = GraftOps.topKPerGroup(orders, Seq(col("o_custkey")), 1000000, col("o_orderkey"))
    assert(all.count() === orders.count())
  }

  test("topKPerGroup global top-k (no group columns)") {
    val orders = Tables(spark, sf).orders
    val top = GraftOps.topKPerGroup(orders, Nil, 5, col("o_totalprice").desc)
    val expected = orders.orderBy(col("o_totalprice").desc).limit(5)
    assert(
      top.select("o_orderkey").orderBy("o_orderkey").collect() ===
        expected.select("o_orderkey").orderBy("o_orderkey").collect())
  }
}
