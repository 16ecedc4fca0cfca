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

    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.toLowerCase.contains("sortexec"), plan)
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
      val plan = topk.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup"), plan)
      assert(!plan.contains("WindowGroupLimit") && !plan.contains("Window ["), plan)
      assert(!plan.toLowerCase.contains("sortexec"), plan)
      // opt-out switch: disabling the conf keeps Spark's window plan
      spark.conf.set(graft.plans.TopKRewriteRule.EnabledKey, "false")
      try {
        val off = topk.queryExecution.executedPlan.toString
        assert(!off.contains("TopKPerGroup"), off)
        assert(off.contains("Window"), off)
      } finally spark.conf.unset(graft.plans.TopKRewriteRule.EnabledKey)
      // keeping rn blocks the rewrite (conservative)
      val keepRn = orders
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
      assert(keepRn.queryExecution.executedPlan.toString.contains("Window"))
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
