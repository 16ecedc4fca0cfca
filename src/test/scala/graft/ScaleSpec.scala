package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-design patterns from SURVEY §5, asserted on real plans:
  * bucketed writes co-locate joins (no shuffle), and two-phase salted
  * aggregation equals the direct aggregation it de-skews.
  */
class ScaleSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed tables join without a shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val t = Tables(spark, sf)
      // the in-memory catalog forgets tables between JVMs but leaves the
      // warehouse dirs behind — clear both before recreating
      Seq("g_orders_b", "g_lineitem_b").foreach { tbl =>
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        val dir = new java.io.File(s"${System.getProperty("java.io.tmpdir")}/graft-warehouse/$tbl")
        if (dir.exists()) {
          dir.listFiles().foreach(_.delete())
          dir.delete()
        }
      }
      t.orders.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("g_orders_b")
      t.lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("g_lineitem_b")
      val joined = spark
        .table("g_orders_b")
        .join(spark.table("g_lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: the bucket layout replaces both hash exchanges
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() === t.lineitem.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("two-phase salted aggregation equals direct aggregation") {
    val e = Tables(spark, sf).events
    // skewed key -> salt to 8 subkeys, partial-agg, then final agg
    val salted = e
      .withColumn("salt", pmod(hash(col("event_id")), lit(8)))
      .groupBy("event_type", "salt")
      .agg(count(lit(1)).as("pn"), sum(col("value").cast("decimal(38,4)")).as("ps"))
      .groupBy("event_type")
      .agg(sum(col("pn")).as("n"), sum(col("ps")).cast("double").as("total"))
    val direct = e
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(38,4)")).cast("double").as("total"))
    assert(
      salted.orderBy("event_type").collect().toSeq ===
        direct.orderBy("event_type").collect().toSeq)
  }
}
