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

  test("LSH bucket cap bounds a degenerate boilerplate bucket") {
    import spark.implicits._
    // 300 identical boilerplate docs — one degenerate bucket per band,
    // width 300 >> cap: without the cap the band self-join alone is
    // ~16*300²/2 = 720k candidate rows. Plus one genuine near-dup pair
    // of distinct long docs (bucket width 2, survives the cap).
    val boiler = (0 until 300).map(i =>
      (10000L + i, "en", "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod"))
    val words = (0 until 40).map(i => s"tok$i").mkString(" ")
    val nearDup = Seq((1L, "en", words), (2L, "en", words + " extra"))
    val docs = (boiler ++ nearDup).toDF("doc_id", "lang", "text")
    // capture the graft_lsh_cap observed metric the cap emits — the
    // recall trade must be visible, not silent
    @volatile var observed: Option[org.apache.spark.sql.Row] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        // suites share the session: only claim the metric row with real
        // drops (this test is the only source of a non-empty cap drop)
        qe.observedMetrics.get("graft_lsh_cap")
          .filter(_.getAs[Long]("dropped_hot_buckets") > 0)
          .foreach(r => observed = Some(r))
      override def onFailure(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          error: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val pairs =
      try graft.dedup.DedupCatalog
        .minhashPairsFrom(docs.select($"doc_id", $"lang", graft.functions.TextFunctions.shingleSet($"text").as("sh")))
        .collect()
      finally GraftCache.clear()
    // the degenerate clique is dropped (its 300² pairs never material-
    // ize); the genuine near-dup pair is still found via its own bucket
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    // listener delivery is async — poll briefly
    val deadline = System.nanoTime() + 10_000_000_000L
    while (observed.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    try spark.listenerManager.unregister(listener)
    catch { case _: IllegalArgumentException => }
    val m = observed.getOrElse(fail("graft_lsh_cap metric never observed"))
    // all 16 bands of the 300-doc clique collide -> 16 dropped buckets,
    // 300 member rows each
    assert(m.getAs[Long]("dropped_hot_buckets") === 16L)
    assert(m.getAs[Long]("dropped_bucket_rows") === 4800L)
  }

  test("GraftCache.clear unpersists every graft-owned cached plan") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", (0 until 40).map(i => s"w$i").mkString(" ")),
      (2L, "en", (0 until 40).map(i => s"w$i").mkString(" ") + " extra"))
      .toDF("doc_id", "lang", "text")
    val pairs = graft.dedup.DedupCatalog.minhashPairsFrom(
      docs.select($"doc_id", $"lang", graft.functions.TextFunctions.shingleSet($"text").as("sh")))
    pairs.count()
    assert(pairs.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    GraftCache.clear()
    assert(pairs.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
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
