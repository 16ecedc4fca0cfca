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
    val pairs = graft.dedup.DedupCatalog
      .minhashPairsFrom(docs.select($"doc_id", $"lang", graft.functions.TextFunctions.shingleSet($"text").as("sh")))
      .collect()
    // the degenerate clique is dropped (its 300² pairs never material-
    // ize); the genuine near-dup pair is still found via its own bucket
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
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
