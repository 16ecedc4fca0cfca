package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotTable

/** Round-26 wave: the incremental change feed
  * (`changeFeedIncremental` — Delta's table_changes shape at O(touched
  * files) per commit; src_snapshot_cdf_incremental carries the oracled
  * flow). Pins: single-commit equivalence with the state-based
  * changeFeed across every commit mode, the append short-circuit, the
  * carried-file prune (behavioral: a provably-missed file is deleted
  * from disk and the feed still serves), compaction feeding zero rows,
  * declaration carry on API appends, and the refusals.
  */
class Round26Spec extends AnyFunSuite {
  import TestSpark._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_snap26").toString + "/t"

  private def ordersNarrow = Tables(spark, sf).orders
    .select("o_orderkey", "o_orderpriority", "o_totalprice")

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("single-commit equivalence with the state-based changeFeed " +
      "(append, MoR upsert, DV-only delete, overwrite)") {
    val table = tmpTable()
    val base = ordersNarrow.filter(col("o_orderkey") % 3 === 0)
    SnapshotTable.commit(
      base.repartitionByRange(4, col("o_orderkey")).sortWithinPartitions("o_orderkey"),
      table, append = false, statsColumns = Seq("o_orderkey"))
    // v2: append
    SnapshotTable.commit(ordersNarrow.filter(col("o_orderkey") % 3 === 1),
      table, append = true)
    // v3: MoR upsert (updates + deletes via DV + post-images)
    val batch = base.filter(col("o_orderkey") % 10 === 3)
      .withColumn("o_totalprice", col("o_totalprice") + 500.0)
      .withColumn("_del", lit(false))
      .unionByName(base.filter(col("o_orderkey") % 10 === 7)
        .withColumn("_del", lit(true)))
    SnapshotTable.mergeMoR(batch, table, "o_orderkey", deleteCol = Some("_del"))
    // v4: DV-only delete (no post-images at all — the CDC stream's
    // deleteKeys arm)
    SnapshotTable.deleteKeys(
      base.filter(col("o_orderkey") % 10 === 9).select("o_orderkey"),
      table, "o_orderkey")
    // v5: overwrite with a different slice (full state change)
    SnapshotTable.commit(ordersNarrow.filter(col("o_orderkey") % 5 === 0),
      table, append = false, statsColumns = Seq("o_orderkey"))
    for (v <- 2L to 5L) {
      val inc = SnapshotTable.changeFeedIncremental(
        spark, table, v - 1, v, "o_orderkey").drop("_commit_version")
      val state = SnapshotTable.changeFeed(spark, table, v - 1, v, "o_orderkey")
      assert(collectSorted(inc) === collectSorted(state),
        s"commit $v: incremental feed must equal the state diff")
    }
    // multi-version: the union of per-commit diffs, versions stamped
    val multi = SnapshotTable.changeFeedIncremental(spark, table, 1L, 3L, "o_orderkey")
    assert(multi.filter(col("_commit_version") === 2L)
      .select("_change_type").distinct().collect().map(_.getString(0)).toSeq
      === Seq("insert"))
    assert(multi.filter(col("_commit_version") === 3L && col("_change_type") === "delete")
      .count() === base.filter(col("o_orderkey") % 10 === 7).count())
  }

  test("append short-circuit: no join in the plan, inserts = the added files") {
    val table = tmpTable()
    SnapshotTable.commit(ordersNarrow.filter(col("o_orderkey") % 2 === 0),
      table, append = false)
    SnapshotTable.commit(ordersNarrow.filter(col("o_orderkey") % 2 === 1),
      table, append = true)
    val inc = SnapshotTable.changeFeedIncremental(spark, table, 1L, 2L, "o_orderkey")
    assert(inc.count() === ordersNarrow.filter(col("o_orderkey") % 2 === 1).count())
    assert(inc.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, "a pure append must not pay a diff join")
  }

  test("carried-file prune is real: a provably-missed file can be gone from disk") {
    val table = tmpTable()
    val base = ordersNarrow.filter(col("o_orderkey") % 3 === 0)
    SnapshotTable.commit(
      base.repartitionByRange(6, col("o_orderkey")).sortWithinPartitions("o_orderkey"),
      table, append = false, statsColumns = Seq("o_orderkey"))
    val maxk = base.agg(max(col("o_orderkey"))).collect()(0).getLong(0) / 5
    val batch = base.filter(col("o_orderkey") % 10 === 3 && col("o_orderkey") < maxk)
      .withColumn("o_totalprice", col("o_totalprice") + 500.0)
    SnapshotTable.mergeMoR(batch, table, "o_orderkey")
    val m = SnapshotTable.manifest(table, 2L)
    // a carried file whose recorded range provably misses the DV window
    val far = m.files.filter(f => f.seq < 2 && f.stats.get("o_orderkey").exists {
      case (mn, _) => mn >= maxk
    })
    assert(far.nonEmpty, "fixture needs a provably-missed carried file")
    val moved = far.map { f =>
      val p = java.nio.file.Paths.get(f.path)
      val bak = java.nio.file.Paths.get(f.path + ".bak")
      java.nio.file.Files.move(p, bak); (p, bak)
    }
    try {
      val inc = SnapshotTable.changeFeedIncremental(spark, table, 1L, 2L, "o_orderkey")
      val n = batch.count()
      assert(inc.filter(col("_change_type") === "update_preimage").count() === n,
        "the feed must serve without opening provably-missed carried files")
      assert(inc.filter(col("_change_type") === "update_postimage").count() === n)
    } finally moved.foreach { case (p, bak) => java.nio.file.Files.move(bak, p) }
  }

  test("compaction commits feed zero change rows") {
    val table = tmpTable()
    SnapshotTable.commit(ordersNarrow.repartition(4), table, append = false)
    val (_, v) = SnapshotTable.compactSnapshot(spark, table, targetBytes = 1L << 30)
    val inc = SnapshotTable.changeFeedIncremental(spark, table, v - 1, v, "o_orderkey")
    assert(inc.count() === 0,
      "a rewrite that changes no row must feed no change")
  }

  test("refusals: wrong DV identity, schema boundary, bad range") {
    val table = tmpTable()
    SnapshotTable.commit(ordersNarrow, table, append = false)
    SnapshotTable.mergeMoR(
      ordersNarrow.filter(col("o_orderkey") % 100 === 1)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0),
      table, "o_orderkey")
    val e1 = intercept[Exception] {
      SnapshotTable.changeFeedIncremental(spark, table, 1L, 2L, "o_orderpriority").count()
    }
    assert(e1.getMessage.contains("must diff on that identity"))
    intercept[Exception] {
      SnapshotTable.changeFeedIncremental(spark, table, 2L, 2L, "o_orderkey")
    }
    // an ADD-AT-END boundary now serves (null-filled tail — Round48Spec
    // owns it); only a NON-extending boundary still refuses
    val t2 = tmpTable()
    SnapshotTable.commit(ordersNarrow, t2, append = false)
    SnapshotTable.commit(ordersNarrow.withColumn("extra", lit(1L)), t2, append = true)
    assert(SnapshotTable.changeFeedIncremental(spark, t2, 1L, 2L, "o_orderkey")
      .where(col("_change_type") === "insert").count() === ordersNarrow.count())
  }

  test("API appends carry table declarations (statsColumns, morKey, bucket)") {
    val (cat, wh) = {
      val wh = java.nio.file.Files.createTempDirectory("graft_snap26c").toString
      val cat = "g26" + wh.takeRight(8).replaceAll("[^0-9a-zA-Z]", "")
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.SnapshotCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      (cat, wh)
    }
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k)) " +
      "TBLPROPERTIES('statsColumns'='v', 'morKey'='k')")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(10)")
    SnapshotTable.commit(
      spark.range(10, 12).select(col("id").as("k"), col("id").as("v")),
      s"$wh/t", append = true)
    val m = SnapshotTable.manifest(s"$wh/t", 3L)
    assert(SnapshotTable.bucketSpecOf(m) === Some(("k", 4)))
    assert(SnapshotTable.morKeyOf(m) === Some("k"))
    assert(SnapshotTable.statsColumnsOf(m) === Seq("v"))
  }
}
