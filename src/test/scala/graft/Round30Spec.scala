package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftTruncate, GraftTruncateWUnbound, SnapshotCatalog, SnapshotTable}

/** Round-30 wave: the TRUNCATE transform (`PARTITIONED BY
  * (truncate(w, k))`) — the order-preserving sibling of bucket
  * (src_snapshot_truncate_spj carries the oracled flow). Pins the
  * floored-width algebra, the literal-free reporting trick (the width
  * rides the function NAME because Spark's clustering-satisfaction
  * check collectLeaves()-matches every transform child against the
  * join keys, and a literal can never match), refusals, and layout
  * survival under DML.
  */
class Round30Spec extends AnyFunSuite {
  import TestSpark._

  private def freshCatalog(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_snap30").toString
    val cat = "g30" + wh.takeRight(8).replaceAll("[^0-9a-zA-Z]", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("floored truncation groups negatives correctly; widths never equate") {
    assert(GraftTruncate.of(0L, 10) === 0L)
    assert(GraftTruncate.of(9L, 10) === 0L)
    assert(GraftTruncate.of(10L, 10) === 10L)
    assert(GraftTruncate.of(-1L, 10) === -10L)
    assert(GraftTruncate.of(-10L, 10) === -10L)
    assert(GraftTruncate.of(-11L, 10) === -20L)
    val b100 = GraftTruncateWUnbound(100).bind(StructType(Seq(StructField("_0", LongType))))
    val b200 = GraftTruncateWUnbound(200).bind(StructType(Seq(StructField("_0", LongType))))
    assert(b100.canonicalName() !== b200.canonicalName(),
      "SPJ must never equate different truncate widths")
    intercept[Exception] {
      GraftTruncateWUnbound(100).bind(StructType(Seq(StructField("_0", StringType))))
    }
  }

  test("CREATE TABLE refusals: non-integral key, bad width, reserved name") {
    val (cat, _) = freshCatalog()
    val e1 = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.a (k STRING) PARTITIONED BY (truncate(8, k))")
    }
    assert(e1.getMessage.contains("not an integral key"))
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.b (k BIGINT) PARTITIONED BY (truncate(0, k))")
    }
    assert(e2.getMessage.contains("width must be positive"))
    val e3 = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.c (k BIGINT, __trunc BIGINT) " +
        "PARTITIONED BY (truncate(8, k))")
    }
    assert(e3.getMessage.contains("reserved"))
  }

  test("NULL keys refuse; maintenance refuses; UPDATE rewrites through the layout") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "PARTITIONED BY (truncate(25, k))")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t VALUES (1, 1), (CAST(NULL AS BIGINT), 2)")
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("NULL truncate key refused"))
    spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(100)")
    // zorder and compaction both route to the layout-preserving
    // per-group rewrite now (Round32Spec owns compaction): every
    // truncate stamp survives the z rewrite
    val (_, zv) = SnapshotTable.compactZOrder(spark, s"$wh/t", Seq("k", "v"))
    assert(SnapshotTable.manifest(s"$wh/t", zv).files.forall(
      _.stats.get(SnapshotTable.TruncStat).exists { case (lo, hi) => lo == hi }),
      "per-group z-order must keep every truncate stamp")
    spark.sql(s"UPDATE $cat.t SET v = v + 1 WHERE k % 10 = 3")
    val m = SnapshotTable.manifest(s"$wh/t", SnapshotTable.currentVersion(s"$wh/t"))
    assert(m.files.nonEmpty && m.files.forall(
      _.stats.get(SnapshotTable.TruncStat).exists { case (lo, hi) => lo == hi }),
      "every post-UPDATE file must carry its one-group stamp")
    assert(spark.table(s"$cat.t").agg(sum("v")).collect()(0).getLong(0)
      === (0L until 100L).map(i => if (i % 10 == 3) i + 1 else i).sum)
  }

  test("an unstamped file degrades SPJ soundly (API append)") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.a (k BIGINT NOT NULL, v BIGINT) " +
      "PARTITIONED BY (truncate(50, k))")
    spark.sql(s"CREATE TABLE $cat.b (k BIGINT NOT NULL, w BIGINT) " +
      "PARTITIONED BY (truncate(50, k))")
    spark.sql(s"INSERT INTO $cat.a SELECT id, id FROM range(200)")
    spark.sql(s"INSERT INTO $cat.b SELECT id, -id FROM range(200)")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j0 = spark.table(s"$cat.a").join(spark.table(s"$cat.b"), Seq("k"))
      assert(j0.count() === 200)
      assert(Stage.shuffleCount(j0) === 0)
      SnapshotTable.commit(
        spark.range(1000, 1001).select(col("id").as("k"), col("id").as("v")),
        s"$wh/a", append = true)
      val j1 = spark.table(s"$cat.a").join(spark.table(s"$cat.b"), Seq("k"))
      assert(j1.count() === 200)
      assert(Stage.shuffleCount(j1) > 0,
        "an unstamped file must demote the reported partitioning")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("the 2-arg truncate function is callable from SQL, identical to the writer") {
    val (cat, _) = freshCatalog()
    assert(spark.sql(s"SELECT $cat.truncate(100, 371L) AS t").collect()(0).getLong(0)
      === GraftTruncate.of(371L, 100))
    assert(spark.sql(s"SELECT $cat.truncate(10, -11L) AS t").collect()(0).getLong(0)
      === -20L)
  }
}
