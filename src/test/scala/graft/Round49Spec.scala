package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SnapshotCatalog, SnapshotTable}

/** Round-49 wave: METADATA-ONLY COLUMN RENAME (Iceberg's field-ID
  * indirection re-expressed through the ordinal, which add-at-end-only
  * evolution keeps stable). Pins the one-props-commit contract, exact
  * reads across name epochs on both the API and the V2/SQL route,
  * time travel serving each snapshot's own names, the SPJ gate under
  * mixed epochs, the historical-name collision guards, and the
  * declaration-reference refusals.
  */
class Round49Spec extends AnyFunSuite {
  import TestSpark._

  private def freshCatalog(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_snap49").toString
    val cat = "g49" + wh.takeRight(8).replaceAll("[^0-9a-zA-Z]", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("rename mid-history: one props commit, zero files, exact reads " +
      "across three name epochs, time travel serves each snapshot's " +
      "own names") {
    val table = java.nio.file.Files.createTempDirectory("graft49_api").toString + "/t"
    val d1 = spark.range(10).select(col("id").as("k"), (col("id") * 2).as("v"))
    SnapshotTable.commit(d1, table, append = false)                     // v1
    val m1files = SnapshotTable.manifest(table, 1L).files.map(_.path)
    assert(SnapshotTable.renameColumn(table, "v", "qty") === 2L)        // v2
    val m2 = SnapshotTable.manifest(table, 2L)
    assert(m2.extra.get("mode").contains("props") &&
      m2.files.map(_.path) == m1files, "rename is metadata-only")
    assert(m2.schema.fieldNames.toSeq === Seq("k", "qty"))
    assert(SnapshotTable.namesAt(m2, 1L) === Seq("k", "v"))
    assert(SnapshotTable.namesAt(m2, 2L) === Seq("k", "qty"))
    val d2 = spark.range(10, 20).select(col("id").as("k"), (col("id") * 2).as("qty"))
    SnapshotTable.commit(d2, table, append = true)                      // v3
    assert(SnapshotTable.renameColumn(table, "qty", "amount") === 4L)   // v4
    val d3 = spark.range(20, 30).select(col("id").as("k"), (col("id") * 2).as("amount"))
    SnapshotTable.commit(d3, table, append = true)                      // v5
    // three epochs in one read, positional mapping exact
    val got = SnapshotTable.read(spark, table).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === (0L until 30L).map(k => (k, k * 2)))
    // filters on the renamed column hit OLD files' rows too
    assert(SnapshotTable.read(spark, table)
      .where(col("amount") < 10).count() === 5)
    // time travel: each snapshot under its own names
    assert(SnapshotTable.read(spark, table, Some(1L)).columns.toSeq === Seq("k", "v"))
    assert(SnapshotTable.read(spark, table, Some(3L)).columns.toSeq === Seq("k", "qty"))
    assert(SnapshotTable.read(spark, table, Some(3L))
      .agg(sum("qty")).collect()(0).getLong(0) === (0L until 20L).map(_ * 2).sum)
    // the feed refuses a range crossing the rename, serves each side
    val e = intercept[Exception] {
      SnapshotTable.changeFeedIncremental(spark, table, 1L, 5L, "k")
    }
    assert(e.getMessage.contains("crosses a column rename"))
    assert(SnapshotTable.changeFeedIncremental(spark, table, 4L, 5L, "k")
      .count() === 10)
  }

  test("SQL route: ALTER TABLE RENAME COLUMN, mixed-epoch scan reads " +
      "exact through the V2 dispatch, SPJ gates off and compaction " +
      "restores it under the current names") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (ck BIGINT NOT NULL, x BIGINT) " +
      "PARTITIONED BY (bucket(4, ck))")
    val table = s"$wh/t"
    spark.sql(s"INSERT INTO $cat.t SELECT id, id * 3 FROM range(100)")
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN x TO y")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id * 3 FROM range(100, 200)")
    // exact values + residual filtering on the renamed column over
    // files that physically store the OLD name
    assert(spark.table(s"$cat.t").agg(sum("y")).collect()(0).getLong(0) ===
      (0L until 200L).map(_ * 3).sum)
    assert(spark.table(s"$cat.t").where(col("y") % 2 === 0).count() === 100)
    assert(spark.sql(s"SELECT x FROM $cat.t VERSION AS OF 2").count() === 100)
    // SPJ gates off while epochs are mixed — and the plan says why
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j1 = spark.table(s"$cat.t").as("a")
        .join(spark.table(s"$cat.t").as("b"), "ck").select("ck")
      assert(j1.collect().length === 200)
      assert(graft.Stage.shuffleCount(j1) > 0, "mixed name epochs must not SPJ")
      assert(graft.Stage.executedNodes(j1).collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.exists(_.description().contains("mixed rename epochs")))
      spark.sql(s"CALL $cat.system.compact('t')")
      val j2 = spark.table(s"$cat.t").as("a")
        .join(spark.table(s"$cat.t").as("b"), "ck").select("ck")
      assert(j2.collect().length === 200)
      assert(graft.Stage.shuffleCount(j2) === 0,
        "compaction rewrites every file under the current names — SPJ returns")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    assert(spark.table(s"$cat.t").agg(sum("y")).collect()(0).getLong(0) ===
      (0L until 200L).map(_ * 3).sum)
  }

  test("the state-based changeFeed crosses rename AND add-at-end " +
      "boundaries positionally: pre-images report under current names, " +
      "the added tail null-fills") {
    val table = java.nio.file.Files.createTempDirectory("graft49_cf").toString + "/t"
    val d1 = spark.range(6).select(col("id").as("k"), (col("id") * 2).as("v"))
    SnapshotTable.commit(d1, table, append = false)                    // v1
    SnapshotTable.renameColumn(table, "v", "qty")                      // v2
    // overwrite at the new schema + a new trailing column: k=1 deleted,
    // k=2 updated, k=99 inserted
    val d2 = spark.range(6).filter(col("id") =!= 1)
      .select(col("id").as("k"),
        (col("id") * 2 + when(col("id") === 2, 7).otherwise(0)).as("qty"),
        lit(null).cast("long").as("flag"))
      .unionByName(spark.sql("SELECT 99L AS k, 0L AS qty, 5L AS flag"))
    SnapshotTable.commit(d2, table, append = false)                    // v3
    val feed = SnapshotTable.changeFeed(spark, table, 1L, 3L, "k")
      .select("_change_type", "k", "qty", "flag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sortBy(t => (t._2, t._1))
    assert(feed.toSeq === Seq(
      ("delete", 1L, 2L, -1L),
      ("update_postimage", 2L, 11L, -1L), ("update_preimage", 2L, 4L, -1L),
      ("insert", 99L, 0L, 5L)),
      "positional mapping: renamed pre-images under the current name, " +
        "the added tail null-fills (unchanged rows with null flags drop)")
  }

  test("guards: declaration-referenced columns refuse, historical names " +
      "never reused (rename target or added column), drop/retype still " +
      "refused") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (ck BIGINT NOT NULL, x BIGINT) " +
      "PARTITIONED BY (bucket(4, ck)) TBLPROPERTIES('statsColumns'='x')")
    val table = s"$wh/t"
    spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(10)")
    val e1 = intercept[Exception] { SnapshotTable.renameColumn(table, "ck", "ck2") }
    assert(e1.getMessage.contains("referenced by a table declaration"))
    val e2 = intercept[Exception] { SnapshotTable.renameColumn(table, "x", "x2") }
    assert(e2.getMessage.contains("referenced by a table declaration"),
      "a declared stats column refuses too")
    val e3 = intercept[Exception] { SnapshotTable.renameColumn(table, "nope", "n2") }
    assert(e3.getMessage.contains("no column"))
    // a clean column renames; its OLD name is then poisoned for reuse
    val (cat2, wh2) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat2.t (k BIGINT NOT NULL, v BIGINT)")
    val t2 = s"$wh2/t"
    spark.sql(s"INSERT INTO $cat2.t SELECT id, id FROM range(10)")
    SnapshotTable.renameColumn(t2, "v", "w")
    val e4 = intercept[Exception] { SnapshotTable.renameColumn(t2, "w", "v") }
    assert(e4.getMessage.contains("previous name"))
    val e5 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat2.t ADD COLUMNS (v BIGINT)")
    }
    assert(e5.getMessage.contains("PREVIOUS name"))
    spark.sql(s"ALTER TABLE $cat2.t ADD COLUMNS (fresh BIGINT)")
    assert(SnapshotTable.manifest(t2, SnapshotTable.currentVersion(t2))
      .schema.fieldNames.toSeq === Seq("k", "w", "fresh"))
    val e6 = intercept[Exception] { spark.sql(s"ALTER TABLE $cat2.t DROP COLUMN w") }
    assert(e6.getMessage.contains("RENAME COLUMN") ||
      e6.getMessage.contains("not supported"))
  }
}
