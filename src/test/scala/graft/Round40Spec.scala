package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SnapshotCatalog, SnapshotTable}

/** Round-40 wave: TEMPORAL RETENTION — `DELETE FROM events WHERE ts <
  * cutoff` on a days-partitioned table. With the timestamp stats
  * channel in place, the metadata-only DELETE proof
  * (ManifestPruning.provesAll) is timestamp-aware: a day-aligned
  * cutoff drops whole period files at METADATA cost (zero data files
  * opened, mode=delete, no new files — the retention sweep a 100 TB
  * event table runs nightly), while a mid-day cutoff falls back to
  * the copy-on-write rewrite with exact results — never an
  * approximate drop.
  */
class Round40Spec extends AnyFunSuite {
  import TestSpark._

  private def freshCatalog(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_snap40").toString
    val cat = "g40" + wh.takeRight(8).replaceAll("[^0-9a-zA-Z]", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private def fill(cat: String): Unit = {
    // 4 days x 24 hourly rows
    spark.range(96)
      .select(expr("timestamp_micros(CAST(1704067200000000 + id * 3600000000 AS BIGINT))")
        .as("ts"), col("id").as("v"))
      .createOrReplaceTempView("g40_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM g40_src")
  }

  test("a day-aligned retention DELETE drops whole period files at metadata " +
      "cost: mode=delete, zero new files, survivors untouched") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (ts TIMESTAMP NOT NULL, v BIGINT) " +
      "PARTITIONED BY (days(ts))")
    fill(cat)
    val table = s"$wh/t"
    val before = SnapshotTable.manifest(table, 2L)
    assert(before.files.size === 4)
    spark.sql(s"DELETE FROM $cat.t WHERE ts < timestamp'2024-01-03 00:00:00'")
    val m = SnapshotTable.manifest(table, 3L)
    assert(m.extra.get("mode").contains("delete"),
      "a provable cutoff must take the metadata-only drop, not a rewrite")
    assert(m.files.size === 2)
    assert(m.files.toSet.subsetOf(before.files.toSet),
      "survivors must be the parent's files verbatim — zero rewrites")
    assert(spark.table(s"$cat.t").count() === 48)
    assert(spark.table(s"$cat.t").agg(min("v")).collect()(0).getLong(0) === 48L)
  }

  test("a mid-day cutoff is NOT provable file-whole and falls back to the " +
      "copy-on-write rewrite — exact, never approximate") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (ts TIMESTAMP NOT NULL, v BIGINT) " +
      "PARTITIONED BY (days(ts))")
    fill(cat)
    val table = s"$wh/t"
    val before = SnapshotTable.manifest(table, 2L).files.map(_.path).toSet
    spark.sql(s"DELETE FROM $cat.t WHERE ts < timestamp'2024-01-02 12:00:00'")
    val m = SnapshotTable.manifest(table, 3L)
    assert(m.extra.get("mode").contains("merge"),
      "the straddling file forces the row-level rewrite path")
    assert(m.files.exists(f => !before(f.path)),
      "the rewrite writes the straddling day's surviving half")
    assert(m.files.nonEmpty && m.files.forall(
      _.stats.get(SnapshotTable.TemporalStat).exists { case (lo, hi) => lo == hi }),
      "the rewritten files keep their period stamps (CoW routes through the layout)")
    assert(spark.table(s"$cat.t").count() === 60)
    assert(spark.table(s"$cat.t").agg(min("v")).collect()(0).getLong(0) === 36L)
  }

  test("retention composes with expiry: drop old days, expire old snapshots, " +
      "vacuum reclaims the dropped files") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (ts TIMESTAMP NOT NULL, v BIGINT) " +
      "PARTITIONED BY (days(ts))")
    fill(cat)
    val table = s"$wh/t"
    spark.sql(s"DELETE FROM $cat.t WHERE ts < timestamp'2024-01-02 00:00:00'")
    val (_, reclaimed) = SnapshotTable.vacuum(table, retainLast = 1)
    assert(reclaimed >= 1, "the dropped day's file must reclaim")
    assert(spark.table(s"$cat.t").count() === 72)
    // the layout keeps serving: a one-day read plans one file
    val rq = spark.table(s"$cat.t")
      .filter(col("ts") >= expr("timestamp'2024-01-03 00:00:00'") &&
        col("ts") < expr("timestamp'2024-01-04 00:00:00'"))
    assert(rq.count() === 24)
  }
}
