package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SnapshotCatalog, SnapshotTable}

/** Round-46 wave: SELECTIVE COMPACTION (`compactFragmented` — Iceberg's
  * filtered rewrite_data_files). Pins the equality-DV interplay (subset
  * reads DV-applied, the chain carried for untouched files, nothing
  * double-applies), the position-delete and mixed-generation refusals,
  * and the compound (time × hash) arm keeping both stamps.
  */
class Round46Spec extends AnyFunSuite {
  import TestSpark._

  private def freshCatalog(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_snap46").toString
    val cat = "g46" + wh.takeRight(8).replaceAll("[^0-9a-zA-Z]", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private val T0 = 1704067200000000L
  private val D = 86400000000L

  test("equality DVs through a selective rewrite: rewritten groups " +
      "materialize their deletes, the chain rides for untouched files, " +
      "nothing double-applies") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (ts TIMESTAMP NOT NULL, k BIGINT NOT NULL) " +
      "PARTITIONED BY (days(ts)) TBLPROPERTIES('statsColumns'='k')")
    val table = s"$wh/t"
    // day0 rows in BOTH inserts (fragments), day1 only in the first
    def view(name: String, df: org.apache.spark.sql.DataFrame) = {
      df.createOrReplaceTempView(name); s"SELECT * FROM $name"
    }
    spark.sql(s"INSERT INTO $cat.t " + view("g46_a",
      spark.range(20).select(
        expr(s"timestamp_micros(CAST($T0 + (id % 2) * $D AS BIGINT))").as("ts"),
        col("id").as("k"))))
    spark.sql(s"INSERT INTO $cat.t " + view("g46_b",
      spark.range(20, 30).select(
        expr(s"timestamp_micros(CAST($T0 AS BIGINT))").as("ts"),
        col("id").as("k"))))
    // kill one key in each day — the chain predates the rewrite
    import spark.implicits._
    SnapshotTable.deleteKeys(Seq(0L, 1L).toDF("k"), table, "k") // day0+day1 keys
    val m0 = SnapshotTable.manifest(table, 4L)
    assert(m0.files.size === 3, "day0 x2 + day1 x1")
    // __tpart stamps are period ORDINALS (floorDiv), not representatives
    val day1Path = m0.files.find(
      _.stats(SnapshotTable.TemporalStat)._1 == T0 / D + 1).get.path
    val (groups, files, v) = SnapshotTable.compactFragmented(spark, table)
    assert(groups === 1 && files === 2, "only day0 is fragmented")
    val m = SnapshotTable.manifest(table, v)
    assert(m.files.map(_.path).contains(day1Path),
      "the single-file day rides verbatim")
    assert(m.extra.get("dvfiles").exists(_.nonEmpty),
      "the DV chain must ride for the untouched file")
    // day0's rewritten file materialized the delete of k=0; day1's
    // untouched file still drops k=1 reader-side — total exact
    val got = spark.table(s"$cat.t").orderBy("k").collect().map(_.getLong(1)).toSeq
    assert(got === ((2L until 30L).filter(k => k % 2 == 0 || k >= 20) ++
      (3L until 20L by 2)).sorted,
      "one materialized + one reader-side delete, nothing double-applied")
    assert(got.size === 28)
  }

  test("refusals: outstanding position deletes and mixed layout " +
      "generations both refuse with the cure named") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (ts TIMESTAMP NOT NULL, k BIGINT) " +
      "PARTITIONED BY (days(ts))")
    val table = s"$wh/t"
    spark.range(4).select(
        expr(s"timestamp_micros(CAST($T0 + (id % 2) * $D AS BIGINT))").as("ts"),
        col("id").as("k"))
      .createOrReplaceTempView("g46_r")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM g46_r")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM g46_r")
    import spark.implicits._
    val f = SnapshotTable.manifest(table, 3L).files.head.path
    SnapshotTable.deletePositions(Seq(0L).toDF("_pos").withColumn("_file", lit(f)),
      table)
    val e1 = intercept[Exception] { SnapshotTable.compactFragmented(spark, table) }
    assert(e1.getMessage.contains("position-delete"))
    // mixed generations
    val (cat2, wh2) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat2.t (ts TIMESTAMP NOT NULL, k BIGINT) " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO $cat2.t SELECT * FROM g46_r")
    spark.sql(s"ALTER TABLE $cat2.t SET TBLPROPERTIES('evolveLayout'='hours(ts)')")
    spark.sql(s"INSERT INTO $cat2.t SELECT * FROM g46_r")
    val e2 = intercept[Exception] { SnapshotTable.compactFragmented(spark, s"$wh2/t") }
    assert(e2.getMessage.contains("mixed layout generations"))
  }

  test("the compound arm: a fragmented (month, bucket) group rewrites " +
      "with BOTH stamps, cold groups ride verbatim") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (ts TIMESTAMP NOT NULL, k BIGINT NOT NULL, " +
      "v BIGINT) PARTITIONED BY (months(ts), bucket(2, k))")
    val table = s"$wh/t"
    // month0 x 2 buckets fragmented twice; month1 x 2 buckets once
    (0 until 2).foreach { i =>
      spark.range(40).select(
          expr(s"timestamp_micros(CAST($T0 + (CASE WHEN $i = 0 THEN (id % 2) " +
            s"ELSE 0 END) * 31 * $D AS BIGINT))").as("ts"),
          col("id").as("k"), col("id").as("v"))
        .createOrReplaceTempView(s"g46_c$i")
      spark.sql(s"INSERT INTO $cat.t SELECT * FROM g46_c$i")
    }
    val before = SnapshotTable.manifest(table, 3L)
    // month0 buckets hold files from both inserts; month1 only insert 0
    val (groups, _, v) = SnapshotTable.compactFragmented(spark, table)
    assert(groups === 2, s"the two fragmented (month0, bucket) groups, got $groups")
    val m = SnapshotTable.manifest(table, v)
    assert(m.files.forall(f =>
      f.stats.get(SnapshotTable.TemporalStat).exists(s => s._1 == s._2) &&
        f.stats.get(SnapshotTable.BucketStat).exists(s => s._1 == s._2)),
      "both stamps on every file after the selective rewrite")
    // month ordinals: Jan 2024 = (2024-1970)*12 = 648; month1 = Feb = 649
    val month1 = before.files.filter(
      _.stats(SnapshotTable.TemporalStat)._1 == 649L).map(_.path).toSet
    assert(month1.size === 2, "sanity: month1 holds one file per bucket")
    assert(month1.subsetOf(m.files.map(_.path).toSet),
      "month1's files ride verbatim")
    assert(spark.table(s"$cat.t").agg(sum("v")).collect()(0).getLong(0) ===
      2L * (0L until 40L).sum)
  }
}
