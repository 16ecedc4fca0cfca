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

  test("selective compaction under outstanding position deletes: " +
      "rewritten groups materialize their positions, the kept-file " +
      "remainder re-lands consolidated, fully-consumed sidecars drop, " +
      "cold files ride byte-identical") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (ts TIMESTAMP NOT NULL, k BIGINT NOT NULL) " +
      "PARTITIONED BY (days(ts)) TBLPROPERTIES('statsColumns'='k')")
    val table = s"$wh/t"
    def ins(lo: Long, hi: Long, day: Long): Unit = {
      spark.range(lo, hi).select(
          expr(s"timestamp_micros(CAST($T0 + $day * $D AS BIGINT))").as("ts"),
          col("id").as("k"))
        .createOrReplaceTempView("g46_p")
      spark.sql(s"INSERT INTO $cat.t SELECT * FROM g46_p")
    }
    ins(0, 10, 0)   // v2: day0 file A
    ins(10, 20, 1)  // v3: day1 file (the cold, single-file day)
    ins(20, 30, 0)  // v4: day0 file B — day0 now fragmented
    // trickle batch 1 (v5): one sidecar naming a DAY0 file AND the
    // day1 file — must SPLIT; batch 2 (v6): names only a day0 file —
    // fully consumed by the rewrite
    def posOf(keys: Long*) = spark.table(s"$cat.t")
      .where(col("k").isin(keys: _*)).select("_file", "_pos")
    SnapshotTable.deletePositions(posOf(0L, 10L), table)
    SnapshotTable.deletePositions(posOf(20L), table)
    assert(SnapshotTable.posDvRefs(SnapshotTable.manifest(table, 6L)).size === 2)
    val preRows = spark.table(s"$cat.t").select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(preRows === (0L until 30L).filterNot(Set(0L, 10L, 20L)))
    val day1 = SnapshotTable.manifest(table, 6L).files.find(
      _.stats(SnapshotTable.TemporalStat)._1 == T0 / D + 1).get
    val (groups, files, v) = SnapshotTable.compactFragmented(spark, table)
    assert(groups === 1 && files === 2, "only day0 is fragmented")
    val m = SnapshotTable.manifest(table, v)
    assert(m.files.exists(f => f.path == day1.path && f.size == day1.size),
      "the cold day rides byte-identical")
    // the sidecar set split: one consolidated ref remains, holding
    // ONLY the day1 row, its range tagged to the day1 file
    val refs = SnapshotTable.posDvRefs(m)
    assert(refs.size === 1 && refs.head.count === 1L &&
      refs.head.range.contains((day1.path, day1.path)),
      s"want one consolidated single-row ref on day1, got $refs")
    // row identity is exactly the pre-compaction state: day0's
    // positions materialized in the rewrite, day1's still applies
    // reader-side through the V2 route
    assert(spark.table(s"$cat.t").select("k").collect()
      .map(_.getLong(0)).sorted.toSeq === preRows)
    // and the rewritten day0 files physically dropped k=0 and k=20
    val day0 = m.files.filterNot(_.path == day1.path)
    assert(day0.forall(_.seq == v))
    assert(spark.read.parquet(day0.map(_.path): _*).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq ===
      ((1L until 10L) ++ (21L until 30L)))
  }

  test("mixed layout generations still refuse, naming compactEvolved") {
    val (cat2, wh2) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat2.t (ts TIMESTAMP NOT NULL, k BIGINT) " +
      "PARTITIONED BY (days(ts))")
    spark.range(4).select(
        expr(s"timestamp_micros(CAST($T0 + (id % 2) * $D AS BIGINT))").as("ts"),
        col("id").as("k"))
      .createOrReplaceTempView("g46_r")
    spark.sql(s"INSERT INTO $cat2.t SELECT * FROM g46_r")
    spark.sql(s"ALTER TABLE $cat2.t SET TBLPROPERTIES('evolveLayout'='hours(ts)')")
    spark.sql(s"INSERT INTO $cat2.t SELECT * FROM g46_r")
    val e2 = intercept[Exception] { SnapshotTable.compactFragmented(spark, s"$wh2/t") }
    assert(e2.getMessage.contains("compactEvolved"))
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
