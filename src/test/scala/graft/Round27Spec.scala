package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftBucket, SnapshotCatalog, SnapshotTable}

/** Round-27 wave: the per-file row cap
  * (TBLPROPERTIES('maxRowsPerFile')) — the read-parallelism floor for
  * hot buckets and huge identity-cluster keys — and the catalog-served
  * `bucket` function callable from plain SQL.
  */
class Round27Spec extends AnyFunSuite {
  import TestSpark._

  private def freshCatalog(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_snap27").toString
    val cat = "g27" + wh.takeRight(8).replaceAll("[^0-9a-zA-Z]", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("row cap: a hot bucket splits into capped files; stamps and SPJ survive") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.a (k BIGINT NOT NULL, v BIGINT) " +
      "PARTITIONED BY (bucket(4, k)) TBLPROPERTIES('maxRowsPerFile'='10')")
    spark.sql(s"CREATE TABLE $cat.b (k BIGINT NOT NULL, w BIGINT) " +
      "PARTITIONED BY (bucket(4, k)) TBLPROPERTIES('maxRowsPerFile'='10')")
    spark.sql(s"INSERT INTO $cat.a SELECT id, id FROM range(200)")
    spark.sql(s"INSERT INTO $cat.b SELECT id, -id FROM range(200)")
    val m = SnapshotTable.manifest(s"$wh/a", 2L)
    assert(m.files.size > 4, s"200 rows / cap 10 must split past one-file-per-bucket")
    assert(m.files.forall(_.nstats.values.headOption.forall(_._2 <= 10L)),
      "every file must respect the cap")
    assert(m.files.forall(
      _.stats.get(SnapshotTable.BucketStat).exists { case (lo, hi) => lo == hi }),
      "capped files keep their one-bucket stamp")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table(s"$cat.a").join(spark.table(s"$cat.b"), Seq("k"))
      assert(j.count() === 200)
      assert(Stage.shuffleCount(j) === 0,
        "multi-file bucket groups must still SPJ with zero exchanges")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("row cap on identity clustering: a huge key splits, min==max per file holds") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, v BIGINT) " +
      "PARTITIONED BY (k) TBLPROPERTIES('maxRowsPerFile'='25')")
    // 3 keys, one of them hot (100 rows)
    spark.sql(s"INSERT INTO $cat.t SELECT CASE WHEN id < 100 THEN 0 ELSE id % 2 + 1 END, id " +
      "FROM range(140)")
    val m = SnapshotTable.manifest(s"$wh/t", 2L)
    assert(m.files.forall(_.stats.get("k").exists { case (lo, hi) => lo == hi }),
      "every file still holds exactly one key value")
    val hotFiles = m.files.count(_.stats.get("k").exists(_._1 == 0L))
    assert(hotFiles >= 4, s"the hot key must split across files, got $hotFiles")
    assert(spark.table(s"$cat.t").filter(col("k") === 0).count() === 100)
  }

  test("row cap rides MoR post-image writers and API appends carry the declaration") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, v BIGINT) " +
      "TBLPROPERTIES('morKey'='k', 'maxRowsPerFile'='10')")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(50)")
    spark.sql(s"UPDATE $cat.t SET v = v + 1000 WHERE k < 30")
    val m = SnapshotTable.manifest(s"$wh/t", SnapshotTable.currentVersion(s"$wh/t"))
    val postImages = m.files.filter(_.seq == m.version)
    assert(postImages.nonEmpty)
    assert(postImages.forall(_.nstats.values.headOption.forall(_._2 <= 10L)),
      "delta post-image files must respect the cap")
    assert(SnapshotTable.maxRowsPerFileOf(m) === Some(10L))
    val got = spark.table(s"$cat.t").agg(sum("v")).collect()(0).getLong(0)
    val want = (0L until 50L).map(i => if (i < 30) i + 1000 else i).sum
    assert(got === want)
  }

  test("maxRowsPerFile=0 refuses at CREATE TABLE") {
    val (cat, _) = freshCatalog()
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.z (k BIGINT) TBLPROPERTIES('maxRowsPerFile'='0')")
    }
    assert(e.getMessage.contains("must be positive"))
  }

  test("the catalog-served bucket function is callable from SQL and matches the writer") {
    val (cat, _) = freshCatalog()
    val got = spark.sql(s"SELECT $cat.bucket(8, 371L) AS b").collect()(0).getInt(0)
    assert(got === GraftBucket.of(371L, 8))
    val gs = spark.sql(s"SELECT $cat.bucket(4, 'key-137') AS b").collect()(0).getInt(0)
    assert(gs === GraftBucket.ofAny("key-137", 4).get)
  }
}
