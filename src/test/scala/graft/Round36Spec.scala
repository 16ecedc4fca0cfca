package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SnapshotCatalog, SnapshotTable}

/** Round-36 wave: `ALTER TABLE SET/UNSET TBLPROPERTIES` — post-create
  * evolution of the non-layout declarations (statsColumns /
  * maxRowsPerFile / morKey) as one mode=props metadata commit — plus
  * the identity-cluster cardinality guard (a million-key "cluster" now
  * refuses loudly, naming bucket(n, k) as the right layout).
  */
class Round36Spec extends AnyFunSuite {
  import TestSpark._

  private def freshCatalog(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_snap36").toString
    val cat = "g36" + wh.takeRight(8).replaceAll("[^0-9a-zA-Z]", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  test("SET statsColumns applies to FUTURE commits; the props commit is " +
      "metadata-only and incremental readers scan across it") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(50)")       // v2
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES('statsColumns'='k')") // v3
    spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(50, 100)")  // v4
    val table = s"$wh/t"
    val m3 = SnapshotTable.manifest(table, 3L)
    assert(m3.extra.get("mode").contains("props"))
    assert(m3.files.map(_.path) === SnapshotTable.manifest(table, 2L).files.map(_.path),
      "a props commit must reference the same files verbatim")
    assert(SnapshotTable.statsColumnsOf(m3) === Seq("k"))
    val m4 = SnapshotTable.manifest(table, 4L)
    val fresh = m4.files.filter(f => !m3.files.exists(_.path == f.path))
    assert(fresh.nonEmpty && fresh.forall(_.stats.contains("k")),
      "commits after the SET must record the declared stats")
    assert(m4.files.filter(f => m3.files.exists(_.path == f.path))
      .forall(!_.stats.contains("k")),
      "pre-SET files keep their recorded (stat-less) entries")
    // incremental read across the props commit: exactly v4's inserts
    assert(SnapshotTable.readIncremental(spark, table, 2L, 4L).count() === 50)
  }

  test("SET maxRowsPerFile caps future writes; SET morKey flips DML to " +
      "merge-on-read; UNSET morKey flips it back") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(100)")
    val table = s"$wh/t"
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES(" +
      "'maxRowsPerFile'='10', 'morKey'='k')")
    val filesBefore = SnapshotTable.manifest(table,
      SnapshotTable.currentVersion(table)).files.map(_.path).toSet
    spark.sql(s"UPDATE $cat.t SET v = v + 1 WHERE k % 10 = 3")
    val mAfter = SnapshotTable.manifest(table, SnapshotTable.currentVersion(table))
    assert(filesBefore.subsetOf(mAfter.files.map(_.path).toSet),
      "post-SET UPDATE must plan merge-on-read (zero files rewritten)")
    assert(mAfter.extra.get("dvfiles").exists(_.nonEmpty))
    // the post-image rode the new 10-row cap trivially; a bulk insert proves it
    spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(1000, 1050)")
    val mIns = SnapshotTable.manifest(table, SnapshotTable.currentVersion(table))
    val freshFiles = mIns.files.filterNot(f => mAfter.files.exists(_.path == f.path))
    assert(freshFiles.size >= 5, s"50 rows under a 10-row cap, got ${freshFiles.size}")
    // UNSET morKey refuses nothing here and flips DML back to CoW —
    // but first the DV chain must materialize
    SnapshotTable.compactSnapshot(spark, table)
    spark.sql(s"ALTER TABLE $cat.t UNSET TBLPROPERTIES('morKey')")
    val preCow = SnapshotTable.manifest(table,
      SnapshotTable.currentVersion(table)).files.map(_.path).toSet
    spark.sql(s"UPDATE $cat.t SET v = v + 1 WHERE k % 10 = 4")
    val mCow = SnapshotTable.manifest(table, SnapshotTable.currentVersion(table))
    assert(mCow.extra.get("dvfiles").forall(_.isEmpty),
      "post-UNSET UPDATE must plan copy-on-write — no new deletion vectors")
    assert(!preCow.subsetOf(mCow.files.map(_.path).toSet),
      "copy-on-write must rewrite the touched files")
  }

  test("property refusals: layout/engine keys, unknown columns, nullable " +
      "morKey, morKey across an outstanding differently-keyed DV chain") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT NOT NULL, v BIGINT, s STRING NOT NULL)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id, CAST(id AS STRING) FROM range(20)")
    for (bad <- Seq("bucket", "cluster", "dvfiles", "temporal")) {
      val e = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES('$bad'='x')")
      }
      assert(e.getMessage.contains("not evolvable"), s"$bad: ${e.getMessage}")
    }
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES('statsColumns'='missing')")
    }
    assert(e1.getMessage.contains("unknown column"))
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES('morKey'='v')")
    }
    assert(e2.getMessage.contains("NOT NULL"))
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES('maxRowsPerFile'='0')")
    }
    assert(e3.getMessage.contains("positive"))
    // a DV chain keyed on k blocks re-keying morKey to s
    import spark.implicits._
    SnapshotTable.deleteKeys(Seq(1L).toDF("k"), s"$wh/t", "k")
    val e4 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES('morKey'='s')")
    }
    assert(e4.getMessage.contains("cannot move"))
    // same-key morKey is fine even with the chain outstanding
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES('morKey'='k')")
    assert(SnapshotTable.morKeyOf(SnapshotTable.manifest(s"$wh/t",
      SnapshotTable.currentVersion(s"$wh/t"))) === Some("k"))
  }

  test("SHOW TBLPROPERTIES reflects the declarations and their evolution") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (ts TIMESTAMP NOT NULL, k BIGINT NOT NULL, " +
      "v BIGINT) PARTITIONED BY (days(ts), bucket(4, k)) " +
      "TBLPROPERTIES('statsColumns'='k')")
    def props(): Map[String, String] =
      spark.sql(s"SHOW TBLPROPERTIES $cat.t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    val p0 = props()
    assert(p0.get("statsColumns").contains("k"))
    assert(p0.get("layout.temporal").contains("ts:days"))
    assert(p0.get("layout.bucket").contains("k:4"))
    assert(p0.get("version").contains("1"))
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES('maxRowsPerFile'='500')")
    val p1 = props()
    assert(p1.get("maxRowsPerFile").contains("500"))
    assert(p1.get("version").contains("2"))
  }

  test("identity clustering refuses partition-grade-cardinality abuse, " +
      "naming bucket(n, k) as the layout") {
    val wh = java.nio.file.Files.createTempDirectory("graft_snap36c").toString
    val e = intercept[Exception] {
      SnapshotTable.commit(
        spark.range(SnapshotTable.MaxIdentityClusterKeys + 1L)
          .select(col("id").as("k"), col("id").as("v")),
        s"$wh/t", append = false, clusterBy = Some("k"))
    }
    assert(e.getMessage.contains("bucket(n, k)"))
    assert(SnapshotTable.currentVersion(s"$wh/t") === 0L,
      "the refused commit must publish nothing")
  }
}
