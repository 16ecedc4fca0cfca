package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SnapshotCatalog, SnapshotTable}

/** Round-20 wave: SQL row-level DML over the snapshot format — UPDATE,
  * MERGE INTO, and the DELETE fallback, implemented as a group-based
  * copy-on-write RowLevelOperation (the scan's actual planned file set
  * is what the commit replaces; untouched files ride verbatim).
  */
class Round20Spec extends AnyFunSuite {
  import TestSpark._

  private def freshCatalog(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_cat20").toString
    val cat = "g" + wh.replaceAll(".*cat20", "").replaceAll("[^0-9a-zA-Z]", "").take(12)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  /** A table of orders keyed on k, range-clustered into 4 files with
    * recorded k stats — the shape where a selective mutation should
    * touch a strict file subset. */
  private def ordersTable(cat: String): (String, Long) = {
    spark.sql(s"CREATE TABLE $cat.o (k BIGINT, prio STRING, price DOUBLE) " +
      "TBLPROPERTIES('statsColumns'='k')")
    Tables(spark, sf).orders
      .select(col("o_orderkey").as("k"), col("o_orderpriority").as("prio"),
        col("o_totalprice").as("price"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .createOrReplaceTempView("graft20_src")
    spark.sql(s"INSERT INTO $cat.o SELECT * FROM graft20_src")
    val bounds = SnapshotTable.manifest(s"${spark.conf.get(s"spark.sql.catalog.$cat.warehouse")}/o", 2L)
      .files.map(_.stats("k")).sortBy(_._1)
    ("o", bounds.head._2) // first file's max key
  }

  test("UPDATE: selective rewrite touches a strict file subset, untouched files verbatim") {
    val (cat, wh) = freshCatalog()
    val (_, cut) = ordersTable(cat)
    val m2 = SnapshotTable.manifest(s"$wh/o", 2L)
    val before = spark.table(s"$cat.o").select(sum(col("price").cast("decimal(38,4)")))
      .collect()(0).getDecimal(0)
    val touched = spark.table(s"$cat.o").filter(col("k") <= cut).count()
    spark.sql(s"UPDATE $cat.o SET price = price + 1.0 WHERE k <= $cut")
    val m3 = SnapshotTable.manifest(s"$wh/o", 3L)
    assert(m3.extra("mode") === "merge")
    // rows correct: exactly `touched` rows bumped by 1.0
    val after = spark.table(s"$cat.o").select(sum(col("price").cast("decimal(38,4)")))
      .collect()(0).getDecimal(0)
    assert(after.subtract(before).doubleValue() === touched.toDouble)
    assert(spark.table(s"$cat.o").count() === m2.files.map(_.nstats("k")._2).sum)
    // group granularity: the three files whose range excludes the cut
    // survive VERBATIM (the runtime group filter narrowed the scan)
    val survivors = m3.files.map(_.path).toSet
    val untouchedBefore = m2.files.filter(_.stats("k")._1 > cut).map(_.path)
    assert(untouchedBefore.nonEmpty)
    assert(untouchedBefore.forall(survivors),
      s"untouched files must be carried verbatim:\n${m3.files.map(_.path).mkString("\n")}")
    assert(!m2.files.filter(_.stats("k")._1 <= cut).map(_.path).forall(survivors),
      "the touched file must have been replaced")
    // time travel still reads the pre-update state
    assert(spark.sql(s"SELECT CAST(SUM(CAST(price AS DECIMAL(38,4))) AS DECIMAL(38,4)) " +
      s"FROM $cat.o VERSION AS OF 2").collect()(0).getDecimal(0) === before)
  }

  test("MERGE INTO: matched update + not-matched insert, one transactional commit") {
    val (cat, wh) = freshCatalog()
    ordersTable(cat)
    val total = spark.table(s"$cat.o").count()
    spark.sql(s"CREATE TABLE $cat.updates (k BIGINT, prio STRING, price DOUBLE)")
    spark.sql(s"INSERT INTO $cat.updates VALUES (1, 'X-MERGED', 0.0), " +
      s"(${total * 10 + 7}, 'X-NEW', 42.0)")
    spark.sql(
      s"""MERGE INTO $cat.o t USING $cat.updates s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET t.prio = s.prio, t.price = s.price
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = spark.table(s"$cat.o")
      .filter(col("prio").startsWith("X-"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((1L, "X-MERGED"), (total * 10 + 7, "X-NEW")))
    assert(spark.table(s"$cat.o").count() === total + 1)
    val head = SnapshotTable.manifest(s"$wh/o", SnapshotTable.currentVersion(s"$wh/o"))
    assert(head.extra("mode") === "merge")
    // incremental readers refuse across the rewrite, like the API merge
    intercept[Exception] {
      SnapshotTable.readIncremental(spark, s"$wh/o", 2L, head.version)
    }
  }

  test("DELETE falls back to group rewrite when the metadata proof fails") {
    val (cat, wh) = freshCatalog()
    val (_, cut) = ordersTable(cat)
    val before = spark.table(s"$cat.o").count()
    val victims = spark.table(s"$cat.o").filter(col("k") <= cut - 1).count()
    // cut-1 is mid-file: not provable file-whole -> row-level rewrite
    spark.sql(s"DELETE FROM $cat.o WHERE k <= ${cut - 1}")
    assert(spark.table(s"$cat.o").count() === before - victims)
    val head = SnapshotTable.manifest(s"$wh/o", SnapshotTable.currentVersion(s"$wh/o"))
    assert(head.extra("mode") === "merge",
      "an unprovable DELETE must rewrite groups (mode=merge), not refuse")
    // ...while a provable file-whole DELETE stays METADATA-ONLY
    val bounds = head.files.map(_.stats("k")).sortBy(_._1)
    spark.sql(s"DELETE FROM $cat.o WHERE k > ${bounds.dropRight(1).last._2}")
    val head2 = SnapshotTable.manifest(s"$wh/o", SnapshotTable.currentVersion(s"$wh/o"))
    assert(head2.extra("mode") === "delete",
      "a provable DELETE must stay metadata-only (mode=delete)")
  }

  test("DELETE on a stats-less condition over a multi-file clustered table loses nothing") {
    // the r13 lost-rows defect: the rewrite pushes the condition into
    // the scan as a GROUP-pruning hint; forwarding it to parquet let
    // row-group pruning silently EMPTY files whose rows all survive,
    // and the replace commit then dropped them (c_acctbal has no
    // manifest stats here, so the manifest kept every file while
    // parquet skipped the fully-surviving ones). The row-level scan
    // now reads planned files completely.
    val (cat, wh) = freshCatalog()
    val ct = s"$wh/c2"
    val cust = Tables(spark, sf).customer.select("c_custkey", "c_nationkey", "c_acctbal")
    SnapshotTable.commit(cust.filter(col("c_custkey") % 2 === 0),
      ct, append = false, clusterBy = Some("c_nationkey"))
    cust.filter(col("c_custkey") % 2 === 1).createOrReplaceTempView("graft20_odd")
    spark.sql(s"INSERT INTO $cat.c2 SELECT * FROM graft20_odd")
    // every key group now holds TWO files; the condition column has no
    // recorded stats anywhere
    spark.sql(s"DELETE FROM $cat.c2 WHERE c_acctbal < 0")
    val got = spark.table(s"$cat.c2").groupBy("c_nationkey").count()
      .orderBy("c_nationkey").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val want = cust.filter(col("c_acctbal") >= 0).groupBy("c_nationkey").count()
      .orderBy("c_nationkey").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got === want,
      "a group rewrite must carry every surviving row of every scanned file")
  }

  test("UPDATE on a CLUSTERED table keeps one key value per file") {
    val (cat, wh) = freshCatalog()
    val ct = s"$wh/clustered"
    SnapshotTable.commit(
      Tables(spark, sf).customer.select("c_custkey", "c_nationkey", "c_acctbal"),
      ct, append = false, clusterBy = Some("c_nationkey"))
    spark.sql(s"UPDATE $cat.clustered SET c_acctbal = 0.0 WHERE c_nationkey = 3")
    val m = SnapshotTable.manifest(ct, SnapshotTable.currentVersion(ct))
    assert(m.files.forall(f =>
      f.stats.get("c_nationkey").exists { case (mn, mx) => mn == mx }),
      "the rewrite must preserve the one-key-per-file SPJ invariant")
    assert(spark.table(s"$cat.clustered")
      .filter(col("c_nationkey") === 3 && col("c_acctbal") =!= 0.0).count() === 0)
    assert(spark.table(s"$cat.clustered").count()
      === Tables(spark, sf).customer.count())
  }
}
