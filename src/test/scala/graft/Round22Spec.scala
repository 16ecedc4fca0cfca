package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SnapshotCatalog, SnapshotTable}

/** Round-22 wave: SQL maintenance procedures (Spark 4's native DSv2
  * `CALL` through ProcedureCatalog on SnapshotCatalog).
  *
  * Pins the two procedures the oracled query doesn't drive (compact,
  * vacuum) end to end — result row, version arithmetic, files on disk,
  * table still reading — plus every refusal arm: unknown procedure,
  * wrong namespace, path-escaping table arguments, and
  * rewrite_segments' already-consolidated no-op.
  */
class Round22Spec extends AnyFunSuite {
  import TestSpark._

  private def newCat(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_proc22").toString
    val cat = "gp" + System.nanoTime().toString.takeRight(9)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private def seeded(cat: String): Long = {
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT) TBLPROPERTIES('statsColumns'='k')")
    Tables(spark, sf).orders.select(col("o_orderkey").as("k")).repartition(6)
      .createOrReplaceTempView(s"graft_proc22_src_$cat")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM graft_proc22_src_$cat")
    spark.table(s"$cat.t").count()
  }

  private def rootMessages(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).map(
      t => Option(t.getMessage).getOrElse("")).toSeq

  test("CALL compact: result row reports the rewrite, rows identical, one file after") {
    val (cat, wh) = newCat()
    val n = seeded(cat)
    val r = spark.sql(s"CALL $cat.system.compact('t', ${128L << 20})").collect()
    assert(r.length === 1)
    assert(r(0).getInt(0) === 6, "files_before must report the fragmented layout")
    assert(r(0).getLong(1) === 3L, "create=1, insert=2, compact publishes 3")
    assert(SnapshotTable.manifest(s"$wh/t", 3L).fileCount === 1)
    assert(spark.table(s"$cat.t").count() === n)
    assert(spark.table(s"$cat.t").agg(sum("k")).collect()(0).getLong(0) ===
      Tables(spark, sf).orders.agg(sum("o_orderkey")).collect()(0).getLong(0))
  }

  test("CALL vacuum: reclaims exactly the pre-compaction history, table still reads") {
    val (cat, wh) = newCat()
    val n = seeded(cat)
    val preCompaction = SnapshotTable.manifest(s"$wh/t", 2L).files.map(_.path)
    assert(preCompaction.size === 6)
    spark.sql(s"CALL $cat.system.compact('t', ${128L << 20})")
    val kept = SnapshotTable.manifest(s"$wh/t", 3L).files.map(_.path)
    val r = spark.sql(s"CALL $cat.system.vacuum('t', 1)").collect()(0)
    assert(r.getInt(0) === 2, "v1+v2 manifests reclaimed")
    // the count includes writer clutter (.crc/_SUCCESS); the CONTRACT is
    // every pre-compaction referenced file gone, the compacted one kept
    assert(r.getInt(1) >= 6)
    preCompaction.foreach(p => assert(!new java.io.File(p).exists(), s"$p must be reclaimed"))
    kept.foreach(p => assert(new java.io.File(p).exists(), s"$p must survive"))
    assert(spark.table(s"$cat.t").count() === n)
    // time travel below the retention floor is gone — that's vacuum's contract
    val e = intercept[Throwable] {
      spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 2").collect()
    }
    // pin the retention contract specifically: the reclaimed version's
    // manifest is gone ("not published"), not just "some error happened"
    assert(rootMessages(e).exists(_.contains("not published")))
  }

  test("CALL rewrite_segments on an already-consolidated manifest is a no-op") {
    val (cat, _) = newCat()
    seeded(cat)
    val first = spark.sql(s"CALL $cat.system.rewrite_segments('t', 10000)").collect()(0)
    // one INSERT = one segment: nothing to consolidate, no version published
    assert(first.getInt(0) === first.getInt(1))
    val again = spark.sql(s"CALL $cat.system.rewrite_segments('t', 10000)").collect()(0)
    assert(again.getInt(0) === again.getInt(1) && again.getLong(2) === first.getLong(2),
      "idempotent: same segment count, same version")
  }

  test("refusals: unknown procedure, wrong namespace, path escape, missing table") {
    val (cat, _) = newCat()
    seeded(cat)
    val unknown = intercept[Throwable] {
      spark.sql(s"CALL $cat.system.nope('t')").collect()
    }
    assert(rootMessages(unknown).exists(_.contains("unknown procedure")))
    val ns = intercept[Throwable] {
      spark.sql(s"CALL $cat.sys.vacuum('t', 1)").collect()
    }
    assert(rootMessages(ns).exists(m =>
      m.contains("procedures live under") || m.contains("sys")))
    val escape = intercept[Throwable] {
      spark.sql(s"CALL $cat.system.vacuum('../t', 1)").collect()
    }
    assert(rootMessages(escape).exists(_.contains("catalog-relative")))
    val missing = intercept[Throwable] {
      spark.sql(s"CALL $cat.system.vacuum('ghost', 1)").collect()
    }
    assert(rootMessages(missing).exists(_.contains("no snapshot table")))
  }

  test("named arguments and parameter defaults: CALL vacuum(table => 't')") {
    val (cat, wh) = newCat()
    val n = seeded(cat)
    spark.sql(s"CALL $cat.system.compact('t', ${128L << 20})")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM graft_proc22_src_$cat") // v4
    // retain_last defaults to 2: v1+v2 reclaimed, v3 (time travel) kept
    val r = spark.sql(s"CALL $cat.system.vacuum(table => 't')").collect()(0)
    assert(r.getInt(0) === 2, "default retain_last=2 must reclaim exactly v1+v2")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF 3").collect()(0)
      .getLong(0) === n, "the retained penultimate version must still time-travel")
    assert(spark.table(s"$cat.t").count() === 2 * n)
  }

  test("SHOW PROCEDURES and DESCRIBE PROCEDURE work through the catalog") {
    val (cat, _) = newCat()
    val shown = spark.sql(s"SHOW PROCEDURES IN $cat.system")
      .collect().map(_.toString).mkString("\n")
    assert(Seq("rewrite_segments", "compact", "rollback", "vacuum",
      "expire_snapshots", "create_branch", "publish_branch", "drop_branch")
      .forall(shown.contains))
    val desc = spark.sql(s"DESCRIBE PROCEDURE $cat.system.vacuum")
      .collect().map(_.toString).mkString("\n")
    assert(desc.contains("vacuum"))
  }

  test("listProcedures exposes the system namespace") {
    val (cat, wh) = newCat()
    val c = new SnapshotCatalog
    c.initialize(cat, new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", wh)))
    val names = c.listProcedures(Array("system")).map(_.name()).toSet
    assert(names === Set("rewrite_segments", "compact", "rollback", "vacuum",
      "expire_snapshots", "consolidate_dvs", "create_branch", "publish_branch",
      "drop_branch", "create_tag", "drop_tag", "compact_fragmented",
      "compact_evolved"))
    assert(c.listProcedures(Array("elsewhere")).isEmpty)
  }
}
