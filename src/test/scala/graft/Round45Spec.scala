package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SnapshotCatalog, SnapshotTable}

/** Round-45 wave: TAGS — named immutable snapshot references (the
  * Iceberg ref shape). Pins creation atomicity/immutability, the
  * numeric-shadow refusal, SQL resolution, retention pinning under
  * BOTH vacuum (keep-last-N) and expire_snapshots (age), file-level
  * survival through the reference walk, and the drop-tag release.
  */
class Round45Spec extends AnyFunSuite {
  import TestSpark._

  private def freshCatalog(): (String, String) = {
    val wh = java.nio.file.Files.createTempDirectory("graft_snap45").toString
    val cat = "g45" + wh.takeRight(8).replaceAll("[^0-9a-zA-Z]", "")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private def fill(cat: String, n: Int, tag: String = ""): Unit = {
    spark.range(n).select(col("id").as("k"), (col("id") * 2).as("v"))
      .createOrReplaceTempView(s"g45_src$tag")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM g45_src$tag")
  }

  test("tags are immutable named refs: atomic create, re-create refuses, " +
      "purely numeric names refuse, unknown tags resolve loudly") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT)")
    fill(cat, 10)
    val table = s"$wh/t"
    assert(SnapshotTable.createTag(table, "v1.0") === 2L)
    val dup = intercept[Exception] { SnapshotTable.createTag(table, "v1.0") }
    assert(dup.getMessage.contains("immutable"))
    val num = intercept[Exception] { SnapshotTable.createTag(table, "42") }
    assert(num.getMessage.contains("numeric"))
    val missing = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 'nope'").collect()
    }
    assert(missing.getMessage.contains("no tag"))
    assert(SnapshotTable.resolveVersionRef(table, "2") === 2L)
    assert(SnapshotTable.resolveVersionRef(table, "v1.0") === 2L)
    assert(SnapshotTable.listTags(table) === Seq(("v1.0", 2L)))
    // SQL CALL surface + the tags metadata table
    spark.sql(s"CALL $cat.system.create_tag('t', 'v2.0')")
    assert(spark.table(s"$cat.t.tags").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq ===
      Seq(("v1.0", 2L), ("v2.0", 2L)))
    spark.sql(s"CALL $cat.system.drop_tag('t', 'v2.0')")
    assert(SnapshotTable.listTags(table) === Seq(("v1.0", 2L)))
  }

  test("a tag pins retention through BOTH vacuum and age-based expiry — " +
      "manifest AND files survive; dropping the tag releases them") {
    val (cat, wh) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT)")
    val table = s"$wh/t"
    fill(cat, 10, "a")
    // v3 OVERWRITES: v2's data files are referenced by NOTHING later —
    // only the tag keeps them alive
    spark.range(5).select((col("id") + 100).as("k"), col("id").as("v"))
      .createOrReplaceTempView("g45_b")
    spark.sql(s"INSERT OVERWRITE $cat.t SELECT * FROM g45_b")
    val v2files = SnapshotTable.manifest(table, 2L).files.map(_.path)
    assert(v2files.nonEmpty)
    SnapshotTable.createTag(table, "keep-me", Some(2L))
    // keep-last-1 would normally expire v1 and v2
    SnapshotTable.vacuum(table, retainLast = 1)
    assert(scala.util.Try(SnapshotTable.manifest(table, 1L)).isFailure)
    assert(v2files.forall(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p))),
      "the tagged snapshot's files must survive vacuum")
    assert(spark.sql(s"SELECT SUM(v) FROM $cat.t VERSION AS OF 'keep-me'")
      .collect()(0).getLong(0) === (0L until 10L).map(_ * 2).sum)
    // age-based expiry: every stamp is in the past, head excepted —
    // the tag still pins v2
    val (expired, _) = SnapshotTable.expireSnapshots(table, Long.MaxValue)
    assert(expired === 0, "v1 already gone, v2 tagged, head always kept")
    assert(scala.util.Try(SnapshotTable.manifest(table, 2L)).isSuccess)
    // drop the tag: the next vacuum reclaims manifest and files
    SnapshotTable.dropTag(table, "keep-me")
    SnapshotTable.vacuum(table, retainLast = 1)
    assert(scala.util.Try(SnapshotTable.manifest(table, 2L)).isFailure,
      "an untagged old snapshot expires normally")
    assert(v2files.forall(p => !java.nio.file.Files.exists(java.nio.file.Paths.get(p))),
      "its unreferenced files reclaim once the tag releases them")
    assert(spark.table(s"$cat.t").count() === 5)
  }
}
