package graft

import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SnapshotTable

/** Round-51 wave (r19 change 4): the V1 DV read tags rows with their
  * file's commit seq through ONE scan + a broadcast (path -> seq)
  * attach instead of one scan per distinct seq unioned — plan width
  * must not grow with commits since the last compaction, and the
  * attach must be row-for-row equivalent to the old per-seq tagging
  * (same rows survive the seq-scoped DV anti-join).
  */
class Round51Spec extends AnyFunSuite {
  import TestSpark._

  // count in the OPTIMIZED LOGICAL plan — AQE wraps the physical tree,
  // so executedPlan.collect cannot see the scans. Data relations carry
  // the value column; DV/sidecar relations are key-only.
  private def dataScans(df: org.apache.spark.sql.DataFrame): Seq[LogicalRelation] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation if l.schema.fieldNames.contains("v") => l
    }

  test("multi-seq DV read: ONE data scan regardless of commit count, " +
      "rows identical to the per-seq semantics") {
    val root = java.nio.file.Files.createTempDirectory("graft51_a").toString
    val table = s"$root/t"
    import spark.implicits._
    SnapshotTable.commit(
      spark.range(8).coalesce(1).select(col("id").as("k"), (col("id") * 10).as("v")),
      table, append = false, statsColumns = Seq("k"))                    // seq 0
    SnapshotTable.commit(
      Seq((100L, 1000L), (101L, 1010L)).toDF("k", "v").coalesce(1),
      table, append = true)                                              // seq ~2
    SnapshotTable.mergeMoR(Seq((3L, 999L), (100L, 888L)).toDF("k", "v"),
      table, "k")                                                        // DV + post-images
    SnapshotTable.commit(
      Seq((3L, 777L)).toDF("k", "v").coalesce(1), table, append = true)  // re-append AFTER DV
    val df = SnapshotTable.read(spark, table)
    // seq-scoped semantics: the DV (stamped between) kills the ORIGINAL
    // k=3 and k=100 rows; the mergeMoR post-images survive their own
    // DV; the later re-appended k=3 row survives too.
    val got = df.select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val want = ((0L until 8L).filterNot(_ == 3L).map(k => (k, k * 10)) ++
      Seq((3L, 999L), (3L, 777L), (100L, 888L), (101L, 1010L))).sorted
    assert(got === want)
    // the structural pin: >= 3 distinct live seqs, still exactly ONE
    // data scan (the broadcast seq attach replaced the per-seq union)
    val m = SnapshotTable.manifest(table, SnapshotTable.currentVersion(table))
    assert(m.files.map(f => math.max(f.seq, 0L)).distinct.size >= 3,
      "fixture must span several commit seqs or the pin is vacuous")
    assert(dataScans(df).size === 1,
      s"multi-seq DV read must plan ONE data scan")
  }

  test("single-seq DV table keeps the constant-tag path: one scan, " +
      "no broadcast seq attach") {
    val root = java.nio.file.Files.createTempDirectory("graft51_b").toString
    val table = s"$root/t"
    import spark.implicits._
    SnapshotTable.commit(
      spark.range(6).coalesce(1).select(col("id").as("k"), (col("id") * 10).as("v")),
      table, append = false, statsColumns = Seq("k"))
    SnapshotTable.deleteKeys(Seq(2L).toDF("k"), table, "k")
    val df = SnapshotTable.read(spark, table)
    assert(df.select("k").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(0L, 1L, 3L, 4L, 5L))
    assert(dataScans(df).size === 1)
    // no LocalTableScan feeding a broadcast on the data side: the
    // single-seq read tags with a literal, not a join
    val hasSeqJoin = df.queryExecution.optimizedPlan.toString
      .contains("__graft_fpath")
    assert(!hasSeqJoin, "single-seq read must not build the seq-attach join")
  }

  test("rename epoch x multi-seq: the per-epoch scans each carry the " +
      "path column and the attach still scopes the DV correctly") {
    val root = java.nio.file.Files.createTempDirectory("graft51_c").toString
    val table = s"$root/t"
    import spark.implicits._
    SnapshotTable.commit(
      spark.range(5).coalesce(1).select(col("id").as("k"), (col("id") * 10).as("w")),
      table, append = false, statsColumns = Seq("k"))           // epoch 0, seq 0
    SnapshotTable.renameColumn(table, "w", "v")                 // metadata-only
    SnapshotTable.commit(
      Seq((50L, 500L)).toDF("k", "v").coalesce(1), table, append = true) // epoch 1
    SnapshotTable.mergeMoR(Seq((1L, 111L)).toDF("k", "v"), table, "k")
    val df = SnapshotTable.read(spark, table)
    val got = df.select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val want = (Seq(0L, 2L, 3L, 4L).map(k => (k, k * 10)) ++
      Seq((1L, 111L), (50L, 500L))).sorted
    assert(got === want)
  }
}
