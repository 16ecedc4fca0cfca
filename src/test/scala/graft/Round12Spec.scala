package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 wave: the stream_topk_window state reshape (two-stage
  * chained stateful plan) and its scale contracts.
  */
class Round12Spec extends AnyFunSuite {
  import TestSpark._

  // sf0.01: at sf0.001 the open tail holds one user per window, which
  // cannot distinguish (window x user)-keyed state from window-keyed
  private val sfShape = "/root/testdata/sf0.01"

  test("stream_topk_window state shape: (window x user)-keyed counting, stateless reduction") {
    val rows = SparkEntry.queries("stream_topk_window")(spark, sfShape).collect()
    assert(rows.nonEmpty)
    val stateOps = graft.streaming.StreamingCatalog.lastTopkStateRows.get()
    assert(stateOps.size === 2, s"expected agg + flatMapGroups state operators, got $stateOps")
    // stage 2 (the bounded top-k fold) must retain NOTHING: every
    // window's finals arrive in its eviction micro-batch and the fold
    // never calls state.update — the per-window user map the r8
    // verdict flagged must not exist in any store
    val fmgws = stateOps.collect {
      case (n, v) if n.toLowerCase.contains("flatmapgroups") => v
    }
    assert(fmgws.nonEmpty && fmgws.forall(_ == 0L), s"top-k stage retained state: $stateOps")
    // stage 1 (the windowed count) retains exactly the OPEN windows'
    // distinct (window, user) pairs — one O(1) row per pair, proving
    // the state key is (window x user), not window
    val agg = stateOps.collect {
      case (n, v) if n.toLowerCase.contains("statestoresave") => v
    }
    val e = Tables(spark, sfShape).events.selectExpr("unix_micros(ts) AS us", "user_id")
    val maxUs = e.agg(max("us")).collect()(0).getLong(0)
    // Spark's watermark: max event time floored to ms, minus the 2 h
    // delay; a window stays open while its end exceeds the watermark
    // (eviction predicate is window.end <= wm)
    val wmUs = (maxUs / 1000L) * 1000L - 7200000000L
    val openPairs = e
      .selectExpr("(us div 3600000000) * 3600000000 AS ws", "user_id")
      .distinct()
      .filter(col("ws") + 3600000000L > wmUs)
      .count()
    assert(agg.nonEmpty, s"no stateStoreSave operator in $stateOps")
    assert(agg.head === openPairs,
      s"counting-state rows ${agg.head} != open (window,user) pairs $openPairs")
    assert(agg.head > 3L,
      "state finer than one row per window is the point of the reshape")
  }

  // ---- SnapshotTable (the snapshot-manifest table format) ----------

  private def snapKeys(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("o_orderkey").collect().map(_.getLong(0)).toSet

  test("SnapshotTable: commits round-trip, time travel survives an overwrite") {
    val table = java.nio.file.Files.createTempDirectory("graft_snap_spec").toString + "/t"
    val o = Tables(spark, sf).orders.select("o_orderkey", "o_totalprice")
    val all = snapKeys(o)
    assert(graft.sources.SnapshotTable.currentVersion(table) === 0L)
    val v1 = graft.sources.SnapshotTable.commit(
      o.filter(col("o_orderkey") % 3 === 0), table, append = false)
    val v2 = graft.sources.SnapshotTable.commit(
      o.filter(col("o_orderkey") % 3 === 1), table, append = true)
    assert((v1, v2) === ((1L, 2L)))
    assert(snapKeys(graft.sources.SnapshotTable.read(spark, table, Some(1L)))
      === all.filter(_ % 3 == 0))
    assert(snapKeys(graft.sources.SnapshotTable.read(spark, table))
      === all.filter(k => k % 3 == 0 || k % 3 == 1))
    // an OVERWRITE commit starts the file list fresh, but every prior
    // snapshot stays readable - overwrite never deletes data files
    val v3 = graft.sources.SnapshotTable.commit(
      o.filter(col("o_orderkey") % 3 === 2), table, append = false)
    assert(v3 === 3L)
    assert(snapKeys(graft.sources.SnapshotTable.read(spark, table)) === all.filter(_ % 3 == 2))
    assert(snapKeys(graft.sources.SnapshotTable.read(spark, table, Some(2L)))
      === all.filter(k => k % 3 == 0 || k % 3 == 1))
    assert(snapKeys(graft.sources.SnapshotTable.read(spark, table, Some(1L)))
      === all.filter(_ % 3 == 0))
  }

  test("SnapshotTable: a crashed attempt (data written, manifest unpublished) is invisible") {
    val table = java.nio.file.Files.createTempDirectory("graft_snap_spec").toString + "/t"
    val o = Tables(spark, sf).orders.select("o_orderkey", "o_totalprice")
    graft.sources.SnapshotTable.commit(o.filter(col("o_orderkey") % 3 === 0), table, append = false)
    val before = snapKeys(graft.sources.SnapshotTable.read(spark, table))
    // simulate a writer that died between step 1 (data files) and
    // step 3 (publication): an orphan data dir plus a temp manifest
    o.filter(col("o_orderkey") % 3 === 1)
      .write.parquet(s"$table/data/v2_deadcrash")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(table, "manifests", ".tmp_v2_deadcrash"),
      "version=2\ngarbage".getBytes("UTF-8"))
    assert(graft.sources.SnapshotTable.currentVersion(table) === 1L)
    assert(snapKeys(graft.sources.SnapshotTable.read(spark, table)) === before)
    // and a later commit claims version 2 cleanly, never referencing
    // the orphan's files
    val v2 = graft.sources.SnapshotTable.commit(
      o.filter(col("o_orderkey") % 3 === 2), table, append = true)
    assert(v2 === 2L)
    val m = graft.sources.SnapshotTable.manifest(table, 2L)
    assert(m.files.nonEmpty && !m.files.exists(_.contains("deadcrash")))
  }

  test("SnapshotTable: the losing concurrent writer throws and the table is intact") {
    val table = java.nio.file.Files.createTempDirectory("graft_snap_spec").toString + "/t"
    val o = Tables(spark, sf).orders.select("o_orderkey", "o_totalprice")
    graft.sources.SnapshotTable.commit(o.filter(col("o_orderkey") % 3 === 0), table, append = false)
    graft.sources.SnapshotTable.commit(o.filter(col("o_orderkey") % 3 === 1), table, append = true)
    val before = snapKeys(graft.sources.SnapshotTable.read(spark, table))
    // a writer that read version 1 and races the already-published v2:
    // publication is an atomic-exclusive link create, so it LOSES loudly
    intercept[java.util.ConcurrentModificationException] {
      graft.sources.SnapshotTable.commit(
        o.filter(col("o_orderkey") % 3 === 2), table, append = false,
        expectedCurrent = Some(1L))
    }
    assert(graft.sources.SnapshotTable.currentVersion(table) === 2L)
    assert(snapKeys(graft.sources.SnapshotTable.read(spark, table)) === before)
  }

  test("ShingleDfCap never exceeds the widest measured flood family") {
    // the ngram prefix filter admits up to C(ShingleDfCap, 2) pairs per
    // shared shingle; the 100x DocStress arm measured exactly
    // width-MaxMeasuredFamilyWidth families (NOTES_r8). A cap raise
    // past the largest measured flood would re-open an unmeasured
    // quadratic regime silently - it must fail here first.
    assert(
      graft.dedup.DedupCatalog.ShingleDfCap <= graft.tools.DocStress.MaxMeasuredFamilyWidth,
      "raise MaxMeasuredFamilyWidth (and re-run the DocStress curve) before raising ShingleDfCap")
  }
}
