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
