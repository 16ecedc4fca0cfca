package graft

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{Event, UserUpdate}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** flatMapGroupsWithState: per-user state must accumulate across
  * micro-batches (the arbitrary-state operator, SURVEY §2.5). */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("stateful running totals accumulate across batches") {
    implicit val sq = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val input = MemoryStream[Event]
    val query = StatefulOps
      .runningTotals(input.toDS())
      .writeStream
      .format("memory")
      .queryName("graft_state_test")
      .outputMode(OutputMode.Update())
      .start()

    input.addData(Event(1, 10.0), Event(1, 5.0), Event(2, 1.0))
    query.processAllAvailable()
    input.addData(Event(1, 2.0))
    query.processAllAvailable()
    query.stop()

    val rows = spark
      .table("graft_state_test")
      .collect()
      .map(r => UserUpdate(r.getLong(0), r.getLong(1), r.getDouble(2)))
    // last update per user wins
    val last = rows.groupBy(_.user_id).map { case (u, rs) => u -> rs.last }
    assert(last(1L) === UserUpdate(1, 3, 17.0))
    assert(last(2L) === UserUpdate(2, 1, 1.0))
  }

  test("append-mode windowed agg into a file sink equals the batch aggregation") {
    // The production shape of stream_window_agg: watermarked append mode
    // into parquet with a checkpoint. A far-future sentinel event pushes
    // the watermark past every real window end so the file sink must
    // hold EXACTLY the batch aggregation (the sentinel's own window
    // stays in state — never finalized — by design).
    val base = java.nio.file.Files.createTempDirectory("graft-stream-sink").toFile
    val srcDir = new java.io.File(base, "src").getAbsolutePath
    val sinkDir = new java.io.File(base, "out").getAbsolutePath
    val ckptDir = new java.io.File(base, "ckpt").getAbsolutePath
    val raw = Tables(spark, sf).eventsRaw
    raw.write.mode("overwrite").parquet(srcDir)
    val maxNs = raw.agg(max(col("ts"))).head().getLong(0)
    raw.limit(1)
      .withColumn("ts", lit(maxNs + 10L * 3600L * 1000000000L))
      .withColumn("event_type", lit("zz_sentinel"))
      .coalesce(1)
      .write.mode("append").parquet(srcDir)

    graft.streaming.StreamingCatalog.windowAggAppendToFiles(spark, srcDir, sinkDir, ckptDir)

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))
    val got = spark.read.parquet(sinkDir)
      .select("window_start", "event_type", "n", "sum_value")
      .filter(col("event_type") =!= "zz_sentinel")
      .collect().map(key).toSet
    val want = Tables(spark, sf).events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 4)))
          .cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
      .collect().map(key).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("foreachBatch delta upsert is idempotent under full replay") {
    val base = java.nio.file.Files.createTempDirectory("graft-feb").toFile
    val srcDir = new java.io.File(base, "src").getAbsolutePath
    val sinkDir = new java.io.File(base, "out").getAbsolutePath
    val ckptDir = new java.io.File(base, "ckpt")
    // 4 source files -> 4 micro-batches under maxFilesPerTrigger=1
    Tables(spark, sf).eventsRaw.repartition(4).write.mode("overwrite").parquet(srcDir)

    def compacted() = spark.read.parquet(sinkDir)
      .groupBy("user_id")
      .agg(sum(col("n_events")).as("n_events"), sum(col("sum_value")).as("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).toPlainString))
      .toSet

    graft.streaming.StreamingCatalog.foreachBatchDeltaUpsert(spark, srcDir, sinkDir, ckptDir.getAbsolutePath)
    val first = compacted()
    val want = Tables(spark, sf).events
      .groupBy("user_id")
      .agg(
        count(lit(1)).cast("long").as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 4))).as("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).toPlainString))
      .toSet
    assert(first === want)

    // failure-recovery replay: wipe the checkpoint so batch ids restart at
    // 0 and every micro-batch re-executes against the SAME sink — the
    // deterministic batch=<id> overwrite paths must leave it unchanged
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    rm(ckptDir)
    graft.streaming.StreamingCatalog.foreachBatchDeltaUpsert(spark, srcDir, sinkDir, ckptDir.getAbsolutePath)
    assert(compacted() === first)
  }

  test("watermarked dedup drops dups and EVICTS state past the horizon") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Long)] // (event_id, type, epoch_sec)
    val deduped = input
      .toDS()
      .toDF("event_id", "event_type", "sec")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_seconds($"sec"))
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("event_id")
    val query = deduped.writeStream
      .format("memory")
      .queryName("graft_wm_dedup_test")
      .outputMode(OutputMode.Append())
      .start()

    val t0 = 1000000L
    input.addData((1L, "a", t0), (1L, "a", t0), (2L, "b", t0))
    query.processAllAvailable()
    // far past t0 + delay: watermark advances, ids 1/2 become evictable
    input.addData((3L, "a", t0 + 300))
    query.processAllAvailable()
    input.addData((4L, "a", t0 + 600))
    query.processAllAvailable()
    val stateRows = query.lastProgress.stateOperators(0).numRowsTotal
    query.stop()

    val ids = spark.table("graft_wm_dedup_test").select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids === Array(1L, 2L, 3L, 4L)) // duplicates dropped, nothing lost
    // bounded state: ids 1/2 (and 3) aged out of the store — NOT 4 rows forever
    assert(stateRows < 4, s"state not evicted: $stateRows rows")
  }

  test("stream_late_data really drops late rows (emitted counts < batch ground truth)") {
    import org.apache.spark.sql.functions._
    val result = SparkEntry.queries("stream_late_data")(spark, sf)
    val emitted = result.agg(sum(col("n"))).collect().head.getLong(0)
    val windows = result.count()
    // batch ground truth over the SAME emitted windows: every event whose
    // window was emitted, with no watermark dropping
    val e = Tables(spark, sf).events.select(expr("ts_ns div 1000").as("us"))
    val starts = result.select(col("window_start")).collect().map(_.getLong(0)).toSet
    val full = e
      .withColumn("ws", expr("(us div 3600000000) * 3600"))
      .filter(col("ws").isin(starts.toSeq: _*))
      .count()
    assert(windows > 0 && emitted < full, s"watermark must have dropped rows: $emitted vs $full")
    // Engine-metric cross-check (ADVICE r5): the oracle's drop set is
    // "b2 rows whose window closed at or below the batch-1 eviction
    // watermark w1". numRowsDroppedByWatermark is measured at the STATE
    // operator, i.e. AFTER map-side partial aggregation — it counts
    // dropped (window x input-partition) partials, not raw rows. The
    // staged micro-batch files are coalesce(1) and tiny (one scan
    // partition each), so the expected metric is the number of DISTINCT
    // late windows. A Spark-version shift in watermark semantics fails
    // HERE with a diagnosable count, not as an opaque oracle hash
    // mismatch.
    val ev = Tables(spark, sf).events.select(col("event_id"), expr("ts_ns div 1000").as("us"))
    val w1 = ev.filter(pmod(col("event_id"), lit(2)) === 0).agg(max("us")).head.getLong(0) -
      3600000000L
    val lateWindows = ev
      .filter(pmod(col("event_id"), lit(4)) === 3)
      .select(expr("((us div 3600000000) + 1) * 3600000000").as("wend"))
      .filter(col("wend") <= w1)
    val expectedDropped = lateWindows.distinct().count()
    assert(lateWindows.count() > expectedDropped, "fixture should collide >=2 late rows in one window")
    val reported = graft.streaming.StreamingCatalog.lastLateDataDropped.get()
    assert(expectedDropped > 0, "fixture must produce at least one dropped row")
    assert(
      reported === expectedDropped,
      s"numRowsDroppedByWatermark=$reported, oracle-expected dropped windows=$expectedDropped")
    GraftCache.clear()
  }

  test("drained memory-sink results die at GraftCache.clear (MemoryResult contract)") {
    // A drained frame is a localCheckpoint: lineage truncated, blocks
    // freed by GraftCache.clear. Reusing it after clear would fail with
    // missing-block errors, so the liveness flag is the guard callers
    // (and this harness) assert on instead of discovering at runtime.
    val df = SparkEntry.queries("stream_window_agg")(spark, sf)
    assert(graft.streaming.MemoryResult.isLive(df), "fresh drain must be live")
    assert(df.count() > 0) // force while live — the supported window
    GraftCache.clear()
    assert(!graft.streaming.MemoryResult.isLive(df), "clear() must invalidate the drained frame")
  }

  test("curation gate admits a digest once, across batches and within one") {
    import graft.streaming.StatefulOps.{DocIn, KeptDoc}
    implicit val sq = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[DocIn]
    val input = MemoryStream[DocIn]
    val name = s"graft_cg_${System.nanoTime()}"
    val query = StatefulOps
      .curationGate(input.toDS())
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Append())
      .start()
    // batch 1: digest A claimed by min doc_id among 3 same-batch copies
    input.addData(DocIn("A", 12, "en", 5), DocIn("A", 3, "en", 5), DocIn("A", 7, "en", 5), DocIn("B", 9, "de", 4))
    query.processAllAvailable()
    // batch 2: late A copy (even with a SMALLER id) must be dropped —
    // first-arrival-wins is the streaming contract; C is new
    input.addData(DocIn("A", 1, "en", 5), DocIn("C", 20, "fr", 6))
    query.processAllAvailable()
    query.stop()
    val kept = spark
      .table(name)
      .collect()
      .map(r => KeptDoc(r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_.doc_id)
      .toSeq
    spark.catalog.dropTempView(name)
    assert(kept === Seq(KeptDoc(3, "en", 5), KeptDoc(9, "de", 4), KeptDoc(20, "fr", 6)))
  }

  test("zscore anomaly flags are invariant to the micro-batch split") {
    import graft.streaming.StatefulOps.{AnomalyZ, EventZ}
    implicit val sq = spark.sqlContext
    implicit val enc = org.apache.spark.sql.Encoders.product[EventZ]
    // deterministic heavy-tailed series per user: mostly small values,
    // a few large spikes that must be flagged once history warms up
    val events = for {
      u <- 1L to 3L
      i <- 0L until 120L
    } yield EventZ(u, i, i * 1000L, if (i % 37 == 36) 5000L + u else 100L + (i * 7) % 13)
    def run(chunks: Seq[Seq[EventZ]]): Seq[AnomalyZ] = {
      val input = MemoryStream[EventZ]
      val name = s"graft_z_${System.nanoTime()}"
      val query = StatefulOps
        .zscoreAnomalies(input.toDS())
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Append())
        .start()
      chunks.foreach { c => input.addData(c); query.processAllAvailable() }
      query.stop()
      val rows = spark
        .table(name)
        .collect()
        .map(r => AnomalyZ(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(a => (a.user_id, a.event_id))
        .toSeq
      spark.catalog.dropTempView(name)
      rows
    }
    // single batch vs three time-ordered batches: prefix moments carry
    // across the split, so the flag set must be identical
    val whole = run(Seq(events))
    val split = run(Seq(events.filter(_.event_id < 40), events.filter(e => e.event_id >= 40 && e.event_id < 80), events.filter(_.event_id >= 80)))
    assert(whole === split)
    assert(whole.nonEmpty, "the spike series must trip the detector")
    // never flags inside the warm-up window
    assert(whole.forall(_.n_prior >= 30))
    // every flagged event is one of the planted spikes
    assert(whole.forall(a => a.v >= 5000L), whole.take(5).toString)
  }
}
