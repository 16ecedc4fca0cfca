package graft.streaming

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** SURVEY.md §2.5 — Structured Streaming over the events table.
  *
  *   - stream_window_agg runs a REAL readStream (file source, availableNow
  *     trigger, memory sink): tumbling 1-hour windows per event_type.
  *     Batch-equivalent semantics make it oracle-checkable.
  *   - stream_sessionize uses session_window (gap 10 min) per user —
  *     executed in batch mode (same operator the stream path uses);
  *     the oracle is the classic gaps-and-islands SQL.
  *
  * Stateful flatMapGroupsWithState lives in StatefulOps (spec-tested;
  * arbitrary state is not SQL-expressible).
  *
  * events.parquet is TIMESTAMP(NANOS): read as bigint nanos
  * (nanosAsLong), truncated to micros with integer div — matching
  * DuckDB's ns->us cast. Window starts are emitted as epoch seconds so
  * no timezone representation crosses the engine boundary.
  */
object StreamingCatalog extends QueryModule {

  /** Observability seam for the late-data contract: total
    * numRowsDroppedByWatermark reported by the most recent
    * stream_late_data run (-1 before any run). The oracle encodes the
    * EXPECTED drop set relationally; this metric lets a spec assert the
    * engine's own drop counter agrees, so a Spark-version shift in
    * watermark semantics fails with a diagnosable count mismatch rather
    * than an opaque hash mismatch (ADVICE r5). */
  val lastLateDataDropped = new java.util.concurrent.atomic.AtomicLong(-1L)

  /** Observability seam for stream_topk_window's STATE SHAPE: the
    * final micro-batch's state operators (operatorName →
    * numRowsTotal) from the most recent run. The scale contract the
    * r8 verdict demanded is that counting state is keyed by
    * (window × user) — many O(1) rows, never one map per window — and
    * that the top-k reduction retains NO state; Round12Spec asserts
    * both from these numbers. Empty before any run. */
  val lastTopkStateRows =
    new java.util.concurrent.atomic.AtomicReference[Map[String, Long]](Map.empty)

  /** Every stateful micro-batch pays a fixed PER-STATE-PARTITION cost —
    * store open, delta commit, snapshot bookkeeping; a stream-stream
    * join carries four stores per partition — so the state partition
    * count is a real sizing decision, not a constant to inherit from
    * the relational shuffle setting. Measured on this box: the interval
    * join returns identical rows in ~8 s with 32 inherited partitions
    * vs ~3 s with 8 (pure store overhead, flat across sf0.001–sf0.1).
    * State partitioning is also FROZEN into the checkpoint at first
    * start, which is exactly why it must be chosen deliberately: size
    * `spark.graft.stream.statePartitions` (default 8) to expected state
    * volume ÷ per-partition budget — thousands on a 1000-executor
    * 100 TB deployment, a handful for local harness state.
    *
    * The knob is applied to a CLONED session (`newSession()`: same
    * SparkContext and catalog, isolated SQLConf), never to the
    * caller's: mutating the shared `spark.sql.shuffle.partitions` for
    * the duration of a stream run would silently re-plan any batch
    * query a concurrent thread submits in the same session with 8
    * shuffle partitions. The body receives the scoped session and must
    * do ALL its work through it (source, sink view, drain) so the
    * memory-sink temp view lands in the scoped catalog. Builder-time
    * options propagate to clones via initialSessionOptions; dynamic
    * conf (nanosAsLong) is re-set per body on the scoped session. */
  private def withStatePartitions[T](s: SparkSession)(body: SparkSession => T): T = {
    val scoped = s.newSession()
    scoped.conf.set(
      "spark.sql.shuffle.partitions",
      s.conf.get("spark.graft.stream.statePartitions", "8"))
    // state-store provider pass-through: at 100 TB stateful state must
    // spill to disk, so every stateful query here also runs under the
    // RocksDB provider (StreamingStateStoreSpec pins output equality
    // across providers). Default stays Spark's HDFS-backed in-memory
    // store; the production deployment sets this to
    // ...state.RocksDBStateStoreProvider.
    s.conf.getOption("spark.graft.stream.stateStoreProvider").foreach { p =>
      scoped.conf.set("spark.sql.streaming.stateStore.providerClass", p)
    }
    body(scoped)
  }

  /** File stream over events.parquet with `ts` normalized to BIGINT
    * epoch nanos regardless of the on-disk encoding (TIMESTAMP(NANOS)
    * or micros — Tables.normalizeEventTs). readStream is given the
    * FILE's schema; normalization happens as a projection on top, so
    * the parquet reader never misinterprets the physical column. */
  private def eventsStream(ss: SparkSession, dir: String): DataFrame = {
    ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeEventTs(
      ss.readStream
        .schema(Tables(ss, dir).eventsFileSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Tumbling-window agg as a genuine streaming query, run to completion
    * with Trigger.AvailableNow and returned from the memory sink.
    *
    * The memory-sink/complete-mode combination is the HARNESS's
    * result-collection seam — the result is a small final aggregate and
    * the driver needs it as a DataFrame. It is not the deployment
    * shape: complete mode rewrites the entire result every micro-batch
    * and a memory sink lives on the driver. The production twin is
    * [[windowAggAppendToFiles]] — watermarked append mode into a file
    * sink with a checkpoint (spec-verified round-trip in
    * StreamingSpec). */
  private def windowAgg(s: SparkSession, dir: String): DataFrame =
    windowAggBy(s, dir, window(col("ts"), "1 hour"))

  /** The Kafka-shaped synthetic source under a REAL trigger: a
    * 1000-record backlog over 4 logical partitions admitted 300 rows
    * per micro-batch (graft-rate's rowsPerTrigger — the
    * maxOffsetsPerTrigger contract), driven by processAllAvailable
    * under the default processing-time trigger so MicroBatchExecution
    * itself schedules the capped batches (REQUIREd ≥ 4 — a cap that
    * silently drained everything in one batch fails the query, not
    * just a spec). Output is the per-partition profile of the streamed
    * rows; the record law is pure arithmetic, so the oracle recomputes
    * the entire stream from range(). Round16Spec pins the restart
    * contract (persisted admission cursor, same HighWaterMark as the
    * snapshot sources). */
  private def rateSourceStream(s: SparkSession, dir: String): DataFrame = withStatePartitions(s) { ss =>
    val ckpt = graft.Stage.dir("graft_rateck_", dir).getPath
    val out = graft.Stage.dir("graft_rateout_", dir).getPath
    Seq(ckpt, out).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val query = ss.readStream
      .format(graft.sources.GraftRateSourceProvider.format)
      .option("totalRows", "1000")
      .option("rowsPerTrigger", "300")
      .option("partitions", "4")
      .load()
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (batch.count() > 0) nBatches.incrementAndGet()
        batch.write.mode("append").parquet(out)
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()
    query.processAllAvailable()
    query.stop()
    require(nBatches.get >= 4,
      s"admission cap inert: 1000-row backlog at 300/trigger drained in ${nBatches.get} batches")
    ss.read.parquet(out)
      .groupBy("part")
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"), max("seq").as("max_seq"))
      .orderBy("part")
  }

  /** [[windowAgg]] with a caller-chosen time window (tumbling or
    * sliding — stream_window_sliding passes `window(ts, 2h, 1h)`, so
    * each event lands in slide-count windows). */
  private def windowAggBy(s: SparkSession, dir: String, win: org.apache.spark.sql.Column): DataFrame = withStatePartitions(s) { ss =>
    val stream = eventsStream(ss, dir)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .groupBy(win, col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 4)))
          .cast("double")
          .as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"),
        col("n"),
        col("sum_value"))
    val name = s"graft_stream_${System.nanoTime()}"
    val query = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    MemoryResult.drain(ss, name)(_.orderBy("window_start", "event_type"))
  }

  /** Streaming cardinality: per-window approx_count_distinct (HLL++
    * partials in the window state). Structured Streaming REJECTS exact
    * COUNT(DISTINCT) outright — distinct keys can't be held per window
    * incrementally — so the sketch is not an optimization here, it is
    * the ONLY way to count window cardinality in a stream, which is
    * exactly the 100 TB posture (mergeable fixed-size partials in
    * state). The exact side comes from a BATCH pass over the same
    * source (the offline audit a deployment runs), and the emitted
    * row carries rel_sketch_distinct's error-bound contract: each
    * engine checks its OWN estimate within 10% of its exact count. */
  private def approxDistinct(s: SparkSession, dir: String): DataFrame = withStatePartitions(s) { ss =>
    val stream = eventsStream(ss, dir)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .groupBy(window(col("ts"), "1 day"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_approx"))
      .select(unix_timestamp(col("window.start")).as("window_start"), col("n_approx"))
    val name = s"graft_stream_${System.nanoTime()}"
    val query = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    val est = MemoryResult.drain(ss, name)(identity)
    val exact = Tables(ss, dir).events
      .select(expr("(ts_ns div 1000 div 86400000000) * 86400").as("window_start"), col("user_id"))
      .groupBy("window_start")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    // 10% relative gate with an absolute floor of 5: a ±2 wobble on a
    // 12-user window is estimator-normal, not an accuracy regression —
    // the floor keeps the flag meaningful at every scale factor while
    // the 10% arm does the work once windows carry real cardinality
    exact
      .join(est, Seq("window_start"))
      .select(
        col("window_start"),
        col("n_exact"),
        (abs(col("n_approx") - col("n_exact"))
          <= greatest(expr("n_exact div 10"), lit(5L)))
          .cast("long")
          .as("within_bound"))
      .orderBy("window_start")
  }

  /** PRODUCTION sink shape of the windowed aggregation: watermarked
    * APPEND-mode stream into a parquet file sink with a checkpoint.
    * Append mode emits each window exactly once, when the watermark
    * (1 hour behind max event time) passes the window end — the sink
    * accumulates finalized windows only and the aggregation state stays
    * bounded, which is what a 100 TB deployment needs (complete mode's
    * rewrite-everything-per-batch does not scale past toy results).
    *
    * Windows still open when the data runs out flush via Spark's
    * no-data micro-batch (fired after the last data batch advances the
    * watermark); windows the final watermark has NOT passed stay in
    * state by design — a caller wanting them flushed feeds a later
    * event to push the watermark (StreamingSpec stages a sentinel). */
  def windowAggAppendToFiles(s: SparkSession, srcDir: String, sinkDir: String, ckptDir: String): Unit = withStatePartitions(s) { ss =>
    ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = ss.read.parquet(srcDir).schema
    val agg = ss.readStream
      .schema(schema)
      .parquet(srcDir)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 4)))
          .cast("double")
          .as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"),
        col("n"),
        col("sum_value"))
    val query = agg.writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", ckptDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }

  /** foreachBatch sink with exactly-once semantics on a plain file store:
    * each micro-batch's per-user delta aggregate lands at a path keyed by
    * the DETERMINISTIC batchId (`batch=<id>`) in overwrite mode, so a
    * replay after a failure rewrites the same directory instead of
    * duplicating rows — the standard idempotent-foreachBatch recipe for
    * sinks without transactions (parquet, object stores). Readers compact
    * with a per-key aggregate over all batch dirs.
    *
    * This is the third production sink shape next to the append-mode
    * file sink ([[windowAggAppendToFiles]]) and the JDBC batch sink:
    * foreachBatch is where MERGE/upsert logic goes when the target has
    * no streaming writer. Spec: StreamingSpec replays the whole stream
    * from a wiped checkpoint and asserts the sink is unchanged. */
  def foreachBatchDeltaUpsert(s: SparkSession, srcDir: String, sinkDir: String, ckptDir: String): Unit = withStatePartitions(s) { ss =>
    ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = ss.read.parquet(srcDir).schema
    val query = ss.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1") // several micro-batches, not one
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 4)))
              .as("sum_value"))
          .write
          .mode("overwrite")
          .parquet(s"$sinkDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }

  /** Exactly-once streaming ingestion into the SNAPSHOT TABLE FORMAT —
    * the production landing pattern for a 100 TB crawl feed: each
    * micro-batch commits through SnapshotTable.appendBatch (batch id
    * in the manifest), and the query DELIBERATELY replays the whole
    * stream from a fresh checkpoint into the same table — the
    * at-least-once redelivery every restart can produce. The replayed
    * batch must be detected by its manifest batch id and skipped, so
    * the final table holds exactly one copy; the oracle (plain batch
    * aggregate of the source) fails on any duplication or loss. */
  private def snapshotSinkStream(s: SparkSession, dir: String): DataFrame =
    withStatePartitions(s) { ss =>
      ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val table = graft.Stage.dir("graft_snapsink_", dir).getPath
      val ckpt = graft.Stage.dir("graft_snapsinkck_", dir).getPath
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(table))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
      def run(tag: String): Unit = {
        val q = eventsStream(ss, dir).writeStream
          .foreachBatch { (batch: DataFrame, id: Long) =>
            graft.sources.SnapshotTable.appendBatch(batch, table, id)
            ()
          }
          .option("checkpointLocation", s"$ckpt/$tag")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      run("first")
      run("replay") // fresh checkpoint, same table: redelivery must no-op
      graft.sources.SnapshotTable
        .read(ss, table)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")
    }

  /** The snapshot table as a streaming SOURCE (SnapshotSourceProvider)
    * — the other half of the landing-table loop: three commits land in
    * the source table one at a time, and between each the stream
    * drains (shared checkpoint, AvailableNow), so Spark's offset log
    * records the version chain 1→2→3 and each micro-batch is exactly
    * the manifest difference (batch 0 = initial snapshot, then two
    * incremental slices). The sink side is the exactly-once
    * appendBatch protocol, and a FOURTH drain from a FRESH checkpoint
    * (the full redelivery a checkpoint loss produces) must no-op at
    * the sink — the oracle (plain batch aggregate of the source rows)
    * fails on any duplicated, lost, or mis-sliced delta. */
  private def snapshotSourceStream(s: SparkSession, dir: String): DataFrame =
    withStatePartitions(s) { ss =>
      val src = graft.Stage.dir("graft_snapsrc_", dir).getPath
      val out = graft.Stage.dir("graft_snapsrcout_", dir).getPath
      val ckpt = graft.Stage.dir("graft_snapsrcck_", dir).getPath
      Seq(src, out, ckpt).foreach(p =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
      val o = Tables(ss, dir).orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
      def drain(tag: String): Unit = {
        val q = ss.readStream
          .format(graft.sources.SnapshotSourceProvider.format)
          .option("path", src)
          .load()
          .writeStream
          .foreachBatch { (batch: DataFrame, id: Long) =>
            graft.sources.SnapshotTable.appendBatch(batch, out, id)
            ()
          }
          .option("checkpointLocation", s"$ckpt/$tag")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      for (m <- 0 to 2) {
        graft.sources.SnapshotTable.commit(
          o.filter(col("o_orderkey") % 3 === m), src, append = m > 0)
        drain("chain") // shared checkpoint: each drain consumes one version slice
      }
      drain("fresh") // fresh checkpoint: full-snapshot redelivery must no-op at the sink
      graft.sources.SnapshotTable
        .read(ss, out)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(38, 4)))
            .cast("double").as("sum_price"))
        .orderBy("o_orderpriority")
    }

  /** The snapshot table's CHANGE FEED as a streaming source, closed
    * into a REPLICATION loop — the capability pair every warehouse
    * ships as "CDF + MERGE": a source table mutates through the three
    * commit classes the append-only source must refuse (clustered
    * base, copy-on-write MERGE with updates + deletes, then a
    * deletion-vector delete), the CDC source emits each transition's
    * row-level diff (initial head state as inserts, then
    * insert/delete/update_pre/postimage per version), and a foreachBatch
    * consumer applies them into a MIRROR table through the exactly-once
    * merge (batch-id guard). Mirror state must equal source state —
    * any wrong diff class, lost preimage filter, resurrected DV row or
    * replayed batch breaks the oracle. The final fresh-checkpoint
    * drain redelivers the full head as inserts and must no-op at the
    * mirror. */
  private def snapshotCdcStream(s: SparkSession, dir: String): DataFrame =
    withStatePartitions(s) { ss =>
      val src = graft.Stage.dir("graft_snapcdc_", dir).getPath
      val out = graft.Stage.dir("graft_snapcdcout_", dir).getPath
      val ckpt = graft.Stage.dir("graft_snapcdcck_", dir).getPath
      Seq(src, out, ckpt).foreach(p =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
      val o = Tables(ss, dir).orders
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .filter(col("o_orderkey") % 3 === 0)
      def drain(tag: String): Unit = {
        val q = ss.readStream
          .format(graft.sources.SnapshotCdcSourceProvider.format)
          .option("path", src)
          .option("key", "o_orderkey")
          .load()
          .writeStream
          .foreachBatch { (batch: DataFrame, id: Long) =>
            val data = batch
              .filter(col("_change_type") =!= "update_preimage")
              .withColumn("_del", col("_change_type") === "delete")
              .drop("_change_type")
            if (graft.sources.SnapshotTable.currentVersion(out) == 0)
              graft.sources.SnapshotTable.appendBatch(
                data.filter(!col("_del")).drop("_del"), out, id)
            else
              graft.sources.SnapshotTable.mergeBatch(
                data, out, "o_orderkey", id, deleteCol = Some("_del"))
            ()
          }
          .option("checkpointLocation", s"$ckpt/$tag")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // v1: clustered base -> initial-load inserts
      graft.sources.SnapshotTable.commit(
        o.repartitionByRange(4, col("o_orderkey")).sortWithinPartitions("o_orderkey"),
        src, append = false, statsColumns = Seq("o_orderkey"))
      drain("chain")
      // v2: copy-on-write merge — updates (%10=3, +100000) and deletes (%10=7)
      graft.sources.SnapshotTable.merge(
        o.filter(col("o_orderkey") % 10 === 3)
          .withColumn("o_totalprice", col("o_totalprice") + 100000.0)
          .withColumn("_del", lit(false))
          .unionByName(o.filter(col("o_orderkey") % 10 === 7).withColumn("_del", lit(true))),
        src, "o_orderkey", deleteCol = Some("_del"))
      drain("chain")
      // v3: merge-on-read deletion vector (%10=9)
      graft.sources.SnapshotTable.deleteKeys(
        o.filter(col("o_orderkey") % 10 === 9).select("o_orderkey"), src, "o_orderkey")
      drain("chain")
      drain("fresh") // fresh checkpoint: full-head insert redelivery must no-op
      graft.sources.SnapshotTable
        .read(ss, out)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(38, 4)))
            .cast("double").as("sum_price"))
        .orderBy("o_orderpriority")
    }

  /** CDC stream → copy-on-write MERGE into the snapshot table — the
    * full transactional upsert loop: the base table commits
    * key-clustered with manifest stats, a CDC feed (absolute updates,
    * flagged deletes, fresh-key inserts; key-disjoint so arrival order
    * cannot change the final state) arrives as three micro-batches
    * (maxFilesPerTrigger=1), and each lands through
    * SnapshotTable.mergeBatch — stats-routed touched-file rewrite plus
    * the batch-id guard that makes the NON-idempotent merge
    * exactly-once under redelivery. A second drain from a FRESH
    * checkpoint replays the whole feed and must no-op at the table.
    * The oracle reproduces the merged final state relationally; any
    * duplicated merge, leaked delete, lost survivor or replayed batch
    * breaks it. */
  private def cdcMergeStream(s: SparkSession, dir: String): DataFrame =
    withStatePartitions(s) { ss =>
      val table = graft.Stage.dir("graft_cdcmerge_", dir).getPath
      val feed = graft.Stage.dir("graft_cdcmergefeed_", dir).getPath
      val ckpt = graft.Stage.dir("graft_cdcmergeck_", dir).getPath
      Seq(table, feed, ckpt).foreach(p =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
      val o = Tables(ss, dir).orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
      graft.sources.SnapshotTable.commit(
        o.repartitionByRange(8, col("o_orderkey")).sortWithinPartitions("o_orderkey"),
        table, append = false, statsColumns = Seq("o_orderkey"))
      val low = o.filter(col("o_orderkey") < 4000)
      val upd = low.filter(col("o_orderkey") % 10 === 3)
        .withColumn("o_totalprice", col("o_totalprice") + 100000.0)
        .withColumn("_del", lit(false)).withColumn("b", lit(0))
      val del = low.filter(col("o_orderkey") % 10 === 7)
        .withColumn("_del", lit(true)).withColumn("b", lit(1))
      val ins = low.filter(col("o_orderkey") % 10 === 5)
        .withColumn("o_orderkey", col("o_orderkey") + 1000000L)
        .withColumn("o_orderpriority", lit("9-MERGED"))
        .withColumn("_del", lit(false)).withColumn("b", lit(2))
      // one file per CDC slice -> three micro-batches at the reader
      upd.unionByName(del).unionByName(ins)
        .repartition(1).write.partitionBy("b").parquet(feed)
      val schema = ss.read.parquet(feed).schema
      def drain(tag: String): Unit = {
        val q = ss.readStream
          .schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(feed)
          .writeStream
          .foreachBatch { (batch: DataFrame, id: Long) =>
            graft.sources.SnapshotTable.mergeBatch(
              batch.drop("b"), table, "o_orderkey", id, deleteCol = Some("_del"))
            ()
          }
          .option("checkpointLocation", s"$ckpt/$tag")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain("first")
      drain("replay") // fresh checkpoint: full redelivery must no-op
      graft.sources.SnapshotTable
        .read(ss, table)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(38, 4)))
            .cast("double").as("sum_price"))
        .orderBy("o_orderpriority")
    }

  /** Stream-static join: enrich the event stream with the customer
    * dimension (user_id = c_custkey), then aggregate per market
    * segment. The static side is re-broadcast per micro-batch by
    * Spark — the canonical streaming-enrichment shape (no state, no
    * watermark needed for an inner stream-static join); at scale the
    * dim stays broadcast-sized or becomes a slowly-changing table the
    * planner shuffles once. Batch-equivalent, so fully oracle-checked. */
  private def streamStaticJoin(s: SparkSession, dir: String): DataFrame = withStatePartitions(s) { ss =>
    val cust = Tables(ss, dir).customer.select(col("c_custkey"), col("c_mktsegment"))
    val joined = eventsStream(ss, dir)
      .join(cust, col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 4)))
          .cast("double")
          .as("sum_value"))
    val name = s"graft_sjoin_${System.nanoTime()}"
    val query = joined.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    MemoryResult.drain(ss, name)(_.orderBy("c_mktsegment"))
  }

  /** Stream-stream interval join: clicks joined to purchases of the
    * SAME user within the following hour — the canonical conversion /
    * attribution query, and the one streaming shape that genuinely
    * needs state on BOTH sides. Both streams carry a 2-hour watermark
    * and the join condition bounds event time on both ends, so Spark
    * can evict buffered rows once the watermark passes the interval —
    * state stays bounded by (watermark + interval) × arrival rate, not
    * by stream length, which is the 100 TB requirement. Inner join in
    * append mode: rows emit as they match (no watermark wait), and the
    * sides shuffle on user_id so matches co-locate. Batch-equivalent
    * (AvailableNow over a static file), hence fully oracle-checked;
    * gap_us is an exact integer difference of truncated-ns micros. */
  private def streamStreamJoin(s: SparkSession, dir: String): DataFrame = withStatePartitions(s) { ss =>
    def side(tpe: String, pfx: String) = eventsStream(ss, dir)
      .filter(col("event_type") === tpe)
      .select(
        col("event_id").as(s"${pfx}_id"),
        col("user_id").as(s"${pfx}_user"),
        expr("ts div 1000").as(s"${pfx}_us"),
        timestamp_micros(expr("ts div 1000")).as(s"${pfx}_ts"))
      .withWatermark(s"${pfx}_ts", "2 hours")
    val joined = side("click", "click")
      .join(
        side("purchase", "buy"),
        expr("""click_user = buy_user AND
                buy_ts >= click_ts AND buy_ts <= click_ts + interval 1 hour"""))
      .select(
        col("click_id"),
        col("buy_id"),
        col("click_user").as("user_id"),
        (col("buy_us") - col("click_us")).as("gap_us"))
    val name = s"graft_ssj_${System.nanoTime()}"
    val query = joined.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    MemoryResult.drain(ss, name)(_.orderBy("click_id", "buy_id"))
  }

  /** LEFT-OUTER stream-stream join — the semantics milestone past the
    * inner join: matched pairs emit as they match, but an UNMATCHED
    * click may only emit (with a null purchase side) once the
    * watermark PROVES no qualifying purchase can still arrive — i.e.
    * when wm has passed click_ts + the 1 h join bound. Clicks younger
    * than that stay in state, unemitted: the null side of an outer
    * stream join is inherently watermark-gated, which is exactly what
    * bounds its state at 100 TB (no forever-held left rows).
    *
    * With AvailableNow over the static file the final watermark is
    * deterministic — min(max click_ts, max purchase_ts) − 2 h delay
    * (each side's watermark tracks its own post-filter max; the query
    * watermark is their min) — and the trailing no-data micro-batch
    * flushes the eligible unmatched clicks. The oracle reproduces both
    * populations relationally: the inner matches, plus the anti-join
    * clicks whose click_us + 1 h lies strictly below that watermark;
    * later unmatched clicks are the UNEMITTED tail (same contract as
    * stream_late_data: watermark semantics surfaced as data). */
  private def streamStreamJoinOuter(s: SparkSession, dir: String): DataFrame =
    withStatePartitions(s) { ss =>
      def side(tpe: String, pfx: String) = eventsStream(ss, dir)
        .filter(col("event_type") === tpe)
        .select(
          col("event_id").as(s"${pfx}_id"),
          col("user_id").as(s"${pfx}_user"),
          expr("ts div 1000").as(s"${pfx}_us"),
          timestamp_micros(expr("ts div 1000")).as(s"${pfx}_ts"))
        .withWatermark(s"${pfx}_ts", "2 hours")
      val joined = side("click", "click")
        .join(
          side("purchase", "buy"),
          expr("""click_user = buy_user AND
                  buy_ts >= click_ts AND buy_ts <= click_ts + interval 1 hour"""),
          "left_outer")
        .select(
          col("click_id"),
          col("buy_id"),
          col("click_user").as("user_id"),
          (col("buy_us") - col("click_us")).as("gap_us"))
      val name = s"graft_ssjo_${System.nanoTime()}"
      val query = joined.writeStream
        .format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      MemoryResult.drain(ss, name)(_.orderBy("click_id", "buy_id"))
    }

  /** Windowed top-k heavy hitters with window-close emission, as the
    * two-stage chained-stateful plan (the r8 verdict's state-shape
    * fix): stage 1 is the ORDINARY distributed windowed count — state
    * keyed by (window, user), O(1) per key, append-mode eviction
    * emitting a window's finals exactly when the watermark passes its
    * end — and stage 2 is StatefulOps.topkReduce, a window-keyed
    * bounded fold holding ZERO retained state (all of a window's
    * finals arrive in the eviction micro-batch). The watermark both
    * bounds stage-1 state (closed windows evict) and DEFINES emission:
    * a window's top-3 appears exactly once; windows the final
    * watermark has not closed are the unemitted tail (same data
    * contract as stream_stream_join_outer). lastTopkStateRows records
    * the final batch's per-operator state row counts so the state
    * SHAPE — (window × user)-keyed counting, stateless reduction — is
    * spec-assertable, not just the output. */
  private def topkWindowStream(s: SparkSession, dir: String): DataFrame =
    withStatePartitions(s) { ss =>
      import ss.implicits._
      val counts = eventsStream(ss, dir)
        .select(col("user_id"), timestamp_micros(expr("ts div 1000")).as("event_ts"))
        .withWatermark("event_ts", "2 hours")
        .groupBy(window(col("event_ts"), "1 hour"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(
          col("window.start").cast("long").as("wstart_s"),
          col("user_id"),
          col("n"))
        .as[StatefulOps.WinCount]
      val out = StatefulOps.topkReduce(counts, 3)
      val name = s"graft_stopk_${System.nanoTime()}"
      val query = out.toDF().writeStream
        .format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      lastTopkStateRows.set(
        Option(query.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq)
          .map(o => o.operatorName -> o.numRowsTotal)
          .toMap)
      MemoryResult.drain(ss, name)(_.orderBy("wstart_s", "rank"))
    }

  /** Streaming dedup: duplicate the stream (self-union) then
    * dropDuplicatesWithinWatermark on the id — the streaming analog of
    * exact dedup with BOUNDED state: an id is only held until the
    * watermark (1 hour behind max event time) passes it, instead of
    * forever (the unbounded dropDuplicates is the canonical streaming
    * scale-killer; duplicates in real pipelines arrive close together,
    * which is exactly the within-watermark contract). Counts per type
    * must equal the distinct-id counts of one copy. */
  private def streamDedup(s: SparkSession, dir: String): DataFrame = withStatePartitions(s) { ss =>
    def src = eventsStream(ss, dir)
    val doubled = src
      .union(src)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .withWatermark("ts", "1 hour")
    val deduped = doubled
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
    val name = s"graft_sdedup_${System.nanoTime()}"
    val query = deduped.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    MemoryResult.drain(ss, name)(_.orderBy("event_type"))
  }

  /** Real flatMapGroupsWithState over the file stream: per-user running
    * (count, exact micro-unit total) state machine, Update output. The
    * memory sink collects one update per user per micro-batch; the
    * FINAL state per user (the row with max n — updates are cumulative)
    * equals the batch aggregation, independent of how the source split
    * into micro-batches. */
  private def stateRunning(s: SparkSession, dir: String): DataFrame = withStatePartitions(s) { ss =>
    import ss.implicits._
    val src = eventsStream(ss, dir)
      .select(
        col("user_id"),
        round(col("value") * 1000000).cast("long").as("v_micros"))
      .as[StatefulOps.EventM]
    val updates = StatefulOps.runningMicros(src)
    val name = s"graft_sstate_${System.nanoTime()}"
    val query = updates.toDF().writeStream
      .format("memory")
      .queryName(name)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    MemoryResult.drain(ss, name)(
      _.groupBy("user_id")
        .agg(
          max(col("n")).as("n_events"),
          max_by(col("total_micros"), col("n")).as("total_micros"))
        .orderBy("user_id"))
  }

  /** [[stateRunning]] on the transformWithState API — the scoped
    * session pins the RocksDB provider, which transformWithState
    * REQUIRES (the v2 state layout lives in RocksDB column families);
    * drain contract identical to the GroupState twin. */
  private def stateRunningTws(s: SparkSession, dir: String): DataFrame = withStatePartitions(s) { ss =>
    ss.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    val src = eventsStream(ss, dir)
      .select(
        col("user_id"),
        round(col("value") * 1000000).cast("long").as("v_micros"))
      .as[StatefulOps.EventM]
    val updates = StatefulOps.runningMicrosTws(src)
    val name = s"graft_tws_${System.nanoTime()}"
    val query = updates.toDF().writeStream
      .format("memory")
      .queryName(name)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    MemoryResult.drain(ss, name)(
      _.groupBy("user_id")
        .agg(
          max(col("n")).as("n_events"),
          max_by(col("total_micros"), col("n")).as("total_micros"))
        .orderBy("user_id"))
  }

  /** Real-stream scaffold for [[StatefulOps.zscoreAnomalies]]: file
    * source → stateful anomaly stream → append-mode memory sink (each
    * anomaly is emitted exactly once, so append is the natural mode —
    * no per-key dedup on drain). The production sink is the same
    * foreachBatch/file path every append stream here uses. */
  private def anomalyZscore(s: SparkSession, dir: String): DataFrame = withStatePartitions(s) { ss =>
    import ss.implicits._
    val src = eventsStream(ss, dir)
      .select(
        col("user_id"),
        col("event_id"),
        expr("ts div 1000").as("us"),
        round(col("value") * 100).cast("long").as("v"))
      .as[StatefulOps.EventZ]
    val name = s"graft_szscore_${System.nanoTime()}"
    val query = StatefulOps
      .zscoreAnomalies(src)
      .toDF()
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    MemoryResult.drain(ss, name)(_.orderBy("user_id", "event_id"))
  }

  /** Real-stream scaffold for [[StatefulOps.curationGate]]: the online
    * training-data admission pipeline. The augmented corpus (documents
    * plus a 60-copy boilerplate clique of doc 7, the pipe_end_to_end
    * fixture) is staged once (size+mtime-keyed like the late-data
    * stage), then streamed: the exact-integer quality gate runs as
    * STATELESS column expressions on the stream, and only passing
    * docs reach the digest-keyed stateful gate. */
  private def curationGate(s: SparkSession, dir: String): DataFrame = withStatePartitions(s) { ss =>
    import ss.implicits._
    val srcFile = new java.io.File(dir, "documents.parquet")
    val stage = graft.Stage.dir("graft_curate_", dir, srcFile.length(), srcFile.lastModified())
    if (!new java.io.File(stage, "_SUCCESS").exists()) {
      val docs = Tables(ss, dir).documents.select("doc_id", "lang", "text")
      val clique = docs
        .filter(col("doc_id") === 7)
        .crossJoin(ss.range(60).select((col("id") + 400000L).as("copy_id")))
        .select(col("copy_id").as("doc_id"), col("lang"), col("text"))
      docs.unionByName(clique).write.mode("overwrite").parquet(stage.getPath)
    }
    val src = ss.readStream
      .schema("doc_id BIGINT, lang STRING, text STRING")
      .parquet(stage.getPath)
    val gated = graft.pipeline.Pipeline
      .qualityFilter(src)
      .select(
        md5(col("text").cast("binary")).as("digest"),
        col("doc_id"),
        col("lang"),
        col("nw"))
      .as[StatefulOps.DocIn]
    val name = s"graft_scurate_${System.nanoTime()}"
    val query = StatefulOps
      .curationGate(gated)
      .toDF()
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    MemoryResult.drain(ss, name)(_.orderBy("doc_id"))
  }

  /** Real-stream scaffold for [[StatefulOps.cdcApply]]: the changelog
    * (same derivation as rel_cdc_apply — every orders key inserts at
    * seq 1, every 3rd updates at seq 2, every 9th deletes at seq 3) is
    * staged as THREE mtime-ordered parquet files so
    * maxFilesPerTrigger=1 delivers a day of CDC traffic as genuine
    * micro-batches: all inserts, then all updates, then all deletes —
    * the state machine must carry each key's max-seq state across
    * batches. Final states equal the batch operator's table exactly
    * (max-by-seq is split-invariant); keys whose final op is D are
    * dropped post-drain, like rel_cdc_apply's delete filter. */
  private def streamCdcApply(s: SparkSession, dir: String): DataFrame = withStatePartitions(s) { ss =>
    import ss.implicits._
    val srcFile = new java.io.File(dir, "orders.parquet")
    val stage = graft.Stage.dir("graft_scdc_", dir, srcFile.length(), srcFile.lastModified())
    if (!new java.io.File(stage, "b2.parquet").exists()) {
      val scratch = new java.io.File(stage.getPath + "_building")
      org.apache.commons.io.FileUtils.deleteDirectory(scratch)
      org.apache.commons.io.FileUtils.deleteDirectory(stage)
      scratch.mkdirs()
      val base = Tables(ss, dir).orders.select(
        col("o_orderkey").cast("long").as("k"),
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long").as("p_cents"))
      def writeOne(df: DataFrame, name: String, mtime: Long): Unit = {
        val tmp = new java.io.File(scratch, name + "_dir")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
        val part = tmp
          .listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .get
        val dst = new java.io.File(scratch, name)
        java.nio.file.Files.move(part.toPath, dst.toPath)
        org.apache.commons.io.FileUtils.deleteDirectory(tmp)
        dst.setLastModified(mtime)
        ()
      }
      writeOne(
        base.select(col("k"), lit("I").as("op"), lit(1L).as("seq"), col("p_cents")),
        "b0.parquet", 1700000000000L)
      writeOne(
        base.filter(col("k") % 3 === 0)
          .select(col("k"), lit("U").as("op"), lit(2L).as("seq"), (col("p_cents") + 100).as("p_cents")),
        "b1.parquet", 1700000060000L)
      writeOne(
        base.filter(col("k") % 9 === 0)
          .select(col("k"), lit("D").as("op"), lit(3L).as("seq"), col("p_cents")),
        "b2.parquet", 1700000120000L)
      if (!scratch.renameTo(stage)) sys.error(s"rename $scratch -> $stage failed")
    }
    val log = ss.readStream
      .schema("k BIGINT, op STRING, seq BIGINT, p_cents BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.getPath)
      .as[StatefulOps.CdcRow]
    val name = s"graft_scdc_${System.nanoTime()}"
    val query = StatefulOps.cdcApply(log).toDF().writeStream
      .format("memory")
      .queryName(name)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    MemoryResult.drain(ss, name)(
      _.groupBy("k")
        .agg(
          max_by(col("last_op"), col("seq")).as("last_op"),
          max_by(col("p_cents"), col("seq")).as("p_cents"))
        .filter(col("last_op") =!= "D")
        .select(col("k").as("o_orderkey"), col("last_op"), col("p_cents"))
        .orderBy("o_orderkey"))
  }

  /** Watermark LATE-DATA semantics as oracle-checked data. Empirically
    * calibrated (spark-shell progress traces, numRowsDroppedByWatermark):
    * Spark drops a late row only when its window's state was EVICTED in
    * a PRIOR batch — a watermark advanced in the same batch merges the
    * row first and evicts at batch end. So the staging uses THREE files
    * (fixed mtimes order the micro-batches under maxFilesPerTrigger=1):
    * b0 = even event_ids spanning the whole range (advances the
    * watermark to max(even ts) − 1 h), b1 = ids ≡ 1 mod 4 (merged — their
    * windows are still live during batch 1; eviction happens at its
    * end), b2 = ids ≡ 3 mod 4 (rows whose window closed below the
    * batch-1 eviction watermark are now DROPPED). Append mode then emits
    * exactly the windows the final watermark passed. Every effect is a
    * deterministic function of the id-mod-4 split, so the DuckDB oracle
    * reproduces the result exactly (watermarks are never hour-aligned
    * here, so `<` vs `<=` boundaries cannot matter).
    *
    * This is the semantic contract a 100 TB streaming deployment lives
    * by: state is bounded BECAUSE late data is dropped; this query makes
    * the trade observable instead of asserted. */
  private def lateData(s: SparkSession, dir: String): DataFrame = withStatePartitions(s) { ss =>
    ss.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // stage dir name includes the source file's (size, mtime): a
    // regenerated events.parquet at the same path invalidates the cache
    // instead of silently streaming stale batches
    val srcFile = new java.io.File(dir, "events.parquet")
    val stage = graft.Stage.dir("graft_late_", dir, srcFile.length(), srcFile.lastModified())
    if (!new java.io.File(stage, "b2.parquet").exists()) {
      val scratch = new java.io.File(stage.getPath + "_building")
      org.apache.commons.io.FileUtils.deleteDirectory(scratch)
      org.apache.commons.io.FileUtils.deleteDirectory(stage)
      scratch.mkdirs()
      val e = Tables(ss, dir).events
        .select(col("event_id"), expr("ts_ns div 1000").as("us"), col("event_type"))
      def writeOne(df: DataFrame, name: String, mtime: Long): Unit = {
        val tmp = new java.io.File(scratch, name + "_dir")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
        val part = tmp
          .listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .get
        val dst = new java.io.File(scratch, name)
        java.nio.file.Files.move(part.toPath, dst.toPath)
        org.apache.commons.io.FileUtils.deleteDirectory(tmp)
        dst.setLastModified(mtime)
        ()
      }
      // fixed mtimes, a minute apart: FileStreamSource orders batches by
      // modification time, so the split is reproducible run to run
      writeOne(e.filter(pmod(col("event_id"), lit(2)) === 0), "b0.parquet", 1700000000000L)
      writeOne(e.filter(pmod(col("event_id"), lit(4)) === 1), "b1.parquet", 1700000060000L)
      writeOne(e.filter(pmod(col("event_id"), lit(4)) === 3), "b2.parquet", 1700000120000L)
      if (!scratch.renameTo(stage)) sys.error(s"rename $scratch -> $stage failed")
    }
    val stream = ss.readStream
      .schema("event_id BIGINT, us BIGINT, event_type STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.getPath)
      .withColumn("ts", timestamp_micros(col("us")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("window_start"), col("n"))
    val name = s"graft_slate_${System.nanoTime()}"
    val query = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    lastLateDataDropped.set(
      query.recentProgress.flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum)
    MemoryResult.drain(ss, name)(_.orderBy("window_start"))
  }

  def queries: Seq[Q] = Seq(
    Q(
      "stream_late_data",
      (s, dir) => lateData(s, dir),
      Some("""WITH e AS (SELECT event_id, epoch_ns(ts)//1000 AS us FROM events),
             |w1 AS (SELECT MAX(us) - 3600000000 AS w FROM e WHERE event_id % 2 = 0),
             |w2 AS (SELECT MAX(us) - 3600000000 AS w FROM e),
             |kept AS (SELECT us FROM e WHERE event_id % 2 = 0 OR event_id % 4 = 1
             |  UNION ALL SELECT us FROM e, w1
             |  WHERE event_id % 4 = 3 AND ((us//3600000000)+1)*3600000000 > w1.w)
             |SELECT (us//3600000000)*3600 AS window_start, COUNT(*)::BIGINT AS n
             |FROM kept, w2 WHERE ((us//3600000000)+1)*3600000000 <= w2.w
             |GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    Q(
      "stream_state_running",
      (s, dir) => stateRunning(s, dir),
      Some("""SELECT user_id, COUNT(*) AS n_events,
             |SUM(CAST(round(value*1000000) AS BIGINT))::BIGINT AS total_micros
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),
    Q(
      "stream_state_tws",
      // The SAME running-state machine on Spark 4's transformWithState
      // (StatefulOps.RunningMicrosProcessor): named ValueState handle,
      // TTL config, RocksDB-backed v2 state layout — the production
      // arbitrary-state API. Oracle identical to stream_state_running:
      // the final per-user state must equal the batch aggregation on
      // either state API and either state store.
      (s, dir) => stateRunningTws(s, dir),
      Some("""SELECT user_id, COUNT(*) AS n_events,
             |SUM(CAST(round(value*1000000) AS BIGINT))::BIGINT AS total_micros
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
    ),
    Q(
      "stream_anomaly_zscore",
      // Streaming anomaly alerting: per-user running z-score against
      // the user's own history (see StatefulOps.zscoreAnomalies — the
      // monitoring/alerting state machine every event pipeline ends
      // in). Exact-integer prefix moments make every flag decision
      // bit-identical to the oracle's window recomputation; the
      // oracle's HUGEINT casts mirror the handler's BigInt products.
      (s, dir) => anomalyZscore(s, dir),
      Some("""WITH e AS (SELECT user_id, event_id, epoch_ns(ts)//1000 AS us,
             |            CAST(round(value*100) AS BIGINT) AS v FROM events),
             |p AS (SELECT user_id, event_id, v,
             |  COUNT(*) OVER w - 1 AS n, SUM(v) OVER w - v AS s, SUM(v*v) OVER w - v*v AS q
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
             |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT user_id, event_id, v, n AS n_prior FROM p
             |WHERE n >= 30 AND
             |  CAST(v*n - s AS HUGEINT)*CAST(v*n - s AS HUGEINT)
             |    > 9*(CAST(n AS HUGEINT)*q - CAST(s AS HUGEINT)*s)
             |ORDER BY user_id, event_id""".stripMargin)
    ),
    Q(
      "stream_curation_gate",
      // Online training-data admission: quality gate + exact-dedup
      // first-claim, both INSIDE the stream (see curationGate above /
      // StatefulOps.curationGate) — the day-0 streaming twin of
      // pipe_end_to_end's batch quality+exact stages, sharing their
      // exact-integer quality rule and the 60-copy clique fixture
      // (the clique passes quality once: only original doc 7
      // survives the digest gate).
      (s, dir) => curationGate(s, dir),
      Some(s"""WITH aug AS (SELECT doc_id, lang, text FROM documents
             |  UNION ALL SELECT 400000+i, lang, text FROM documents, UNNEST(range(60)) AS t(i) WHERE doc_id=7),
             |qm AS (SELECT doc_id, lang, text,
             |  len(string_split(text,' '))::BIGINT AS nw,
             |  length(text)::BIGINT AS len,
             |  (length(text)-length(regexp_replace(text,'[a-z]','','g')))::BIGINT AS alpha,
             |  len([w for w in string_split(text,' ') if w IN ${graft.functions.TextFunctions.StopwordsSql}])::BIGINT AS stop
             |  FROM aug),
             |q AS (SELECT doc_id, lang, nw, md5(text) AS h FROM qm
             |      WHERE ${graft.pipeline.PipelineCatalog.qualityGateSql})
             |SELECT doc_id, lang, nw
             |FROM (SELECT q.*, MIN(doc_id) OVER (PARTITION BY h) AS keep FROM q)
             |WHERE doc_id = keep ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "stream_cdc_apply",
      // Streaming changelog apply — rel_cdc_apply's state machine fed
      // by three mtime-ordered micro-batches (inserts, updates,
      // deletes); per-key max-seq state in GroupState, final D
      // suppresses the row. Oracle = the batch operator's table in
      // exact integer cents.
      (s, dir) => streamCdcApply(s, dir),
      Some("""WITH base AS (SELECT o_orderkey AS k,
             |  (CAST(o_totalprice AS DECIMAL(12,2)) * 100)::BIGINT AS p_cents FROM orders),
             |log AS (SELECT k, 'I' AS op, 1 AS seq, p_cents FROM base
             |  UNION ALL SELECT k, 'U', 2, p_cents + 100 FROM base WHERE k % 3 = 0
             |  UNION ALL SELECT k, 'D', 3, p_cents FROM base WHERE k % 9 = 0),
             |fin AS (SELECT k, arg_max(op, seq) AS last_op, arg_max(p_cents, seq) AS p_cents
             |        FROM log GROUP BY k)
             |SELECT k AS o_orderkey, last_op, p_cents
             |FROM fin WHERE last_op <> 'D' ORDER BY o_orderkey""".stripMargin)
    ),
    Q(
      "stream_dedup",
      (s, dir) => streamDedup(s, dir),
      Some("""SELECT event_type, COUNT(DISTINCT event_id) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),
    Q(
      "stream_rate_source",
      (s, dir) => rateSourceStream(s, dir),
      Some("""SELECT g % 4 AS part, COUNT(*)::BIGINT AS n,
             |SUM((g * 2654435761) % 1000000007)::BIGINT AS sum_value,
             |MAX(g // 4)::BIGINT AS max_seq
             |FROM range(0, 1000) t(g) GROUP BY 1 ORDER BY part""".stripMargin)
    ),
    Q(
      "stream_window_agg",
      (s, dir) => windowAgg(s, dir),
      Some("""SELECT (epoch_ns(ts)//3600000000000)*3600 AS window_start, event_type,
             |COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)
    ),
    Q(
      "stream_approx_distinct",
      // Streaming per-window cardinality via HLL++ state — see
      // approxDistinct: exact COUNT(DISTINCT) is structurally
      // impossible in a stream, so the sketch IS the operator; the
      // batch exact pass supplies the audit column and both engines
      // assert their own estimate within 10% (rel_sketch_distinct's
      // error-bound oracle contract, here across the streaming seam).
      (s, dir) => approxDistinct(s, dir),
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS us FROM events),
             |w AS (SELECT (us//86400000000)*86400 AS window_start,
             |      COUNT(DISTINCT user_id) AS n_exact,
             |      approx_count_distinct(user_id) AS n_app
             |      FROM e GROUP BY 1)
             |SELECT window_start, n_exact,
             |CASE WHEN abs(n_app - n_exact) <= greatest(n_exact // 10, 5) THEN 1 ELSE 0 END AS within_bound
             |FROM w ORDER BY window_start""".stripMargin)
    ),
    Q(
      "stream_window_sliding",
      // Sliding 2-hour windows every hour: each event contributes to
      // exactly 2 windows (Spark's window() expands the row; the oracle
      // mirrors the expansion with UNNEST(range(2))). Same real-stream
      // scaffold as stream_window_agg.
      (s, dir) => windowAggBy(s, dir, window(col("ts"), "2 hours", "1 hour")),
      Some("""WITH e AS (SELECT epoch_ns(ts)//3600000000000 AS hr, event_type, value FROM events),
             |w AS (SELECT (hr - k)*3600 AS window_start, event_type, value
             |      FROM e, UNNEST(range(2)) AS t(k))
             |SELECT window_start, event_type, COUNT(*) AS n,
             |CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
             |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)
    ),
    Q(
      "stream_join_static",
      (s, dir) => streamStaticJoin(s, dir),
      Some("""SELECT c_mktsegment, COUNT(*) AS n,
             |CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
             |FROM events JOIN customer ON user_id = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
    ),
    Q(
      "stream_stream_join",
      (s, dir) => streamStreamJoin(s, dir),
      Some("""WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts)//1000 AS us FROM events)
             |SELECT a.event_id AS click_id, b.event_id AS buy_id, a.user_id,
             |b.us - a.us AS gap_us
             |FROM e a JOIN e b ON a.user_id = b.user_id
             |WHERE a.event_type = 'click' AND b.event_type = 'purchase'
             |  AND b.us >= a.us AND b.us <= a.us + 3600000000
             |ORDER BY click_id, buy_id""".stripMargin)
    ),
    Q(
      "stream_stream_join_outer",
      (s, dir) => streamStreamJoinOuter(s, dir),
      // per-side watermarks floored to MILLISECONDS before the delay
      // subtraction — Spark tracks max event time at ms resolution
      // (ADVICE r8; flooring before least() equals flooring after)
      Some("""WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts)//1000 AS us FROM events),
             |c AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'click'),
             |b AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase'),
             |wm AS (SELECT least((SELECT (MAX(us)//1000)*1000 FROM c),
             |                    (SELECT (MAX(us)//1000)*1000 FROM b))
             |              - 7200000000 AS w),
             |matched AS (SELECT c.event_id AS click_id, b.event_id AS buy_id, c.user_id,
             |            b.us - c.us AS gap_us
             |            FROM c JOIN b ON c.user_id = b.user_id
             |            AND b.us >= c.us AND b.us <= c.us + 3600000000),
             |unmatched AS (SELECT c.event_id AS click_id, NULL::BIGINT AS buy_id, c.user_id,
             |              NULL::BIGINT AS gap_us
             |              FROM c, wm WHERE c.us + 3600000000 < wm.w
             |              AND NOT EXISTS (SELECT 1 FROM b WHERE b.user_id = c.user_id
             |                              AND b.us >= c.us AND b.us <= c.us + 3600000000))
             |SELECT * FROM matched UNION ALL SELECT * FROM unmatched
             |ORDER BY click_id, buy_id""".stripMargin)
    ),
    Q(
      "stream_topk_window",
      (s, dir) => topkWindowStream(s, dir),
      // wm mirrors Spark at MILLISECOND resolution (EventTimeWatermark
      // floors max event time to ms before subtracting the delay —
      // ADVICE r8), and closure is the agg-eviction predicate
      // `window.end <= wm` (WatermarkSupport builds LessThanOrEqual on
      // the key's window.end — NON-strict, unlike the old
      // EventTimeTimeout mechanism's strict comparison)
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS us FROM events),
             |wm AS (SELECT (MAX(us)//1000)*1000 - 7200000000 AS w FROM e),
             |win AS (SELECT user_id, (us // 3600000000) * 3600000000 AS ws FROM e),
             |cnt AS (SELECT ws, user_id, COUNT(*)::BIGINT AS n FROM win GROUP BY 1, 2),
             |closed AS (SELECT c.* FROM cnt c, wm WHERE c.ws + 3600000000 <= wm.w),
             |ranked AS (SELECT ws//1000000 AS wstart_s, user_id, n,
             |  row_number() OVER (PARTITION BY ws ORDER BY n DESC, user_id) AS rank FROM closed)
             |SELECT wstart_s, CAST(rank AS BIGINT) AS rank, user_id, n
             |FROM ranked WHERE rank <= 3 ORDER BY wstart_s, rank""".stripMargin)
    ),
    Q(
      "stream_snapshot_sink",
      (s, dir) => snapshotSinkStream(s, dir),
      Some("""SELECT event_type, COUNT(*)::BIGINT AS n_events,
             |COUNT(DISTINCT user_id)::BIGINT AS n_users
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    Q(
      "stream_table_sql_sink",
      // STREAMING WRITE THROUGH THE CATALOG (`writeStream.toTable` —
      // TableCapability.STREAMING_WRITE on the V2 table): each epoch
      // is a transactional append through the DSv2 StreamingWrite
      // protocol — executors write parquet task-side folding the
      // table's declared stats, the driver publishes ONE manifest per
      // epoch carrying the epoch id — and the appendBatch idempotence
      // rule makes redelivery a no-op: the second drain below runs
      // from a FRESH checkpoint (the full redelivery a checkpoint loss
      // produces) and must publish NOTHING (its re-written files are
      // dropped on the spot). The oracle is the plain batch aggregate:
      // duplicated or lost epochs break the hash. Round19Spec pins the
      // multi-epoch arm and the stats-on-streamed-files invariant.
      (s, dir) => withStatePartitions(s) { ss =>
        val wh = graft.Stage.dir("graft_tblsink_", dir).getPath
        val ckpt = graft.Stage.dir("graft_tblsinkck_", dir).getPath
        Seq(wh, ckpt).foreach(p =>
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
        val cat = "graftst_" + wh.takeRight(10).replaceAll("[^0-9a-zA-Z]", "")
        ss.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.SnapshotCatalog].getName)
        ss.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
        ss.sql(s"CREATE TABLE $cat.ev (event_type STRING, user_id BIGINT) " +
          "TBLPROPERTIES('statsColumns'='user_id')")
        def drain(tag: String): Unit =
          eventsStream(ss, dir)
            .select(col("event_type"), col("user_id").cast("long"))
            .writeStream
            .option("checkpointLocation", s"$ckpt/$tag")
            .trigger(Trigger.AvailableNow())
            .toTable(s"$cat.ev")
            .awaitTermination()
        drain("first")
        drain("replay") // fresh checkpoint, same table: redelivery must no-op
        ss.table(s"$cat.ev")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*)::BIGINT AS n_events,
             |COUNT(DISTINCT user_id)::BIGINT AS n_users
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    Q(
      "stream_table_sql_source",
      // STREAMING READ THROUGH THE CATALOG (`readStream.table` —
      // MICRO_BATCH_READ via SnapshotMicroBatchStream): offsets are
      // manifest VERSIONS, the initial batch is the full snapshot,
      // steady state is the per-range manifest diff (pure-append
      // validated; DV/delete boundaries refuse loudly) — and planning
      // hands Spark the data FILES as partitions directly: nothing is
      // staged per micro-batch, so commit() has nothing to reclaim
      // (the V1 CDC source's staging lifecycle does not exist here).
      // Implements SupportsTriggerAvailableNow for REAL AvailableNow
      // semantics (the V1 Source API falls back to single-batch).
      // Three SQL INSERTs land one at a time with a drain between each
      // (shared checkpoint), the sink is exactly-once appendBatch, and
      // a FOURTH drain from a fresh checkpoint (full redelivery) must
      // no-op — the oracle fails on any duplicated, lost, or
      // mis-sliced delta. Round19Spec pins the delta membership per
      // batch and the delete-boundary refusal.
      (s, dir) => withStatePartitions(s) { ss =>
        val wh = graft.Stage.dir("graft_tblsrc_", dir).getPath
        val out = graft.Stage.dir("graft_tblsrcout_", dir).getPath
        val ckpt = graft.Stage.dir("graft_tblsrcck_", dir).getPath
        Seq(wh, out, ckpt).foreach(p =>
          org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
        val cat = "graftsr_" + wh.takeRight(10).replaceAll("[^0-9a-zA-Z]", "")
        ss.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.SnapshotCatalog].getName)
        ss.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
        ss.sql(s"CREATE TABLE $cat.o (o_orderkey BIGINT, o_orderpriority STRING, " +
          "o_totalprice DOUBLE) TBLPROPERTIES('statsColumns'='o_orderkey')")
        Tables(ss, dir).orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
          .createOrReplaceTempView("graft_tblsrc_orders")
        def drain(tag: String): Unit = {
          val q = ss.readStream.table(s"$cat.o").writeStream
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
              graft.sources.SnapshotTable.appendBatch(batch, out, id)
              ()
            }
            .option("checkpointLocation", s"$ckpt/$tag")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        for (m <- 0 to 2) {
          ss.sql(s"INSERT INTO $cat.o SELECT * FROM graft_tblsrc_orders " +
            s"WHERE o_orderkey % 3 = $m")
          drain("shared")
        }
        drain("fresh") // full redelivery from a fresh checkpoint: must no-op
        graft.sources.SnapshotTable.read(ss, out)
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(38,4)")).cast("double").as("sum_price"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*)::BIGINT AS n_orders,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    Q(
      "stream_snapshot_source",
      (s, dir) => snapshotSourceStream(s, dir),
      Some("""SELECT o_orderpriority, COUNT(*)::BIGINT AS n_orders,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price
             |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    Q(
      "stream_snapshot_cdc",
      (s, dir) => snapshotCdcStream(s, dir),
      Some("""WITH base AS (SELECT o_orderkey, o_orderpriority, o_totalprice
             |  FROM orders WHERE o_orderkey % 3 = 0),
             |st AS (SELECT o_orderkey, o_orderpriority,
             |  CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice + 100000.0
             |       ELSE o_totalprice END AS o_totalprice
             |  FROM base WHERE o_orderkey % 10 NOT IN (7, 9))
             |SELECT o_orderpriority, COUNT(*)::BIGINT AS n_orders,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price
             |FROM st GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    Q(
      "stream_cdc_merge",
      (s, dir) => cdcMergeStream(s, dir),
      Some("""WITH base AS (SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders),
             |touched AS (SELECT o_orderkey FROM base WHERE o_orderkey < 4000
             |            AND o_orderkey % 10 IN (3, 7)),
             |merged AS (
             |  SELECT o_orderkey, o_orderpriority, o_totalprice FROM base
             |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM touched)
             |  UNION ALL
             |  SELECT o_orderkey, o_orderpriority, o_totalprice + 100000.0 FROM base
             |  WHERE o_orderkey < 4000 AND o_orderkey % 10 = 3
             |  UNION ALL
             |  SELECT o_orderkey + 1000000, '9-MERGED', o_totalprice FROM base
             |  WHERE o_orderkey < 4000 AND o_orderkey % 10 = 5)
             |SELECT o_orderpriority, COUNT(*)::BIGINT AS n_orders,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price
             |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    Q(
      "stream_sessionize",
      (s, dir) =>
        Tables(s, dir).events
          .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(
            col("user_id"),
            unix_timestamp(col("session_window.start")).as("session_start"),
            col("n_events"))
          .orderBy("user_id", "session_start"),
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS us FROM events),
             |o AS (SELECT user_id, us,
             |      CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w >= 600000000
             |           THEN 1 ELSE 0 END AS brk
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
             |s AS (SELECT user_id, us,
             |      SUM(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sess
             |      FROM o)
             |SELECT user_id, MIN(us)//1000000 AS session_start, COUNT(*) AS n_events
             |FROM s GROUP BY user_id, sess ORDER BY user_id, session_start""".stripMargin)
    )
  )
}
