package graft.tools

import graft.{GraftCache, GraftSession, SparkEntry}
import graft.wikidata.{ShreddedLayout, SyntheticDump, WikidataShredder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SURVEY §5 ingestion scale-stress (the dedup/ANN family got the same
  * treatment in round 3): replicate the sf0.1 orders table 10x with
  * shifted keys so every synthetic entity id stays distinct, then time
  * the shred family at 1x vs 10x input, plus the shred-cache storage
  * levels (MEMORY_AND_DISK / DISK_ONLY / NONE) on the 10x input.
  *
  *   sbt "runMain graft.tools.IngestStress"        # both scales
  *   sbt "runMain graft.tools.IngestStress 10x"    # stress scale only
  *
  * Workloads (all on the scale-PROPORTIONAL orders dump — the
  * nation/region dump is a fixed ~31 entities and only proves
  * semantics, so it cannot carry a scaling curve):
  *   - shred_orders:  the wd_shred_orders catalog query (parse + shred
  *     quantity + global sort).
  *   - pipeline_all6: full 6-table shred, every table materialized —
  *     the wd_pipeline shape at dump scale.
  *   - sink_layout:   pipeline_all6 plus the partitioned/sorted layout
  *     write — the wd_sink_layout shape at dump scale.
  */
object IngestStress {

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(label: String)(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"INGEST_STRESS $label%-34s $dt%8.2f s")
    dt
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = System.getProperty("java.io.tmpdir")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val stress = s"$tmp/graft_stress_sf1"
    val stressOrders = new java.io.File(s"$stress/orders.parquet")
    // The replicated input is cached across runs, but only a COMPLETE
    // write may be reused: build into a scratch path and atomically
    // rename into place, so an interrupted first run can never leave a
    // partial orders.parquet that later runs silently bench against.
    if (!stressOrders.exists()) {
      val scratch = new java.io.File(s"$stress/_building_orders.parquet")
      if (scratch.exists()) org.apache.commons.io.FileUtils.deleteDirectory(scratch)
      val o = spark.read.parquet(s"$base/orders.parquet")
      (0 until 10)
        .map(i => o.withColumn("o_orderkey", col("o_orderkey") + lit(i * 10000000L)))
        .reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(scratch.getAbsolutePath)
      if (!scratch.renameTo(stressOrders))
        sys.error(s"rename $scratch -> $stressOrders failed")
    }
    // part, for the r6 orders/part-based relational ops: shifted keys,
    // price perturbed per replica so the distinct point set (and the
    // skyline candidate work) actually grows 10x instead of collapsing
    // to the 1x distinct() set
    val stressPart = new java.io.File(s"$stress/part.parquet")
    if (!stressPart.exists()) {
      val scratch = new java.io.File(s"$stress/_building_part.parquet")
      if (scratch.exists()) org.apache.commons.io.FileUtils.deleteDirectory(scratch)
      val p = spark.read.parquet(s"$base/part.parquet")
      (0 until 10)
        .map(i =>
          p.withColumn("p_partkey", col("p_partkey") + lit(i * 10000000L))
            .withColumn("p_retailprice", col("p_retailprice") + lit(i) * lit(0.001)))
        .reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(scratch.getAbsolutePath)
      if (!scratch.renameTo(stressPart))
        sys.error(s"rename $scratch -> $stressPart failed")
    }

    // lineitem, for the r6 stats/bucketed-join ops: orderkeys shifted
    // in lockstep with the orders replicas so the fact⋈fact join keys
    // still land
    val stressLineitem = new java.io.File(s"$stress/lineitem.parquet")
    if (!stressLineitem.exists()) {
      val scratch = new java.io.File(s"$stress/_building_lineitem.parquet")
      if (scratch.exists()) org.apache.commons.io.FileUtils.deleteDirectory(scratch)
      val l = spark.read.parquet(s"$base/lineitem.parquet")
      (0 until 10)
        .map(i => l.withColumn("l_orderkey", col("l_orderkey") + lit(i * 10000000L)))
        .reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(scratch.getAbsolutePath)
      if (!scratch.renameTo(stressLineitem))
        sys.error(s"rename $scratch -> $stressLineitem failed")
    }
    // events, for the r6 sessionize/anomaly/salted-join ops: user and
    // event ids shifted per replica (10x the user population, same
    // per-user behavior — the direction event volume actually grows),
    // timestamps untouched so session/window density per user holds
    // The stream ops locate events via pathGlobFilter over a BARE
    // events.parquet file (the testdata layout), so the replica must
    // be a single file, not a Spark-written directory: coalesce(1)
    // into scratch, then move the lone part file into place.
    val stressEvents = new java.io.File(s"$stress/events.parquet")
    if (!stressEvents.isFile) {
      if (stressEvents.exists()) org.apache.commons.io.FileUtils.deleteDirectory(stressEvents)
      val scratch = new java.io.File(s"$stress/_building_events_dir")
      if (scratch.exists()) org.apache.commons.io.FileUtils.deleteDirectory(scratch)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val e = spark.read.parquet(s"$base/events.parquet")
      (0 until 10)
        .map(i =>
          e.withColumn("event_id", col("event_id") + lit(i * 10000000L))
            .withColumn("user_id", col("user_id") + lit(i * 10000000L)))
        .reduce(_.unionByName(_))
        .coalesce(1)
        .write.mode("overwrite").parquet(scratch.getAbsolutePath)
      val part = scratch.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, stressEvents.toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(scratch)
    }

    def pipelineAll6(dir: String): Unit = {
      val sh = WikidataShredder.shred(SyntheticDump.ordersEntities(spark, dir))
      sh.all.foreach { case (_, df) => force(df) }
    }

    def runAll(dir: String, tag: String): Unit = {
      time(s"shred_orders_$tag") { force(SparkEntry.queries("wd_shred_orders")(spark, dir)) }
      GraftCache.clear()
      time(s"pipeline_all6_$tag") { pipelineAll6(dir) }
      GraftCache.clear()
      time(s"sink_layout_$tag") {
        ShreddedLayout.write(
          WikidataShredder.shred(SyntheticDump.ordersEntities(spark, dir)),
          s"$tmp/graft_stress_layout_$tag")
      }
      GraftCache.clear()
      // r6 relational ops over the replicated orders/part
      time(s"merge_scd2_$tag") { force(SparkEntry.queries("rel_merge_scd2")(spark, dir)) }
      GraftCache.clear()
      time(s"skyline_$tag") { force(SparkEntry.queries("rel_skyline")(spark, dir)) }
      GraftCache.clear()
      // r6 wave-2 ops over the replicated lineitem/events
      for (op <- Seq(
          "rel_stats_corr",
          "rel_join_bucketed",
          "rel_sessionize_batch",
          "rel_join_skew_salted",
          "stream_anomaly_zscore",
          "rel_setops_all",
          "rel_resample_ffill")) {
        time(s"${op}_$tag") { force(SparkEntry.queries(op)(spark, dir)) }
        GraftCache.clear()
      }
    }

    // warmup (JIT/classloading) on the tiny sf
    force(SparkEntry.entry(spark))

    // The r8 verdict's round-9 item #6: push the shred family to 100x
    // (15M entities at sf0.1 base) with the same replication harness —
    // recording whether the claims-explosion cache and the 6-sink
    // single-scan shape hold. Orders-only (the shred inputs); the
    // relational ops already carry their own 10x/100x curves. Built as
    // ONE constant-size crossJoin-with-range plan (like DocStress), not
    // a 100-leaf union tree.
    if (args.contains("100x")) {
      val stress100 = s"$tmp/graft_stress_sf10"
      val o100 = new java.io.File(s"$stress100/orders.parquet")
      if (!o100.exists()) {
        val scratch = new java.io.File(s"$stress100/_building_orders.parquet")
        if (scratch.exists()) org.apache.commons.io.FileUtils.deleteDirectory(scratch)
        val o = spark.read.parquet(s"$base/orders.parquet")
        val reps = spark.range(100).select(col("id").as("rep"))
        o.crossJoin(reps)
          .select(o.columns.map {
            case "o_orderkey" => (col("o_orderkey") + col("rep") * 10000000L).as("o_orderkey")
            case c            => col(c)
          }: _*)
          .write.mode("overwrite").parquet(scratch.getAbsolutePath)
        if (!scratch.renameTo(o100))
          sys.error(s"rename $scratch -> $o100 failed")
      }
      time("shred_orders_100x") { force(SparkEntry.queries("wd_shred_orders")(spark, stress100)) }
      GraftCache.clear()
      time("pipeline_all6_100x") { pipelineAll6(stress100) }
      GraftCache.clear()
      time("sink_layout_100x") {
        ShreddedLayout.write(
          WikidataShredder.shred(SyntheticDump.ordersEntities(spark, stress100)),
          s"$tmp/graft_stress_layout_100x")
      }
      GraftCache.clear()
      spark.stop()
      return
    }

    if (!args.contains("10x")) runAll(base, "1x")
    runAll(stress, "10x")

    // storage-level experiment on the 10x input: where does the parsed
    // claims cache want to live when the dump outgrows storage memory?
    for (lvl <- Seq("MEMORY_AND_DISK", "DISK_ONLY", "NONE")) {
      spark.conf.set("spark.graft.shred.storageLevel", lvl)
      time(s"pipeline_all6_10x_$lvl") { pipelineAll6(stress) }
      GraftCache.clear()
    }
    spark.conf.unset("spark.graft.shred.storageLevel")
    spark.stop()
  }
}
