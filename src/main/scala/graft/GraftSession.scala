package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard conf.
  *
  * Scale posture: AQE on (runtime coalescing + skew-join splitting),
  * shuffle partitions sized for the local harness (a real cluster sets
  * this to ~2-3x total cores), UTC so timestamp_ntz vs timestamp never
  * shifts, and nanos-as-long so the parquet TIMESTAMP(NANOS) events table
  * is readable (Spark has no nanosecond timestamp type).
  */
object GraftSession {

  def builder(cpus: Int): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE coalescing floor, sized for the harness like
      // spark.sql.shuffle.partitions above: the default 1m floor merges
      // any sub-32m post-shuffle stage down to a handful of tasks by
      // BYTES alone, which serializes stages whose cost is per-row CPU
      // (file-cutting layout writes — the compound INSERT measured 1
      // task x 4.8 s at the 1m floor vs 30 tasks x 0.7 s below it).
      // 256k keeps those stages parallel while leaving genuinely tiny
      // iterative shuffles (ann_hnsw's beam rounds) coalesced — 64k
      // measurably penalized them. A cluster deployment sizing
      // partitions for network efficiency keeps the 1m default (guide
      // §2.2); env-overridable for that measurement.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "256k"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // storage-partitioned joins: honor a DSv2 scan's reported
      // KeyGroupedPartitioning (the snapshot format's clustered arm) —
      // off by default upstream only for ecosystem compatibility
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      // static conf: managed-table home for bucketed writes
      .config(
        "spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")

  def local(cpus: Int = 32): SparkSession = {
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftMetrics.install(spark)
    spark
  }
}
