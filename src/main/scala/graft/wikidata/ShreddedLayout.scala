package graft.wikidata

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized on-disk layout for the 6 shredded tables — the Spark
  * analog of the reference's per-table src_id/dst_id indices
  * (/root/reference/wikidata-rs/src/value.rs:332-350).
  *
  * Layout (SURVEY §4):
  *   - edge-like tables are written `partitionBy(p_bucket)` where
  *     p_bucket = property_id mod [[NumBuckets]]. A property predicate
  *     plus the derived bucket predicate prunes to ONE directory at
  *     planning time — the same access path a property_id index gives
  *     the reference's DuckDB file, but as pure metadata (no lookup
  *     structure to build or keep hot).
  *   - before writing, rows are range-repartitioned on
  *     (p_bucket, src_id) and sorted within partitions, so each output
  *     file covers a contiguous src_id range and every parquet row
  *     group carries tight min/max src_id stats — the row-group-skip
  *     analog of the src_id index, with zero storage overhead.
  *   - vertex has no property dimension: range-partitioned + sorted on
  *     id only, giving the same row-group pruning for id lookups.
  *
  * At 100 TB: partition count per table = NumBuckets directories; file
  * count inside each follows the range partitioning (one writer task
  * per (bucket, src_id) range), so neither small-file explosion nor a
  * giant unsplittable file. Readers prune directories via the bucket
  * predicate and row groups via the sort, so a (property, src) point
  * query touches O(1) files regardless of corpus size.
  */
object ShreddedLayout {

  /** 64 property buckets: real dumps have ~11k properties with heavy
    * skew (P31/P279 dominate); the mod-bucket spreads hot properties
    * across distinct directories while keeping directory count bounded. */
  val NumBuckets = 64

  def bucketOf(propertyId: Column): Column = pmod(propertyId, lit(NumBuckets.toLong))

  private def writeEdgeLike(df: DataFrame, path: String): Unit =
    df.withColumn("p_bucket", bucketOf(col("property_id")))
      .repartitionByRange(col("p_bucket"), col("src_id"))
      .sortWithinPartitions("p_bucket", "src_id")
      .write
      .mode("overwrite")
      .partitionBy("p_bucket")
      .parquet(path)

  /** Write all 6 tables under `baseDir/<table>/`.
    *
    * Sequential on purpose. Round 18 overlapped the 6 independent writes
    * from a bare 3-thread driver pool (guide §2.6); those threads carried
    * no active SparkSession, and Spark's lazily-spawned shared pools
    * (AQE QueryStageCreator, broadcast-exchange) inherit thread-locals at
    * worker-creation time — a worker spawned from a session-less thread
    * poisons plan construction for UNRELATED later queries on the same
    * session (SparkPlan.session == null NPEs, nondeterministic). The
    * overlap bought scheduling latency only (plans unchanged), so it is
    * reverted rather than patched: deterministic correctness of the whole
    * process outweighs tail back-fill on 6 small writes. */
  def write(sh: Shredded, baseDir: String): Unit =
    sh.all.foreach {
      case ("vertex", df) =>
        df.repartitionByRange(col("id"))
          .sortWithinPartitions("id")
          .write
          .mode("overwrite")
          .parquet(s"$baseDir/vertex")
      case (name, df) => writeEdgeLike(df, s"$baseDir/$name")
    }

  def read(spark: SparkSession, baseDir: String, table: String): DataFrame =
    spark.read.parquet(s"$baseDir/$table")

  /** The indexed access path: property equality + the derived bucket
    * predicate (p_bucket is a pure function of property_id, so the
    * planner can only prune directories when the bucket predicate is
    * explicit — this helper is where that contract lives). */
  def forProperty(spark: SparkSession, baseDir: String, table: String, propertyId: Long): DataFrame =
    read(spark, baseDir, table)
      .filter(col("p_bucket") === (propertyId % NumBuckets) && col("property_id") === propertyId)
}
