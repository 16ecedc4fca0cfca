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
    * The 6 writes are independent jobs over the one persisted claims
    * relation: submitting them from a small driver pool (guide §2.6,
    * "overlap independent jobs") lets the next table's tasks back-fill
    * executors freed by the previous write's straggler tail — FIFO
    * scheduling gives exactly the back-fill shape. 3 in flight is
    * enough to fill tails without fighting for executors. */
  def write(sh: Shredded, baseDir: String): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val writes = sh.all.map {
        case ("vertex", df) => Future {
          df.repartitionByRange(col("id"))
            .sortWithinPartitions("id")
            .write
            .mode("overwrite")
            .parquet(s"$baseDir/vertex")
        }
        case (name, df) => Future(writeEdgeLike(df, s"$baseDir/$name"))
      }
      Await.result(Future.sequence(writes), scala.concurrent.duration.Duration.Inf)
      ()
    } finally pool.shutdown()
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
