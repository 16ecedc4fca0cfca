package graft.sources

import org.apache.spark.sql.DataFrame

/** Output side of §2.3. Parquet (partitioned, zstd) is the scale-path
  * sink; csv/json are interchange writers. All are thin, deliberate
  * wrappers — the point is the layout decisions, not the API.
  */
object GraftSinks {

  /** Partitioned parquet — the 100 TB posture: partition columns become
    * directory pruning keys (e.g. the shredded edge table partitioned by
    * a property_id bucket; a predicate on the key prunes to one
    * directory, see SURVEY §4). */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  def csv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def json(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
