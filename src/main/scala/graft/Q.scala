package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a named operator query over a testdata scale-factor
  * directory, plus (when SQL-expressible) an equivalent DuckDB oracle SQL
  * run by the driver over the same parquet tables.
  *
  * Determinism contract (see SURVEY.md §6): every query has a total ORDER
  * BY, and every summed float goes through an exact DECIMAL(38,4) cast so
  * accumulation order can never leak into the result hash.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryModule {
  def queries: Seq[Q]
}

object Fan {

  /** Spread a scan across all cores before CPU-heavy narrow work.
    *
    * The local testdata parquet is single-row-group, so a scan yields
    * ONE partition and everything before the first shuffle runs in one
    * task. On a real cluster the scan itself provides splits and this
    * repartition round-trips a small exchange — harmless (AQE coalesces)
    * — but locally it is the difference between 1x and 32x parallelism
    * on hash/quantize/JSON-build loops. */
  def out(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
