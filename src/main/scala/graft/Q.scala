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
