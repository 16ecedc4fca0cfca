package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver's testdata star schema (TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst's pushdown / pruning
  * applies; nothing is cached here — callers decide lifetime.
  */
final class Tables(val spark: SparkSession, val dir: String) {
  def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** events.parquet stores TIMESTAMP(NANOS) which Spark cannot represent;
    * with nanosAsLong the raw column is bigint nanos. `events` exposes
    * both the raw nanos (`ts_ns`) and a microsecond-truncated timestamp
    * (`ts`) — truncation (floor) matches DuckDB's ns->us cast.
    */
  def eventsRaw: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events")
  }

  def events: DataFrame =
    eventsRaw
      .withColumnRenamed("ts", "ts_ns")
      // integer div — a double division would lose precision at 1e18 ns
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))

  /** Register the named tables as temp views so spark.sql text matches the
    * DuckDB oracle text (same table names as the parquet basenames). */
  def views(names: String*): Tables = {
    names.foreach(n => t(n).createOrReplaceTempView(n))
    this
  }
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
