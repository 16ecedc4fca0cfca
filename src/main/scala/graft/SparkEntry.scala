package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every operator catalog; each Q carries its own oracle SQL.
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    operators.RelCatalog,
    sources.SourceCatalog,
    wikidata.WikidataCatalog,
    text.TextCatalog,
    dedup.DedupCatalog,
    ann.AnnCatalog,
    streaming.StreamingCatalog,
    multimodal.MultimodalCatalog,
    pipeline.PipelineCatalog
  )

  private lazy val all: Seq[Q] = {
    val qs = modules.flatMap(_.queries)
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }

  /** Flagship query (TPC-H Q1 pricing summary) on sf0.001; driver
    * smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.find(_.name == "rel_agg_group").get.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
