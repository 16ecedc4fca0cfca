package graft.pipeline

import graft.dedup.DedupCatalog
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable curation pipeline over a documents relation
  * (doc_id BIGINT, lang STRING, text STRING) — the library-facing API
  * behind the `pipe_end_to_end` catalog query.
  *
  * Stages (each also usable alone):
  *   1. [[qualityFilter]] — exact-integer quality gate (no float
  *      boundary; see PipelineCatalog.qualityGateSql).
  *   2. [[exactDropIds]] — md5-digest dedup, keep min doc_id per digest.
  *      ONE hash-shuffle, no pairwise work; catches identical floods the
  *      LSH bucket cap intentionally ignores.
  *   3. [[nearDupDropIds]] — MinHash+LSH cluster non-representatives.
  *   4. [[assignSplit]] — deterministic md5-bucket train/val/test.
  *
  * Scale posture: the exact-drop anti-join stays a shuffle join (exact
  * duplicates can be a large corpus fraction); the near-dup id list is
  * broadcast (near-dup clusters are rare).
  */
object Pipeline {

  /** Documents passing the exact-integer quality >= 0.8 gate, with the
    * intermediate signal columns (nw/len/alpha/stop) attached. */
  def qualityFilter(docs: DataFrame): DataFrame =
    docs
      .withColumn("nw", size(ws(col("text"))).cast("long"))
      .withColumn("len", length(col("text")).cast("long"))
      .withColumn(
        "alpha",
        (length(col("text")) - length(regexp_replace(col("text"), "[a-z]", "")))
          .cast("long"))
      .withColumn("stop", stopHits(ws(col("text"))).cast("long"))
      .filter(
        least(col("nw"), lit(100L)) * col("len") * col("nw") +
          lit(60L) * col("alpha") * col("nw") +
          lit(40L) * (col("nw") - col("stop")) * col("len") >=
          lit(160L) * col("len") * col("nw"))

  /** doc_ids to drop as exact duplicates (min doc_id per digest kept). */
  def exactDropIds(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), md5(col("text").cast("binary")).as("digest"))
      .withColumn("keep_id", min(col("doc_id")).over(Window.partitionBy(col("digest"))))
      .filter(col("doc_id") =!= col("keep_id"))
      .select("doc_id")

  /** doc_ids to drop as non-canonical members of near-dup clusters. */
  def nearDupDropIds(docs: DataFrame): DataFrame =
    DedupCatalog
      .clusterAssignOver(docs)
      .filter(col("rep_id") =!= col("doc_id"))
      .select("doc_id")

  /** Deterministic md5-bucket split assignment (80/10/10). */
  def assignSplit(df: DataFrame): DataFrame = {
    val bucket = pmod(
      conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long"),
      lit(100L))
    df.withColumn(
      "split",
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
  }

  /** Full chain: quality gate -> exact dedup -> near-dup removal ->
    * split assignment. Returns the kept documents with the quality
    * signal columns and the split label. */
  def curate(docs: DataFrame): DataFrame =
    assignSplit(
      qualityFilter(docs)
        .join(exactDropIds(docs), Seq("doc_id"), "left_anti")
        .join(broadcast(nearDupDropIds(docs)), Seq("doc_id"), "left_anti"))

  /** [[curate]] plus the recall-trade report: runs `action` on the
    * curated frame and returns its result together with every graft_*
    * observed metric the execution emitted — e.g.
    * `graft_lsh_cap -> dropped_hot_buckets`, the count of degenerate
    * LSH buckets whose pairwise work the width cap skipped (their
    * members are caught by the exact-digest stage instead). A pipeline
    * user sees what the caps dropped, not just the curated rows.
    *
    * Metrics report what THIS execution computed: if the near-dup pair
    * set was already materialized in the session cache, the capped
    * stage does not re-run and the report is legitimately empty.
    */
  def curateAndReport[T](docs: DataFrame)(action: DataFrame => T): (T, Map[String, Map[String, Any]]) =
    graft.GraftMetrics.collect(docs.sparkSession)(action(curate(docs)))
}
