package graft

import graft.pipeline.Pipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("Pipeline.curate drops exact duplicates, keeps one representative, assigns splits") {
    import spark.implicits._
    // high quality by the gate: >=100 words, all-alpha, few stopwords
    val good = (0 until 20)
      .map(_ => "lorem ipsum dolor sit amet consectetur adipiscing elit tempor incididunt")
      .mkString(" ")
    val docs = Seq(
      (1L, "en", good),           // keeper (min doc_id of the digest group)
      (2L, "en", good),           // exact dup -> dropped
      (3L, "en", good),           // exact dup -> dropped
      (4L, "en", "zz")            // fails the quality gate -> dropped
    ).toDF("doc_id", "lang", "text")
    val kept =
      try Pipeline.curate(docs).select("doc_id", "split").collect()
      finally GraftCache.clear()
    assert(kept.map(_.getLong(0)).toSet === Set(1L))
    assert(Set("train", "val", "test").contains(kept.head.getString(1)))
  }

  test("Pipeline.curateAndReport surfaces the LSH cap's recall trade") {
    // The 60-copy clique (same shape as pipe_end_to_end's) floods every
    // band bucket past MaxBucketWidth: the cap must drop those buckets
    // AND the report must say so — the trade is visible, not silent.
    val docs = Tables(spark, sf).documents.select("doc_id", "lang", "text")
    val clique = docs
      .filter(col("doc_id") === 7)
      .crossJoin(spark.range(60).select((col("id") + 400000L).as("copy_id")))
      .select(col("copy_id").as("doc_id"), col("lang"), col("text"))
    GraftCache.clear() // fresh materialization so the capped stage runs
    val (nKept, report) =
      try Pipeline.curateAndReport(docs.unionByName(clique))(_.count())
      finally GraftCache.clear()
    assert(nKept > 0)
    val cap = report.getOrElse("graft_lsh_cap", fail(s"graft_lsh_cap missing from report: $report"))
    assert(cap("dropped_hot_buckets").asInstanceOf[Long] > 0L, s"clique not capped: $cap")
    // the clique itself must still die at the exact-digest stage
    val ids = try Pipeline.curate(docs.unionByName(clique))
      .filter(col("doc_id") >= 400000L).count()
    finally GraftCache.clear()
    assert(ids <= 1L)
  }

  test("Pipeline stages compose: quality gate is exact-integer, split is deterministic") {
    import spark.implicits._
    val docs = Tables(spark, sf).documents.select("doc_id", "lang", "text")
    val a =
      try Pipeline.curate(docs).select("doc_id", "split").collect().map(_.toString).sorted
      finally GraftCache.clear()
    val b =
      try Pipeline.curate(docs).select("doc_id", "split").collect().map(_.toString).sorted
      finally GraftCache.clear()
    assert(a === b)
    assert(a.nonEmpty)
  }
}
