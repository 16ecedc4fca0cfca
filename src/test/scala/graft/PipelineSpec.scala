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
