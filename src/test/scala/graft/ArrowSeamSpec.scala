package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.ArrowScorer

/** The Arrow inference seam (Bridge.mapArrowBatches + ArrowScorer):
  * batch sizing, scorer-vs-Catalyst identity, empty partitions. */
object ArrowSeamSpec {
  val seen = new AtomicLong(0L) // local[—] = one JVM, safe to count here

  // top-level so the task closure captures no scalatest state
  val countingScore: Iterator[Array[Byte]] => Iterator[Array[Byte]] =
    bs => ArrowScorer.score(bs.map { b => seen.incrementAndGet(); b })
}

class ArrowSeamSpec extends AnyFunSuite {
  import TestSpark._

  test("seam: scorer matches the Catalyst-computed score exactly; batches sized") {
    val in = Tables(spark, sf).embeddings.select("vec_id", "embedding").coalesce(1)
    val n = in.count()
    ArrowSeamSpec.seen.set(0L)
    val out = Bridge.mapArrowBatches(in, ArrowScorer.outSchema, 100L)(
      ArrowSeamSpec.countingScore)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // one IPC batch per 100 rows of the single partition
    assert(ArrowSeamSpec.seen.get() === (n + 99) / 100,
      s"expected ceil($n/100) Arrow batches")
    // the scorer's integer arithmetic, restated in Catalyst — must agree
    // on every row (both are exact: quantize before summing)
    val expected = in.select(col("vec_id"),
      expr("""aggregate(
             |  zip_with(embedding, sequence(0, size(embedding) - 1),
             |           (v, i) -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)
             |                     * CAST((i % 13) - 6 AS BIGINT)),
             |  0L, (acc, x) -> acc + x)""".stripMargin).as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === expected)
    assert(got.size.toLong === n)
  }

  test("seam: empty partitions produce no batches and no rows") {
    val in = Tables(spark, sf).embeddings.select("vec_id", "embedding")
      .filter(col("vec_id") < 0).repartition(4)
    val out = Bridge.mapArrowBatches(in, ArrowScorer.outSchema, 100L)(ArrowScorer.score)
    assert(out.count() === 0L)
  }
}
