package graft

import org.scalatest.funsuite.AnyFunSuite

/** Value/plan properties of the packing and sketch operators that the
  * DuckDB oracle cannot express: token-stream contiguity, the
  * distributed-scan plan shape, and the count-min overestimate
  * guarantee.
  */
class PackSketchSpec extends AnyFunSuite {
  import TestSpark._

  test("text_pack_chunks packs a contiguous token stream, bucket-parallel scan") {
    val df = SparkEntry.queries("text_pack_chunks")(spark, sf)
    val rows = df
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // exclusive prefix sum: doc i+1 starts exactly where doc i ended
    assert(rows.head._3 === 0L, "first doc must start at token 0")
    rows.sliding(2).foreach {
      case Array((_, n, s, _, _, _), (d2, _, s2, _, _, _)) =>
        assert(s2 === s + n, s"gap/overlap in token stream before doc $d2")
      case _ =>
    }
    // chunk span arithmetic is internally consistent
    rows.foreach { case (d, n, s, fc, lc, nc) =>
      assert(fc === s / 64 && lc === (s + n - 1) / 64 && nc === lc - fc + 1, s"chunk math off for doc $d")
    }
    // the full-table window must be partitioned BY BUCKET (parallel),
    // not a single global sort — only the tiny bucket-offset window may
    // run single-partition
    assert(
      PlanCheck.hashExchangeKeyed(df, "bucket"),
      s"per-bucket window lost its parallel partitioning:\n${PlanCheck.render(df)}")
  }

  test("dedup_bloom_incremental: never false-negative, catches every re-crawl, broadcast probe") {
    val df = SparkEntry.queries("dedup_bloom_incremental")(spark, sf)
    val r = df.collect().head
    // (n_new, n_bloom_pass, n_true_dup, n_false_pos, n_false_neg)
    assert(r.getLong(4) === 0L, "a Bloom filter can never false-negative")
    assert(r.getLong(2) > 0L, "injected re-crawls missing from the new batch")
    assert(r.getLong(1) >= r.getLong(2), "every true dup must bloom-pass")
    assert(
      PlanCheck.has[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec](df),
      s"bloom probe should broadcast the 64-word filter:\n${PlanCheck.render(df)}")
  }

  test("rel_sketch_distinct: raw HLL estimate stays well inside the 10% oracle gate") {
    // The driver oracle pins only the within_10pct FLAG (the raw
    // estimate is engine-specific, so it cannot cross the hashed
    // boundary). This is the diagnosable channel the catalog comment
    // points at: if a sketch-implementation change ever flips the
    // flag, this test names the actual relative error per group.
    import org.apache.spark.sql.functions._
    val rows = Tables(spark, sf).orders
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_exact"),
        approx_count_distinct(col("o_custkey"), 0.02).as("n_approx"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (grp, exact, approx) =>
      val relErr = math.abs(approx - exact).toDouble / exact.max(1L)
      assert(relErr <= 0.10, f"group $grp: HLL++ estimate $approx vs exact $exact (relErr=$relErr%.4f) breached the oracle gate")
    }
  }

  test("rel_sketch_topk: count-min never underestimates, sketch probe is broadcast") {
    val df = SparkEntry.queries("rel_sketch_topk")(spark, sf)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { case (k, exact, est, over) =>
      assert(est >= exact, s"CM underestimated key $k: $est < $exact")
      assert(over === est - exact)
    }
    // descending by exact count (keys ascending within ties)
    assert(rows.map(_._2).sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    assert(
      PlanCheck.has[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec](df),
      s"sketch probe should broadcast the 256-cell sketch:\n${PlanCheck.render(df)}")
  }
}
