package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 wave: mixture weights, PMI collocations, and the rest of
  * the round-9 continuation operators.
  */
class Round13Spec extends AnyFunSuite {
  import TestSpark._

  test("text_mixture_weights: isqrt is exact, weights sum to ~1e6, flattening holds") {
    val rows = SparkEntry.queries("text_mixture_weights")(spark, sf).collect()
    assert(rows.nonEmpty)
    var wSum = 0L
    rows.foreach { r =>
      val tok = r.getAs[Long]("n_tokens")
      val isq = r.getAs[Long]("isqrt_tokens")
      // the ±1-corrected floor(sqrt) must be the TRUE integer sqrt
      assert(isq * isq <= tok && (isq + 1) * (isq + 1) > tok, s"isqrt($tok) != $isq")
      wSum += r.getAs[Long]("weight_ppm")
    }
    // floor division loses < 1 ppm per source
    assert(wSum <= 1000000L && wSum > 1000000L - rows.length, s"weight mass $wSum")
    // temperature flattening: every source's mixture share sits BETWEEN
    // proportional sampling and uniform — bigger-than-mean sources are
    // downweighted, smaller-than-mean upweighted (that is the point of
    // the sqrt). Verified pairwise: weight order tracks token order but
    // with compressed ratios.
    val byTok = rows.sortBy(_.getAs[Long]("n_tokens"))
    val (lo, hi) = (byTok.head, byTok.last)
    val tokRatio = hi.getAs[Long]("n_tokens").toDouble / lo.getAs[Long]("n_tokens")
    val wRatio = hi.getAs[Long]("weight_ppm").toDouble / lo.getAs[Long]("weight_ppm")
    assert(wRatio <= tokRatio && wRatio >= 1.0 - 1e-9,
      s"sqrt flattening violated: tokens $tokRatio vs weight $wRatio")
  }

  test("text_pmi_collocations: lift recount and min-count screen") {
    val rows = SparkEntry.queries("text_pmi_collocations")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_.getAs[Long]("n_ab") >= 5L))
    // brute recount of the top pair from the raw corpus
    val top = rows.head
    val docs = Tables(spark, sf).documents
      .select(split(col("text"), " ").as("w"))
      .collect()
      .map(_.getSeq[String](0))
    val bigrams = docs.flatMap(ws => ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")))
    val unigrams = docs.flatMap(identity)
    val nAb = bigrams.count(_ == top.getAs[String]("pair"))
    val Array(a, b) = top.getAs[String]("pair").split(" ")
    assert(nAb.toLong === top.getAs[Long]("n_ab"))
    assert(unigrams.count(_ == a).toLong === top.getAs[Long]("n_a"))
    assert(unigrams.count(_ == b).toLong === top.getAs[Long]("n_b"))
    val lift = (BigInt(nAb) * unigrams.length * unigrams.length * 1000000 /
      (BigInt(bigrams.length) * unigrams.count(_ == a) * unigrams.count(_ == b))).toLong
    assert(lift === top.getAs[Long]("lift_ppm"))
    // the list is ranked
    val lifts = rows.map(_.getAs[Long]("lift_ppm"))
    assert(lifts.sameElements(lifts.sorted.reverse))
  }
}
