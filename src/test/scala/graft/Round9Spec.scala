package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 operators: SQ8 scalar-quantized ANN, integer-quantized BM25,
  * DSIR-shaped importance selection.
  */
class Round9Spec extends AnyFunSuite {
  import TestSpark._

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("ann_sq8: near-exact recall vs brute force, decimal ADC, bounded-heap top-k") {
    val brute = pairs(SparkEntry.queries("ann_bruteforce")(spark, sf))
    val sq8 = SparkEntry.queries("ann_sq8")(spark, sf)
    val recall = (pairs(sq8) & brute).size.toDouble / brute.size
    info(f"ann_sq8 recall@5 = $recall%.3f")
    // brute force ranks by cosine, SQ8 by (quantized) L2 — for unnormalized
    // vectors the metrics themselves disagree on some neighbors, so the
    // floor is "clearly better than the lossier indexes", not ~1.0
    assert(recall > 0.3, s"SQ8 recall collapsed: $recall")
    // the ADC sum must be the order-independent exact DECIMAL(38,0)
    assert(sq8.schema("dist").dataType ===
      org.apache.spark.sql.types.DecimalType(38, 0))
    assert(
      PlanCheck.has[graft.plans.TopKPerGroupExec](sq8),
      s"top-k not heap-bounded:\n${PlanCheck.render(sq8)}")
    assert(
      PlanCheck.countNodes[org.apache.spark.sql.execution.window.WindowExec](sq8) <= 1,
      s"full-sort window crept back:\n${PlanCheck.render(sq8)}")
  }

  test("ann_sq8 beats the same-k L2 ranking of ann_pq codes (finer quantizer)") {
    // both rank by quantized L2 — SQ8 stores 64 codes/vector, PQ only 8,
    // so SQ8's L2 top-k must agree with the EXACT L2 top-k strictly more
    // often than PQ's does
    import graft.functions.VectorFunctions._
    val c = Fan
      .out(Tables(spark, sf).embeddings)
      .withColumn("qv", quantize(col("embedding")))
    val q = c.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("qv").as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("d2").asc, col("vec_id"))
    val exactL2 = c
      .join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("d2", aggregate(
        zip_with(col("qe"), col("qv"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("q_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8 = pairs(SparkEntry.queries("ann_sq8")(spark, sf))
    val pq = pairs(SparkEntry.queries("ann_pq")(spark, sf))
    val rSq8 = (sq8 & exactL2).size.toDouble / exactL2.size
    val rPq = (pq & exactL2).size.toDouble / exactL2.size
    info(f"L2 agreement@5: sq8 $rSq8%.3f vs pq $rPq%.3f")
    assert(rSq8 > 0.8, s"SQ8 is supposed to be near-exact on its own metric: $rSq8")
    assert(rSq8 > rPq, "the 64-code quantizer must beat the 8-code quantizer")
  }

  test("text_bm25: quantized ranking tracks float BM25, scores descend") {
    val out = SparkEntry.queries("text_bm25")(spark, sf).collect()
    assert(out.length === 20)
    val scores = out.map(_.getLong(2))
    assert(scores.sameElements(scores.sorted.reverse), "scores must descend")
    assert(out.forall(_.getLong(1) >= 1), "every hit matches >= 1 query term")
    // reference float BM25 (k1=1.2, b=0.75, idf=log2(N/df)+1 — the same
    // shape the quantized integers approximate) computed driver-side
    val terms = Set("spark", "window", "hash")
    val docs = Tables(spark, sf).documents
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.size).sum / n
    val df = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    val floatScores = docs.map { case (id, w) =>
      val dl = w.size.toDouble
      id -> terms.toSeq.map { t =>
        val tf = w.count(_ == t).toDouble
        if (tf == 0 || df(t) == 0) 0.0
        else (math.log(n / df(t)) / math.log(2) + 1) *
          tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }.sum
    }.toMap
    val floatTop40 = floatScores.toSeq
      .sortBy { case (id, s) => (-s, id) }.take(40).map(_._1).toSet
    val overlap = out.map(_.getLong(0)).count(floatTop40)
    info(s"quantized top-20 inside float top-40: $overlap/20")
    assert(overlap >= 16, s"quantized BM25 diverged from float BM25: $overlap/20")
  }

  test("text_dsir: target docs excluded, signal discriminates, self-scoring is target-like") {
    val out = SparkEntry.queries("text_dsir")(spark, sf).collect()
    assert(out.forall(_.getLong(0) >= 50), "target sample must not score itself in the output")
    val kept = out.count(_.getBoolean(3))
    info(s"dsir: ${out.length} raw docs, $kept kept")
    assert(kept > 0 && kept < out.length, "importance signal must discriminate")
    // consistency: keep <-> imp_score > 0
    assert(out.forall(r => r.getBoolean(3) === (r.getLong(2) > 0)))
    // the target sample itself, pushed through the same bucket tables,
    // must look MORE target-like than the raw pool on average (the
    // property that makes the weights meaningful): compare mean
    // per-token ppm difference of docs 0-49 vs the scored pool
    val bucketOf = (t: String) => {
      val d = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      (java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % 128).toInt
    }
    val docs = Tables(spark, sf).documents
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").map(bucketOf).toSeq)
    val tgtTok = docs.filter(_._1 < 50).flatMap(_._2)
    val rawTok = docs.flatMap(_._2)
    val tgtC = tgtTok.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rawC = rawTok.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def ppmDiff(b: Int): Long =
      (tgtC.getOrElse(b, 0L) + 1) * 1000000 / (tgtTok.length + 128) -
        (rawC(b) + 1) * 1000000 / (rawTok.length + 128)
    val selfMean = tgtTok.map(ppmDiff).sum.toDouble / tgtTok.length
    val poolMean = out.map(_.getLong(2)).sum.toDouble / out.map(_.getLong(1)).sum
    info(f"mean ppm-diff per token: target sample $selfMean%.2f vs raw pool $poolMean%.2f")
    assert(selfMean > poolMean, "target sample must score more target-like than the pool")
  }

  test("rel_k_core equals the naive in-memory peel, all core degrees >= 2") {
    GraftCache.clear()
    val out = SparkEntry.queries("rel_k_core")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.forall(_ >= 2), "a 2-core vertex must keep degree >= 2 inside the core")
    // naive reference peel on the same support->=2 co-purchase edges
    val li = Tables(spark, sf).lineitem
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges = li.toSeq.groupBy(_._1).values.toSeq.flatMap { grp =>
      val ps = grp.map(_._2)
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).filter(_._2.size >= 2).keySet
    var changed = true
    while (changed) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view.mapValues(_.size)
      val next = edges.filter(e => deg(e._1) >= 2 && deg(e._2) >= 2)
      changed = next != edges
      edges = next
    }
    val expect = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out === expect, "distributed peel diverged from the naive peel")
    GraftCache.clear()
  }

  test("wd_label_propagation: deterministic, communities refine connected components") {
    val a = SparkEntry.queries("wd_label_propagation")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val b = SparkEntry.queries("wd_label_propagation")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(a.sameElements(b), "fixed-round synchronous LPA must be deterministic")
    // labels can only travel along edges, so every vertex's community
    // label must sit inside the vertex's own connected component
    val comp = SparkEntry.queries("wd_connected_components")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.foreach { case (v, lbl) =>
      assert(comp(lbl) === comp(v), s"vertex $v adopted label $lbl from another component")
    }
    // the fixed 3 rounds must genuinely propagate: some vertex ends up
    // with a neighbor-derived label, and more than one community survives
    assert(a.exists { case (v, lbl) => lbl != v }, "no label moved in 3 rounds")
    assert(a.map(_._2).distinct.length > 1, "everything collapsed to one community")
  }
}
