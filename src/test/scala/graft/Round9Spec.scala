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
    // the ADC sum is computed in order-independent exact DECIMAL(38,0)
    // but rides the wire as a lossless hi/lo BIGINT split over the 1e9
    // radix (the driver hash layer's exact type family); lo must stay
    // inside its radix or the split isn't a bijection
    assert(sq8.schema("dist_hi").dataType === org.apache.spark.sql.types.LongType)
    assert(sq8.schema("dist_lo").dataType === org.apache.spark.sql.types.LongType)
    val los = sq8.select("dist_lo").collect().map(_.getLong(0))
    assert(los.forall(l => l >= 0L && l < 1000000000L), "dist_lo escaped its radix")
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

  test("src_partitioned: the year filter prunes at the partition listing, not the scan") {
    val df = SparkEntry.queries("src_partitioned")(spark, sf)
    df.collect() // force AQE so the final plan is the executed one
    val scans = PlanCheck.fileScans(df)
    assert(scans.nonEmpty, s"no file scan found:\n${PlanCheck.render(df)}")
    val scan = scans.head
    assert(
      scan.partitionFilters.exists(_.references.exists(_.name == "o_year")),
      s"o_year predicate not a partition filter:\n${PlanCheck.render(df)}")
    // pruning must reduce the scan to exactly the 1995 directory
    val parts = scan.selectedPartitions
    assert(parts.partitionCount === 1,
      s"expected 1 surviving partition, got ${parts.partitionCount}")
    assert(parts.toPartitionArray.forall(_.filePath.toString.contains("o_year=1995")))
    // and the data filter must NOT re-appear as a post-scan filter on o_year
    assert(scan.dataFilters.forall(!_.references.exists(_.name == "o_year")))
  }

  test("rel_event_pattern: regex match count equals a hand walk of one user's stream") {
    val out = SparkEntry.queries("rel_event_pattern")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = Tables(spark, sf).events
      .select("user_id", "ts_ns", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._1)
    assert(out.keySet === byUser.keySet)
    byUser.foreach { case (u, rows) =>
      val seq = rows.sortBy(r => (r._2, r._3)).map(_._4.head).mkString
      val expect = "vc*p".r.findAllIn(seq).size.toLong
      assert(out(u) === ((rows.length.toLong, expect)), s"user $u: seq=$seq")
    }
    // the pattern must actually fire somewhere
    assert(out.values.map(_._2).sum > 0, "no vc*p match in the whole stream")
  }

  test("mm_scene_cut: cuts are sparse, diff only null on frame 0, one-doc recount") {
    val out = SparkEntry.queries("mm_scene_cut")(spark, sf).collect()
    val cuts = out.count(_.getBoolean(4))
    info(s"${out.length} frames, $cuts cuts (${100.0 * cuts / out.length}%)")
    // threshold 49152 of a uniform 16-bit feature: ~6% cut rate expected
    assert(cuts > 0 && cuts < out.length / 5, "cut rate implausible for the threshold")
    out.foreach { r =>
      if (r.getLong(1) == 0L) assert(r.isNullAt(3), "frame 0 has no predecessor")
      else assert(!r.isNullAt(3))
    }
    // recount one document end-to-end from its text
    val (docId, text) = Tables(spark, sf).documents
      .select("doc_id", "text").orderBy("doc_id").limit(1).collect()
      .map(r => (r.getLong(0), r.getString(1))).head
    val stride = math.max(text.length / 8, 1)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val feats = (0 until 8)
      .filter(_ * stride < text.length)
      .map { k =>
        val f = text.slice(k * stride, math.min(k * stride + stride, text.length))
        java.lang.Long.parseLong(md5hex(f).take(4), 16)
      }
    val got = out.filter(_.getLong(0) == docId).sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
    assert(got === feats, s"doc $docId feature mismatch")
  }
}
