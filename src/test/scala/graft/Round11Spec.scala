package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 wave: the LSH band-geometry tuning curve, the PQ
  * shortlist → exact re-rank serving stage, and TPC-H Q18's
  * aggregate-as-filter join.
  */
class Round11Spec extends AnyFunSuite {
  import TestSpark._

  test("dedup_lsh_tuning: nested geometries order candidate mass; 16x4 row equals the deployed pipeline") {
    GraftCache.clear()
    val rows = SparkEntry.queries("dedup_lsh_tuning")(spark, sf).collect()
    assert(rows.length === 3, s"one row per geometry, got ${rows.length}")
    val byB = rows
      .map(r =>
        (r.getAs[Long]("bands"), r.getAs[Long]("rows_per_band"), r.getAs[Long]("n_cand"),
          r.getAs[Long]("n_pairs"), r.getAs[Long]("recall_ppm")))
      .sortBy(_._1)
    assert(byB.map(t => (t._1, t._2)).sameElements(Seq((8L, 8L), (16L, 4L), (32L, 2L))))
    // band geometries nest by halving: colliding on an 8-row band
    // implies colliding on both of its 4-row halves, so (uncapped)
    // candidate sets are subsets as bands shorten — candidate mass and
    // relative recall must be non-decreasing in band count (no bucket
    // exceeds the width cap at this sf, so the subset order is exact)
    assert(byB(0)._3 <= byB(1)._3 && byB(1)._3 <= byB(2)._3, s"candidate mass not monotone: $byB")
    assert(byB(0)._5 <= byB(1)._5 && byB(1)._5 <= byB(2)._5, s"recall not monotone: $byB")
    byB.foreach { case (b, r, cand, prs, ppm) =>
      assert(prs <= cand, s"verified pairs exceed candidates at ${b}x$r")
      assert(ppm >= 0 && ppm <= 1000000, s"recall_ppm out of range at ${b}x$r: $ppm")
    }
    // the 16x4 row IS the deployed geometry: its verified-pair count
    // must equal dedup_minhash_lsh's output exactly
    GraftCache.clear()
    val deployed = SparkEntry.queries("dedup_minhash_lsh")(spark, sf).count()
    assert(byB(1)._4 === deployed, s"16x4 row ${byB(1)._4} != deployed pipeline $deployed")
    GraftCache.clear()
  }

  test("stream_stream_join_outer: nulls are exactly the watermark-proven unmatched clicks") {
    val rows = SparkEntry.queries("stream_stream_join_outer")(spark, sf).collect()
    assert(rows.nonEmpty)
    val matched = rows.filter(!_.isNullAt(1))
    val nulls = rows.filter(_.isNullAt(1))
    assert(nulls.forall(_.isNullAt(3)), "null purchase side must null gap_us too")
    // matched rows are the inner join's rows exactly
    val inner = SparkEntry.queries("stream_stream_join")(spark, sf).collect()
    assert(matched.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      inner.map(r => (r.getLong(0), r.getLong(1))).toSet)
    // recount the two click populations from the batch table: clicks
    // whose 1 h join bound fell below the final watermark emit (matched
    // or null), YOUNGER unmatched clicks are the held-in-state tail —
    // they must NOT appear
    val e = Tables(spark, sf).events
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) AS us")
    val c = e.filter(col("event_type") === "click")
    val b = e.filter(col("event_type") === "purchase")
    val wm = math.min(
      c.agg(max("us")).collect()(0).getLong(0),
      b.agg(max("us")).collect()(0).getLong(0)) - 7200000000L
    val unmatchedAll = c
      .as("c")
      .join(
        b.as("b"),
        expr("c.user_id = b.user_id AND b.us >= c.us AND b.us <= c.us + 3600000000"),
        "left_anti")
    val eligible = unmatchedAll.filter(col("us") + 3600000000L < wm).count()
    val tail = unmatchedAll.filter(col("us") + 3600000000L >= wm).count()
    assert(nulls.length.toLong === eligible, s"null rows ${nulls.length} != eligible $eligible")
    assert(tail > 0, "fixture degenerate: no clicks held in state — the gate is untested")
    val nullIds = nulls.map(_.getLong(0)).toSet
    val tailIds = unmatchedAll
      .filter(col("us") + 3600000000L >= wm)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(nullIds.intersect(tailIds).isEmpty, "a state-held click leaked a null row")
  }

  test("dedup_lsh_incremental: probe pairs are exactly the full pipeline's cross-generation pairs") {
    GraftCache.clear()
    val inc = SparkEntry.queries("dedup_lsh_incremental")(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet // (seen, new)
    GraftCache.clear()
    val full = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet // id_a < id_b
    // no bucket exceeds the width cap at this sf, so the incremental
    // probe must find EXACTLY the full pipeline's pairs that cross the
    // generation boundary — and none of the batch-internal ones
    val cross = full.filter { case (a, b) => a < 300 && b >= 300 }
    val internal = full.filter { case (a, b) => a >= 300 && b >= 300 }
    assert(inc === cross, s"probe pairs $inc != full-pipeline cross pairs $cross")
    assert(internal.nonEmpty, "fixture degenerate: no batch-internal pair to exclude")
    assert(inc.intersect(internal).isEmpty)
    GraftCache.clear()
  }

  test("pipe_dedup_cascade: kept is Pipeline.curate's keep set; exact_dup wins the ordering") {
    GraftCache.clear()
    val rows = SparkEntry.queries("pipe_dedup_cascade")(spark, sf).collect()
    assert(rows.length === 500)
    val byVerdict = rows.groupBy(_.getString(2)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(byVerdict.keySet.subsetOf(Set("kept", "exact_dup", "near_dup", "low_quality")))
    // kept == the production pipeline's keep set (same operators, so
    // the cascade is attribution, not a different pipeline)
    GraftCache.clear()
    val docs = Fan.out(Tables(spark, sf).documents).select("doc_id", "source", "lang", "text")
    val curated = pipeline.Pipeline.curate(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(byVerdict.getOrElse("kept", Set.empty) === curated)
    // ordering: every near_dup doc passed the exact stage (else it
    // would carry exact_dup), and the three drop sets are disjoint by
    // construction — their sizes sum to the pipeline's total loss
    val dropped = byVerdict.filterKeys(_ != "kept").values.map(_.size).sum
    assert(dropped === 500 - curated.size)
    GraftCache.clear()
  }

  test("text_bpe_train: merge conservation — each round removes exactly freq tokens") {
    GraftCache.clear()
    val rows = SparkEntry.queries("text_bpe_train")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).sameElements(1L to 5L))
    // merging one pair occurrence collapses two tokens into one, so
    // after round r the corpus holds exactly freq_r fewer tokens —
    // round 0's count is the corpus' total character mass
    val chars = Tables(spark, sf).documents
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .agg(sum(length(col("w"))))
      .collect()(0).getLong(0)
    rows.foldLeft(chars) { case (prev, (r, pair, freq, nt)) =>
      assert(nt === prev - freq, s"round $r: $prev - $freq != $nt — a merge leaked or double-fired")
      nt
    }
    // round 1 merges two single characters; later pairs are tokens
    // drawn from {chars + earlier merges}
    val vocab = scala.collection.mutable.Set(('a' to 'z').map(_.toString): _*)
    rows.foreach { case (r, pair, _, _) =>
      val Array(a, b) = pair.split(" ")
      assert(vocab(a) && vocab(b), s"round $r merged unknown tokens: $pair")
      vocab += (a + b)
    }
    assert(rows.head._2.length === 3, "round 1 must merge two single chars")
    GraftCache.clear()
  }

  test("text_bpe_apply: held-out docs tokenize; one doc replays by hand") {
    GraftCache.clear()
    val rows = SparkEntry.queries("text_bpe_apply")(spark, sf).collect()
    assert(rows.length === 500)
    // open vocabulary: every held-out doc with words still tokenizes,
    // and merging can only shrink token counts down to one per word
    rows.foreach { r =>
      val (nw, nt) = (r.getLong(1), r.getLong(2))
      assert(nt >= nw, s"doc ${r.getLong(0)}: fewer tokens than words ($nt < $nw)")
      assert(nw > 0 || nt == 0)
    }
    assert(rows.count(r => r.getLong(0) >= 250 && r.getLong(2) > 0) > 0,
      "no held-out doc tokenized — the train/apply split is vacuous")
    // hand replay: re-apply the learned merges with plain JVM
    // String.replace (the same L2R non-overlap contract) to one
    // held-out doc and match the operator's count
    GraftCache.clear()
    val (ms, _) = text.TextCatalog.bpeTrain(
      Fan.out(Tables(spark, sf).documents).filter(col("doc_id") < 250), 5)
    val pairs = ms.map(_.collect()(0).getString(0))
    GraftCache.clear()
    val docText = Tables(spark, sf).documents
      .filter(col("doc_id") === 400).select("text").collect()(0).getString(0)
    val handCount = docText.toLowerCase.split(" ").filter(_.matches("[a-z]+")).map { w =>
      var s = " " + w.map(_.toString).mkString("  ") + " "
      pairs.foreach { p =>
        s = s.replace(" " + p.replace(" ", "  ") + " ", " " + p.replace(" ", "") + " ")
      }
      s.trim.split("  ").length.toLong
    }.sum
    assert(handCount === rows.find(_.getLong(0) == 400).get.getLong(2),
      "hand replay diverged from the operator")
  }

  test("stream_topk_window: closed windows carry a final top-3, open windows stay silent") {
    val rows = SparkEntry.queries("stream_topk_window")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // per window: ranks are 1..min(3, users), counts non-increasing
    rows.groupBy(_._1).foreach { case (w, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1L to sorted.length.toLong), s"ranks broken in window $w")
      assert(sorted.length <= 3)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3), s"tie-break broken in window $w")
        case _ =>
      }
    }
    // the final watermark must leave at least one window unemitted —
    // otherwise the window-close gate is untested
    val e = Tables(spark, sf).events.selectExpr("unix_micros(ts) AS us", "user_id")
    val maxUs = e.agg(max("us")).collect()(0).getLong(0)
    val allWindows = e.selectExpr("(us div 3600000000) * 3600000000 AS ws")
      .distinct().collect().map(_.getLong(0)).toSet
    val emitted = rows.map(_._1 * 1000000L).toSet
    assert(emitted.subsetOf(allWindows))
    val tail = allWindows.filter(_ + 3600000000L > maxUs - 7200000000L)
    assert(tail.nonEmpty && tail.forall(w => !emitted.contains(w)),
      "a watermark-open window emitted (or the fixture has no tail)")
    // recount one emitted window's top-3 from the batch table
    val w0 = rows.map(_._1).min * 1000000L
    val expect = e.filter(expr(s"(us div 3600000000) * 3600000000 = $w0"))
      .groupBy("user_id").count()
      .orderBy(col("count").desc, col("user_id")).limit(3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = rows.filter(_._1 === w0 / 1000000L).sortBy(_._2).map(r => (r._3, r._4))
    assert(got.sameElements(expect), s"window $w0 recount: got ${got.toSeq}, expected ${expect.toSeq}")
  }

  test("wd_best_rank: preferred suppresses the injected normal; normals without competition survive") {
    val rows = SparkEntry.queries("wd_best_rank")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    val p7 = rows.filter(_._2 == 1000000007L)
    // every served P7 statement is the preferred one; the injected
    // normal competitor (dst 300+n) must be fully suppressed
    assert(p7.nonEmpty && p7.forall(_._4 == "preferred"), s"non-preferred P7 leaked: ${p7.take(3).toSeq}")
    assert(p7.forall(r => r._3 >= 200 && r._3 < 300), "injected normal P7 dst leaked past best-rank")
    // P31 has no preferred statement, so its normals are best
    val p31 = rows.filter(_._2 == 1000000031L)
    assert(p31.nonEmpty && p31.forall(_._4 == "normal"))
    // deprecated never appears at all (dropped before ranking)
    assert(rows.forall(_._4 != "deprecated"))
  }

  test("pipe_drift_monitor: ppm profiles sum to ~1e6 and l1 recounts") {
    val rows = SparkEntry.queries("pipe_drift_monitor")(spark, sf).collect()
    assert(rows.length === 10)
    val refPpm = rows.map(_.getAs[Long]("ref_ppm")).sum
    val newPpm = rows.map(_.getAs[Long]("new_ppm")).sum
    // integer-div shares undercount by at most 1 ppm per bucket
    assert(refPpm > 1000000L - 10 && refPpm <= 1000000L, s"ref profile sums to $refPpm")
    assert(newPpm > 1000000L - 10 && newPpm <= 1000000L, s"new profile sums to $newPpm")
    val l1 = rows.map(r => math.abs(r.getAs[Long]("ref_ppm") - r.getAs[Long]("new_ppm"))).sum
    assert(rows.forall(_.getAs[Long]("l1_ppm") === l1), "l1_ppm column diverges from the recount")
    assert(rows.map(_.getAs[Long]("n_ref")).sum === 250L)
    assert(rows.map(_.getAs[Long]("n_new")).sum === 250L)
  }

  test("ann_index_append: appended vectors are searchable from the frozen-centroid index") {
    val rows = SparkEntry.queries("ann_index_append")(spark, sf).collect()
    assert(rows.length === 50, "full top-5 lists for all 10 queries")
    // the day-2 batch (vec_id >= 400) must actually surface in served
    // results — an append that silently drops the batch would still
    // return 50 rows
    assert(rows.exists(_.getAs[Long]("vec_id") >= 400L),
      "no appended vector reachable — the batch never joined the index")
  }

  test("plan shapes: best-rank is window-free, cascade broadcasts the near-dup list, bpe joins stay broadcast") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, SortMergeJoinExec}
    GraftCache.clear()
    // best-rank: per-key max + join back — never a data-sized window
    val br = SparkEntry.queries("wd_best_rank")(spark, sf)
    br.collect()
    assert(PlanCheck.countNodes[WindowExec](br) === 0,
      s"best-rank picked a window plan:\n${PlanCheck.render(br)}")
    // cascade: the near-dup drop list rides a broadcast join
    val cas = SparkEntry.queries("pipe_dedup_cascade")(spark, sf)
    cas.collect()
    assert(PlanCheck.countNodes[BroadcastHashJoinExec](cas) >= 1,
      s"cascade near-dup list not broadcast:\n${PlanCheck.render(cas)}")
    GraftCache.clear()
    // bpe_apply: the learned merges ride 1-row broadcasts; no
    // sort-merge join may appear anywhere in the chain
    val ap = SparkEntry.queries("text_bpe_apply")(spark, sf)
    ap.collect()
    assert(PlanCheck.countNodes[SortMergeJoinExec](ap) === 0,
      s"a merge join crept into bpe apply:\n${PlanCheck.render(ap)}")
    assert(PlanCheck.countNodes[BroadcastNestedLoopJoinExec](ap) >= 1,
      "merge-table broadcasts missing")
    GraftCache.clear()
  }

  test("mm_blur_metric: lap counts are structural; one doc recounts from its text bytes") {
    val rows = SparkEntry.queries("mm_blur_metric")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.length === 500)
    // n_lap is pure geometry: (w-2)*h interior columns, 0 when w < 3
    rows.foreach { case (id, nLap, _) =>
      val w = (id % 16 + 1).toInt; val h = (id % 12 + 1).toInt
      val expect = if (w < 3) 0L else (w - 2).toLong * h
      assert(nLap === expect, s"doc $id: n_lap $nLap != ($w-2)*$h")
    }
    // a flat (constant-byte) image must measure exactly 0 — the blur
    // screen's defining property — checked via the pure-JVM parser on
    // a synthetic constant blob
    val flat = multimodal.RealCodecs.blurStats(
      multimodal.StubDecoder.Blob(5L, multimodal.RealCodecs.bmpBytes(5L, "aaaaaaaaaaaa")))
    assert(flat.lap_sq_sum === 0L && flat.n_lap > 0)
    // hand recount one real doc straight from its text (the oracle's
    // arithmetic, independently re-derived)
    val id = 7L
    val text = Tables(spark, sf).documents.filter(col("doc_id") === id)
      .select("text").collect()(0).getString(0)
    val w = (id % 16 + 1).toInt; val h = (id % 12 + 1).toInt
    def px(p: Int) = text.charAt(p % text.length).toInt
    var sum = 0L
    for (r <- 0 until h; c <- 1 until w - 1) {
      val g = (cc: Int) => px(r * w * 3 + cc * 3 + 1)
      val lap = 2 * g(c) - g(c - 1) - g(c + 1)
      sum += lap.toLong * lap
    }
    assert(rows.find(_._1 == id).get._3 === sum, s"doc $id lap_sq_sum recount mismatch")
  }

  test("src_parquet_bloom: the bloom is physically in the footer and the filter reaches the scan") {
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val df = SparkEntry.queries("src_parquet_bloom")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("o_custkey") == 37L))
    // the equality predicate must be pushed into the parquet scan —
    // bloom probing happens below that pushdown
    val scans = PlanCheck.collectNodes[org.apache.spark.sql.execution.FileSourceScanExec](df)
    assert(scans.exists(_.metadata.getOrElse("PushedFilters", "").contains("EqualTo(o_custkey,37)")),
      s"o_custkey pushdown missing:\n${PlanCheck.render(df)}")
    def bloomOffsets(dir: java.io.File): Seq[Long] = {
      val part = dir.listFiles().filter(_.getName.endsWith(".parquet")).minBy(_.getName)
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new HPath(part.getAbsolutePath), spark.sessionState.newHadoopConf()))
      try {
        val cols = r.getFooter.getBlocks.get(0).getColumns
        (0 until cols.size()).map(i => cols.get(i))
          .filter(_.getPath.toDotString == "o_custkey")
          .map(_.getBloomFilterOffset)
      } finally r.close()
    }
    // the query's write carries the bloom...
    val withBloom = bloomOffsets(graft.Stage.dir("graft_pqbloom_", sf))
    assert(withBloom.nonEmpty && withBloom.forall(_ >= 0L),
      s"no bloom filter in footer: offsets $withBloom")
    // ...and a control write WITHOUT the option does not — proving the
    // option chain genuinely reaches parquet-mr (not vacuous)
    val ctrl = graft.Stage.dir("graft_pqbloom_ctrl_", sf)
    Tables(spark, sf).orders.write.mode("overwrite").parquet(ctrl.getPath)
    val without = bloomOffsets(ctrl)
    assert(without.nonEmpty && without.forall(_ < 0L),
      s"control write unexpectedly carries a bloom: $without")
  }

  test("ann_ivf_filtered: the predicate binds before scoring and labels recount") {
    val rows = SparkEntry.queries("ann_ivf_filtered")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= 50)
    // the filter must genuinely bind: the unfiltered IVF result serves
    // cross-label neighbors this query may not — the two results
    // cannot be identical if the predicate restricted anything
    GraftCache.clear()
    val unfiltered = SparkEntry.queries("ann_ivf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(rows.toSet != unfiltered, "filter never bound — fixture vacuous")
    // every returned neighbor carries the query's label
    val labels = Tables(spark, sf).embeddings.select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    rows.foreach { case (q, v) =>
      assert(labels(q) === labels(v), s"query $q (label ${labels(q)}) got cross-label neighbor $v")
    }
  }

  test("text_langid_eval: within-truth shares sum to ~1e6 and a cell recounts") {
    val rows = SparkEntry.queries("text_langid_eval")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum === 500L)
    rows.groupBy(_.getString(0)).foreach { case (lang, g) =>
      val s = g.map(_.getAs[Long]("row_ppm")).sum
      assert(s > 1000000L - g.length && s <= 1000000L, s"$lang shares sum to $s")
    }
    // recount one cell against the prediction query joined to truth
    val preds = SparkEntry.queries("text_langid")(spark, sf)
      .select("doc_id", "pred_lang")
    val direct = Tables(spark, sf).documents.select("doc_id", "lang")
      .join(preds, "doc_id")
      .groupBy("lang", "pred_lang").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(direct((r.getString(0), r.getString(1))) === r.getAs[Long]("n"))
    }
  }

  test("rel_asof_nearest: brute-force recount per click; all directions exercised") {
    val rows = SparkEntry.queries("rel_asof_nearest")(spark, sf).collect()
    assert(rows.nonEmpty)
    val dirs = rows.map(r => if (r.isNullAt(5)) "none" else r.getString(5)).toSet
    assert(dirs.contains("back") && dirs.contains("fwd"),
      s"fixture must exercise both directions, got $dirs")
    // brute-force recount: for each click, scan ALL same-user
    // purchases and pick min |gap| <= tol, backward winning ties —
    // must match the windowed decomposition exactly
    val e = Tables(spark, sf).events
      .selectExpr("event_id", "user_id", "unix_micros(ts) AS us", "event_type")
      .filter(col("event_type").isin("click", "purchase")).collect()
    val purchases = e.filter(_.getString(3) == "purchase")
      .groupBy(_.getLong(1)).view.mapValues(_.map(r => (r.getLong(2), r.getLong(0)))).toMap
    val tol = 1800000000L
    rows.foreach { r =>
      val (id, user, ts) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val cands = purchases.getOrElse(user, Array.empty[(Long, Long)])
        .filter { case (p, _) => math.abs(p - ts) <= tol }
      if (cands.isEmpty) assert(r.isNullAt(3), s"click $id: expected null, got ${r.get(3)}")
      else {
        // min gap; ties -> backward (p <= ts) wins
        val best = cands.minBy { case (p, _) => (math.abs(p - ts), if (p <= ts) 0 else 1) }
        val expGap = math.abs(best._1 - ts)
        assert(!r.isNullAt(3) && r.getLong(4) === expGap,
          s"click $id: gap ${if (r.isNullAt(4)) "null" else r.getLong(4)} != $expGap")
      }
    }
  }

  test("rel_histogram_equidepth: buckets hold ~n/8 rows each and partition the domain") {
    val rows = SparkEntry.queries("rel_histogram_equidepth")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(rows.map(_._1).sameElements(0L to 7L), "all 8 buckets must be populated")
    val total = rows.map(_._2).sum
    // equi-depth: every bucket within ~2x of the ideal n/8 (exact
    // equality is impossible with duplicate boundary values)
    val ideal = total / 8.0
    rows.foreach { case (b, n, _, _) =>
      assert(n > ideal / 2 && n < ideal * 2, s"bucket $b holds $n of ~$ideal — not equi-depth")
    }
    // buckets tile the value axis in order without overlap
    rows.sliding(2).foreach {
      case Array((_, _, _, hi1), (_, _, lo2, _)) =>
        assert(hi1 <= lo2, s"bucket ranges overlap: $hi1 > $lo2")
      case _ =>
    }
  }

  test("text_chunk_sliding: coverage with 16-token overlap; every doc chunked") {
    val rows = SparkEntry.queries("text_chunk_sliding")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.size === 500, "every document must emit at least one chunk")
    val nw = Tables(spark, sf).documents
      .selectExpr("doc_id", "size(split(text, ' ')) AS nw")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    byDoc.foreach { case (id, chunks) =>
      val n = nw(id)
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(0L until sorted.length.toLong))
      // stride-48 windows of width <=64 tile the doc: chunk i starts at
      // token i*48, all full chunks carry 64 tokens, the tail carries
      // the remainder, and the union covers every token exactly
      sorted.dropRight(1).foreach { case (_, i, nt) =>
        assert(nt === 64L, s"doc $id chunk $i short before the tail")
      }
      val (_, lastI, lastN) = sorted.last
      assert(lastI * 48 + lastN === n.toLong, s"doc $id: tail ends at ${lastI * 48 + lastN} != $n")
      // consecutive chunks overlap by 16 tokens (64 - 48)
      if (sorted.length > 1) assert(sorted.head._3 - 48 === 16L)
    }
  }

  test("rel_tpch_q18: rows recount, the threshold binds, ordering holds") {
    val rows = SparkEntry.queries("rel_tpch_q18")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_.getAs[Double]("sum_qty") > 250.0), "HAVING threshold violated")
    // recount the first row's quantity sum straight off lineitem
    val ok = rows.head.getAs[Long]("o_orderkey")
    val direct = Tables(spark, sf).lineitem
      .filter(col("l_orderkey") === ok)
      .agg(sum(col("l_quantity").cast("decimal(38,4)")).cast("double"))
      .collect()(0)
      .getDouble(0)
    assert(direct === rows.head.getAs[Double]("sum_qty"), s"recount mismatch for order $ok")
    // presentation order: totalprice non-increasing, orderkey breaks ties
    val tp = rows.map(r => (r.getAs[Double]("o_totalprice"), r.getAs[Long]("o_orderkey")))
    tp.sliding(2).foreach {
      case Array((a, ka), (b, kb)) =>
        assert(a > b || (a == b && ka < kb), s"ordering broken at ($a,$ka) -> ($b,$kb)")
      case _ =>
    }
    // the aggregate runs BEFORE the dim joins: the plan's first join
    // input is the aggregated big-orders frame, not raw lineitem — the
    // qualifying-order count bounds the join width
    val qualifying = Tables(spark, sf).lineitem
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(38,4)")).as("q"))
      .filter(col("q") > 250)
      .count()
    assert(rows.length === math.min(qualifying, 100L).toInt)
  }
}
