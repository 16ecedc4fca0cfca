package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-8 hardening, per the r7 verdict/advice:
  *   1. compressed-dump ingestion (wd_parse_gz / wd_parse_bz2) — the
  *      reference's primary input shape — proven end-to-end against the
  *      uncompressed shred, with the staged files actually compressed
  *      and the staging dir reclaimed at the harness boundary;
  *   2. bench pass-interleaving is deterministic and genuinely spreads
  *      a query's samples across distinct pass orders;
  *   3. the fixpoint loop frees round frames on failure paths (round
  *      cap, step/probe throw), not just on convergence;
  *   4. the real-codec builders fail loudly on input outside the
  *      builder/oracle equivalence domain (empty / non-ASCII text).
  */
class Round8Spec extends AnyFunSuite {
  import TestSpark._

  private def tmpDirsWithPrefix(prefix: String): Seq[java.io.File] = {
    val tmpRoot = new java.io.File(System.getProperty("java.io.tmpdir"))
    Option(tmpRoot.listFiles()).toSeq.flatten.filter(_.getName.startsWith(prefix))
  }

  test("wd_parse_gz: gzip round-trip equals the uncompressed shred; staging dir reclaimed on clear") {
    GraftCache.clear()
    val before = tmpDirsWithPrefix("graft_gz_dump").map(_.getName).toSet
    val viaGz = SparkEntry.queries("wd_parse_gz")(spark, sf).collect().toSeq
    val direct = SparkEntry.queries("wd_quantity")(spark, sf).collect().toSeq
    assert(viaGz.nonEmpty)
    assert(viaGz === direct)
    // the staged parts really are gzip files — the codec path ran, not
    // a plain-text fallback
    val staged = tmpDirsWithPrefix("graft_gz_dump").filterNot(d => before(d.getName))
    assert(staged.size === 1, s"expected one staged dump dir, got $staged")
    val parts = Option(staged.head.listFiles()).toSeq.flatten.map(_.getName)
    assert(parts.exists(_.endsWith(".gz")), s"no .gz parts in $parts")
    assert(!parts.exists(n => n.startsWith("part-") && !n.endsWith(".gz")), parts.toString)
    GraftCache.clear()
    assert(tmpDirsWithPrefix("graft_gz_dump").forall(d => before(d.getName)),
      "staging dir must be reclaimed at the harness boundary")
  }

  test("wd_parse_bz2: bzip2 (splittable) round-trip equals the uncompressed edge shred") {
    GraftCache.clear()
    val before = tmpDirsWithPrefix("graft_bz2_dump").map(_.getName).toSet
    val viaBz2 = SparkEntry.queries("wd_parse_bz2")(spark, sf).collect().toSeq
    val direct = SparkEntry.queries("wd_edge")(spark, sf).collect().toSeq
    assert(viaBz2.nonEmpty)
    assert(viaBz2 === direct)
    val staged = tmpDirsWithPrefix("graft_bz2_dump").filterNot(d => before(d.getName))
    assert(staged.size === 1)
    val parts = Option(staged.head.listFiles()).toSeq.flatten.map(_.getName)
    assert(parts.exists(_.endsWith(".bz2")), s"no .bz2 parts in $parts")
    GraftCache.clear()
    assert(tmpDirsWithPrefix("graft_bz2_dump").forall(d => before(d.getName)))
  }

  test("Bench.orders: deterministic, pass 0 in catalog order, later passes distinct permutations") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val a = Bench.orders(names, 3)
    val b = Bench.orders(names, 3)
    assert(a === b, "pass orders must be deterministic run-to-run")
    assert(a.size === 3)
    assert(a.head === names, "pass 0 is the stable catalog order")
    a.foreach(p => assert(p.sorted === names, "each pass covers every query exactly once"))
    assert(a.distinct.size === 3, "passes must differ so one contended window cannot poison all samples")
    // a query's position genuinely moves between passes (the point of
    // interleaving): most queries should not sit at the same index twice
    val samePos01 = names.count(n => a(0).indexOf(n) == a(1).indexOf(n))
    assert(samePos01 < names.size / 4, s"$samePos01 of ${names.size} queries kept their slot")
  }

  test("fixpointCounted frees round frames when the round cap is hit") {
    val sc = spark.sparkContext
    GraftCache.clear()
    val baseline = sc.getPersistentRDDs.size
    val init = spark.range(8).toDF("v")
    val e = intercept[IllegalArgumentException] {
      // step strictly grows the frame => probe (count) never repeats =>
      // cap must fire
      wikidata.WikidataCatalog.fixpointCounted(
        init,
        df => df.union(df.limit(1).withColumn("v", col("v") + lit(1000L))),
        df => df.count(),
        maxRounds = 3,
        what = "round8-divergent")
    }
    assert(e.getMessage.contains("did not converge"))
    assert(sc.getPersistentRDDs.size === baseline,
      s"round frames leaked: ${sc.getPersistentRDDs.size} vs baseline $baseline")
  }

  test("fixpointCounted frees round frames when step throws mid-loop") {
    val sc = spark.sparkContext
    GraftCache.clear()
    val baseline = sc.getPersistentRDDs.size
    val init = spark.range(8).toDF("v")
    var calls = 0
    intercept[RuntimeException] {
      wikidata.WikidataCatalog.fixpointCounted(
        init,
        df => {
          calls += 1
          if (calls >= 2) throw new RuntimeException("boom")
          df.union(df.limit(1).withColumn("v", col("v") + lit(1000L)))
        },
        df => df.count(),
        maxRounds = 10,
        what = "round8-throwing")
    }
    assert(calls === 2)
    assert(sc.getPersistentRDDs.size === baseline,
      s"round frames leaked after step threw")
  }

  test("set-similarity operators: corpus-derived join sides are shuffle-planned, never broadcast") {
    // the 100x stress run showed Spark's size estimator picking a
    // BROADCAST for a corpus-derived verification side (driver OOM at
    // scale); the operators now hint every such side explicitly — this
    // pins the executed (post-AQE) plan so an estimator or hint
    // regression fails here instead of at 100x
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
    for (name <- Seq("dedup_ngram_jaccard", "dedup_containment")) {
      GraftCache.clear()
      val df = SparkEntry.queries(name)(spark, sf)
      df.write.format("noop").mode("overwrite").save()
      val bhj = PlanCheck.countNodes[BroadcastHashJoinExec](df)
      val bnlj = PlanCheck.countNodes[BroadcastNestedLoopJoinExec](df)
      assert(
        bhj == 0 && bnlj == 0,
        s"$name planned broadcast joins (bhj=$bhj bnlj=$bnlj):\n${PlanCheck.render(df)}")
      GraftCache.clear()
    }
  }

  test("stream_state_tws (transformWithState) equals the GroupState twin") {
    GraftCache.clear()
    val tws = SparkEntry.queries("stream_state_tws")(spark, sf).collect().map(_.toString).sorted
    val gs = SparkEntry.queries("stream_state_running")(spark, sf).collect().map(_.toString).sorted
    assert(tws.nonEmpty)
    assert(tws === gs, "the two state APIs must produce identical final state")
    GraftCache.clear()
  }

  test("RealCodecs builders reject text outside the builder/oracle equivalence domain") {
    import multimodal.RealCodecs
    for (bad <- Seq("", "café", "ÿ")) {
      val eb = intercept[IllegalArgumentException](RealCodecs.bmpBytes(1L, bad))
      assert(eb.getMessage.contains("ASCII"))
      val ew = intercept[IllegalArgumentException](RealCodecs.wavBytes(1L, bad))
      assert(ew.getMessage.contains("ASCII"))
    }
    // the happy path is untouched
    assert(RealCodecs.bmpBytes(1L, "ok").nonEmpty)
    assert(RealCodecs.wavBytes(1L, "ok").nonEmpty)
  }
}
