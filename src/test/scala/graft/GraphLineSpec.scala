package graft

import org.scalatest.funsuite.AnyFunSuite

/** Value/plan properties of the round-5 graph and corpus-transform
  * operators that the DuckDB oracle cannot express: PageRank mass
  * conservation, triangle-join plan shape (no nested loop), the
  * single-shuffle gaps-and-islands plan, and line-dedup reassembly
  * fixtures.
  */
class GraphLineSpec extends AnyFunSuite {
  import TestSpark._

  test("text_dedup_lines drops every line of a verbatim copy and reassembles the rest") {
    val rows = SparkEntry
      .queries("text_dedup_lines")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    val (n1, d1, t1) = rows(700001L)
    assert(n1 === d1, "verbatim copy must lose every line")
    assert(t1 === "", "verbatim copy must reassemble to the empty document")
    val (n0, d0, t0) = rows(700000L)
    assert(d0 >= 1, "partial copy must lose at least its first shared line")
    assert(d0 < n0 && t0.endsWith("deka"), "unique filler lines must survive")
    // the shared lines are dropped from the ORIGINAL doc too (corpus-wide
    // dedup, not pairwise)
    assert(rows(1L)._2 >= 1, "doc 1 must also lose the lines doc 700000 copied")
    // untouched docs keep everything
    assert(rows.count { case (id, (n, d, _)) => id < 700000 && d == 0 && n > 0 } > 0)
  }

  test("text_domain_balance: smallest source keeps all, rates are exact ppm") {
    val rows = SparkEntry
      .queries("text_domain_balance")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, kept, ppm) => kept >= 0 && ppm >= 1 && ppm <= 1000000 })
    assert(rows.exists(_._3 == 1000000L), "the smallest quality-passing source keeps everything")
  }

  test("wd_pagerank conserves bounded mass and floors at the teleport term") {
    val rows = SparkEntry
      .queries("wd_pagerank")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val n = rows.length.toLong
    val teleportFloor = (15L * (1000000000000L / n)) / 100L
    assert(rows.forall(_._2 >= teleportFloor), "every vertex gets at least the teleport mass")
    // total mass never exceeds the unit budget (dangling + floor loss only shrink it)
    assert(rows.map(_._2).sum <= 1000000000000L)
    assert(rows.map(_._2).max > teleportFloor, "linked vertices must accumulate rank")
  }

  test("rel_triangle_count closes wedges with equi-joins only and matches the naive count") {
    val df = SparkEntry.queries("rel_triangle_count")(spark, sf)
    // the only permissible nested-loop join is the deliberate 1-row x
    // 1-row scalar stitch attaching n_edges to n_triangles
    df.collect()
    assert(
      !PlanCheck.has[org.apache.spark.sql.execution.joins.CartesianProductExec](df),
      PlanCheck.render(df))
    assert(
      PlanCheck.countNodes[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec](df) <= 1,
      PlanCheck.render(df))
    val Array(nTri, nEdges) = df.collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    // independent recomputation: orientation-free u<v<w three-way join
    val li = Tables(spark, sf).lineitem.select(
      org.apache.spark.sql.functions.col("l_orderkey").as("ok"),
      org.apache.spark.sql.functions.col("l_partkey").as("pk"))
    li.createOrReplaceTempView("li_tri")
    val expected = spark
      .sql("""WITH e AS (SELECT u, v FROM (
             |            SELECT a.pk AS u, b.pk AS v, COUNT(*) AS w
             |            FROM li_tri a JOIN li_tri b ON a.ok = b.ok AND a.pk < b.pk
             |            GROUP BY 1, 2) WHERE w >= 2)
             |SELECT (SELECT COUNT(*) FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
             |        JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v) AS t,
             |       (SELECT COUNT(*) FROM e) AS m""".stripMargin)
      .collect()
      .head
    assert(nTri === expected.getLong(0) && nEdges === expected.getLong(1))
    GraftCache.clear()
  }

  test("ann_filtered only ever returns neighbors matching the query's label") {
    val labels = Tables(spark, sf).embeddings
      .select("vec_id", "label")
      .collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .toMap
    val rows = SparkEntry
      .queries("ann_filtered")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, v) =>
      assert(labels(v) === labels(q), s"neighbor $v of query $q escaped the label filter")
    }
    GraftCache.clear()
  }

  test("wd_coord_zorder: codes match a reference bit-interleave and sort the output") {
    def spread(x0: Long): Long = {
      val x1 = (x0 | (x0 << 8)) & 0x00FF00FFL
      val x2 = (x1 | (x1 << 4)) & 0x0F0F0F0FL
      val x3 = (x2 | (x2 << 2)) & 0x33333333L
      (x3 | (x3 << 1)) & 0x55555555L
    }
    val rows = SparkEntry
      .queries("wd_coord_zorder")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (m, lat, lon) =>
      val expect = spread((lat * 2 + 180).toLong) | (spread((lon * 2 + 360).toLong) << 1)
      assert(m === expect, s"morton code off for ($lat, $lon)")
    }
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq, "output must be curve-ordered")
    GraftCache.clear()
  }

  test("rel_funnel stages are monotone (ordered funnel, not independent filters)") {
    val r = SparkEntry.queries("rel_funnel")(spark, sf).collect().head
    val (nv, nc, np) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nv >= nc && nc >= np, s"funnel must narrow: $nv >= $nc >= $np")
    assert(np > 0, "synthetic events are dense enough that some users fully convert")
    GraftCache.clear()
  }

  test("dedup_cdc_chunks: boundaries resync after an insertion") {
    val rows = SparkEntry
      .queries("dedup_cdc_chunks")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val (n3, d3) = rows(3L)
    val (n8, d8) = rows(800000L)
    // the shifted copy shares every chunk after the first resync point
    assert(d8 >= n8 - 1, s"shifted copy must dedup all but its head chunk ($d8 of $n8)")
    assert(d3 >= n3 - 1, s"original must dedup symmetrically ($d3 of $n3)")
    GraftCache.clear()
  }

  test("dedup_containment flags excerpts and supersets in the right DIRECTION") {
    val rows = SparkEntry
      .queries("dedup_containment")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4))
      .toMap
    // the excerpt (900000 = prefix of doc 5) is fully contained in doc 5
    assert(rows.get((900000L, 5L)).contains(1.0), s"excerpt direction missing: ${rows.keys.toSeq.sorted}")
    // doc 6 is fully contained in its padded superset 900001
    assert(rows.get((6L, 900001L)).contains(1.0), "superset direction missing")
    GraftCache.clear()
  }

  test("pipe_incremental_refresh triages every batch doc into exactly one category") {
    val df = SparkEntry.queries("pipe_incremental_refresh")(spark, sf)
    val r = df.collect().head
    val Seq(batch, exact, quality, update, fresh) = (0 to 4).map(r.getLong)
    assert(batch === exact + quality + update + fresh, "categories must partition the batch")
    assert(exact > 0 && update > 0 && fresh > 0, s"fixture must populate the triage: $r")
    assert(
      !PlanCheck.has[org.apache.spark.sql.execution.joins.CartesianProductExec](df),
      PlanCheck.render(df))
    GraftCache.clear()
  }

  test("ann_filtered pre-filters: the label predicate is a hash-join key, no nested loop") {
    import org.apache.spark.sql.execution.joins._
    val df = SparkEntry.queries("ann_filtered")(spark, sf)
    df.collect()
    assert(!PlanCheck.has[CartesianProductExec](df), PlanCheck.render(df))
    assert(!PlanCheck.has[BroadcastNestedLoopJoinExec](df), PlanCheck.render(df))
    // the broadcast hash join must key on the label equality (pre-filter),
    // not post-filter scored rows
    val joinKeyNames = PlanCheck
      .collectNodes[BroadcastHashJoinExec](df)
      .map(j =>
        (j.leftKeys ++ j.rightKeys)
          .flatMap(_.collect { case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.name })
          .toSet)
    assert(
      joinKeyNames.exists(ks => ks.contains("label") && ks.contains("q_label")),
      s"label equality must be a join key, keys were $joinKeyNames:\n${PlanCheck.render(df)}")
    GraftCache.clear()
  }

  test("rel_gaps_islands runs on a single customer-keyed shuffle") {
    val df = SparkEntry.queries("rel_gaps_islands")(spark, sf)
    df.collect()
    // Upper bound, not exact-count (ADVICE r5): exchange REUSE can
    // legitimately drop the count to 0 on a future Spark. PlanCheck
    // counts distinct hash exchanges in the post-AQE plan (reused
    // exchanges excluded by construction); the rangepartitioning
    // exchange of the presentation ORDER BY is not a hash exchange.
    assert(
      PlanCheck.hashExchanges(df).size <= 1,
      s"dedup + 2 windows + 2 rollups must all reuse the custkey partitioning:\n${PlanCheck.render(df)}")
  }

  test("large-star/small-star beats min-label propagation on a path graph") {
    import org.apache.spark.sql.functions._
    import graft.wikidata.WikidataCatalog
    // a 32-vertex path is the adversarial case for min-label (label 0
    // crawls one hop per round, so rounds ~ diameter); LSS contracts
    // the graph itself and should land in O(log n) rounds
    val n = 32
    val edges = spark.range(n - 1L).select(col("id").as("a"), (col("id") + 1L).as("b"))
    val sym = edges.unionByName(edges.select(col("b").as("a"), col("a").as("b")))
    val adj = sym
      .unionByName(spark.range(n.toLong).select(col("id").as("a"), col("id").as("b")))
      .persist()
    val dsum = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(sum(col("comp"))).head().getLong(0)
    val (mlLabels, mlRounds) = WikidataCatalog.fixpointCounted(
      init = adj.groupBy("a").agg(min("b").as("comp")).select(col("a").as("id"), col("comp")),
      step = prev =>
        adj
          .join(prev.select(col("id").as("b"), col("comp").as("nc")), "b")
          .groupBy("a")
          .agg(min("nc").as("comp"))
          .select(col("a").as("id"), col("comp")),
      probe = dsum,
      maxRounds = 128,
      what = "min-label path")
    val (stars, lssRounds) = WikidataCatalog.fixpointCounted(
      init = edges,
      step = prev => WikidataCatalog.smallStar(WikidataCatalog.largeStar(prev)),
      probe = WikidataCatalog.lssProbe,
      maxRounds = 64,
      what = "large-star/small-star path")
    assert(mlLabels.collect().forall(_.getLong(1) == 0L), "min-label must find component 0")
    val parents = stars.collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(
      (1 until n).forall(v => parents(v.toLong) == 0L),
      s"the LSS fixpoint must be a star centered at 0: $parents")
    assert(
      lssRounds < mlRounds,
      s"LSS took $lssRounds rounds vs min-label's $mlRounds on a $n-path")
    adj.unpersist()
    GraftCache.clear()
  }
}
