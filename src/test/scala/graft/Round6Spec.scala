package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value/plan properties of the round-6 operators beyond what the
  * DuckDB oracle hash asserts: SCD2 interval algebra, the two-phase
  * skyline vs the naive dominance anti-join, and keyword-search scoring
  * vs a direct per-document recount.
  */
class Round6Spec extends AnyFunSuite {
  import TestSpark._

  test("rel_merge_scd2 intervals are dense, contiguous, and change-only") {
    val rows = SparkEntry
      .queries("rel_merge_scd2")(spark, sf)
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cust, vs) =>
      val sorted = vs.sortBy(_._2)
      // versions dense from 1
      assert(sorted.map(_._2).toSeq === (1L to sorted.length).toSeq, s"cust $cust versions")
      sorted.sliding(2).foreach {
        case Array((_, _, p1, _, to1), (_, _, p2, from2, _)) =>
          // contiguous: this version closes exactly where the next opens
          assert(to1.contains(from2), s"cust $cust gap: $to1 vs $from2")
          // change-only: consecutive versions differ in the tracked attribute
          assert(p1 !== p2, s"cust $cust redundant version with priority $p1")
        case _ => ()
      }
      // exactly one open (current) version, and it is the last
      assert(sorted.count(_._5.isEmpty) === 1)
      assert(sorted.last._5.isEmpty)
    }
  }

  test("rel_skyline two-phase plan equals the naive dominance anti-join") {
    val fast = SparkEntry
      .queries("rel_skyline")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
      .toSet
    val pts = Tables(spark, sf).part
      .select(col("p_size").as("x"), col("p_retailprice").as("y"))
      .distinct()
      .collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    val naive = pts.filter { case (x, y) =>
      !pts.exists { case (x2, y2) => x2 <= x && y2 <= y && (x2 < x || y2 < y) }
    }.toSet
    assert(fast === naive)
    // no point dominates another within the result
    for ((x, y) <- fast; (x2, y2) <- fast if (x, y) != (x2, y2))
      assert(!(x2 <= x && y2 <= y), s"($x2,$y2) dominates ($x,$y) inside the skyline")
  }

  test("rel_skyline plan broadcasts the bucket-minima side (no cartesian)") {
    val df = SparkEntry.queries("rel_skyline")(spark, sf)
    df.collect()
    import org.apache.spark.sql.execution.joins._
    assert(!PlanCheck.has[CartesianProductExec](df), PlanCheck.render(df))
    assert(!PlanCheck.has[BroadcastNestedLoopJoinExec](df), PlanCheck.render(df))
    assert(PlanCheck.has[BroadcastHashJoinExec](df), PlanCheck.render(df))
  }

  test("rel_merge_scd2 runs all three windows on a single custkey shuffle") {
    val df = SparkEntry.queries("rel_merge_scd2")(spark, sf)
    df.collect()
    assert(
      PlanCheck.hashExchanges(df).size <= 1,
      s"change-detect lag + version row_number + valid_to lead must share one shuffle:\n${PlanCheck.render(df)}")
  }

  test("rel_join_temporal agrees with interval containment against rel_merge_scd2") {
    val dim = SparkEntry
      .queries("rel_merge_scd2")(spark, sf)
      .collect()
      .map(r =>
        (r.getLong(0), r.getString(2), r.getLong(3),
          if (r.isNullAt(4)) Long.MaxValue else r.getLong(4)))
    val byCust = dim.groupBy(_._1)
    val probes = SparkEntry.queries("rel_join_temporal")(spark, sf).collect()
    assert(probes.nonEmpty)
    for (r <- probes.take(2000)) {
      val (cust, t, got) = (r.getLong(1), r.getLong(2), r.getString(3))
      val want = byCust(cust).filter { case (_, _, from, to) => from <= t && t < to }
      assert(want.length === 1, s"cust $cust t $t matched ${want.length} intervals")
      assert(want.head._2 === got, s"cust $cust t $t")
    }
  }

  test("src_jdbc reads back through a genuinely partitioned JDBC scan") {
    val df = SparkEntry.queries("src_jdbc")(spark, sf)
    val src = Tables(spark, sf).nation
      .select("n_nationkey", "n_name", "n_regionkey")
      .collect()
      .map(_.toSeq)
      .sortBy(_.head.asInstanceOf[Int])
    val rt = df.collect().map(_.toSeq)
    assert(rt.toSeq === src.toSeq, "JDBC round trip must be lossless")
    // the scan itself (pre-sort) must carry the 4 requested splits
    val scan = df.queryExecution.analyzed.collectLeaves().head
    val scanDf = org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, scan)
    assert(scanDf.rdd.getNumPartitions === 4, "partitionColumn options must split the read")
  }

  test("wd_connected_components labels are component minima and no edge crosses") {
    import graft.wikidata.{SyntheticDump, WikidataShredder}
    val comp = SparkEntry
      .queries("wd_connected_components")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // every component's label IS its minimum member
    comp.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min === c, s"component $c labeled above its minimum")
    }
    // no edge connects two different components (the fixpoint property)
    val edges = WikidataShredder
      .edge(WikidataShredder.claims(SyntheticDump.entities(spark, sf)))
      .select("src_id", "dst_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    for ((u, v) <- edges if u != v)
      assert(comp(u) === comp(v), s"edge ($u,$v) crosses components ${comp(u)}/${comp(v)}")
    // non-degenerate: the synthetic graph has more than one component
    assert(comp.values.toSet.size > 1)
    GraftCache.clear()
  }

  test("ann_hybrid_rrf fuses exact fixed-point reciprocal ranks") {
    val rows = SparkEntry
      .queries("ann_hybrid_rrf")(spark, sf)
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(rows.length === 20)
    assert(rows.map(_._1).distinct.length === 20, "fused ids must be distinct")
    for ((id, rrf, rk, rv) <- rows) {
      val want = rk.map(r => 1000000000000L / (60 + r)).getOrElse(0L) +
        rv.map(r => 1000000000000L / (60 + r)).getOrElse(0L)
      assert(rrf === want, s"id $id rrf")
      for (r <- rk ++ rv) assert(r >= 1 && r <= 50)
      assert(rk.isDefined || rv.isDefined)
    }
    rows.sliding(2).foreach {
      case Array((i1, s1, _, _), (i2, s2, _, _)) =>
        assert(s1 > s2 || (s1 == s2 && i1 < i2), "fusion ranking order")
      case _ => ()
    }
    GraftCache.clear()
  }

  test("rel_sessionize_batch matches a naive per-user gap-cut recount") {
    val gapUs = 30L * 60 * 1000000
    val got = SparkEntry
      .queries("rel_sessionize_batch")(spark, sf)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val events = Tables(spark, sf).events
      .selectExpr("user_id", "event_id", "ts_ns div 1000 as us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = events.groupBy(_._1).flatMap { case (user, evs) =>
      val ts = evs.sortBy(e => (e._3, e._2)).map(_._3)
      // naive cut: walk the sorted timestamps, splitting on gap > 30min
      val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
        if (t - acc.head.head <= gapUs) (t :: acc.head) :: acc.tail
        else List(t) :: acc
      }.reverse.map(_.reverse)
      sessions.zipWithIndex.map { case (ss, i) =>
        ((user, i + 1L), (ss.length.toLong, ss.head, ss.last))
      }
    }
    assert(got === want)
    GraftCache.clear()
  }

  test("rel_sessionize_batch fuses both windows into one user-keyed exec") {
    val df = SparkEntry.queries("rel_sessionize_batch")(spark, sf)
    df.collect()
    val windows = PlanCheck.countNodes[org.apache.spark.sql.execution.window.WindowExec](df)
    assert(windows === 2, s"gap lag + running boundary sum as two chained Window execs:\n${PlanCheck.render(df)}")
    // local (non-global) sorts only — the final ORDER BY is a global Sort
    val sorts = PlanCheck.collectNodes[org.apache.spark.sql.execution.SortExec](df).count(!_.global)
    assert(sorts === 1, s"both windows must share one user-keyed sort:\n${PlanCheck.render(df)}")
    assert(
      PlanCheck.hashExchanges(df).size === 1,
      s"windows AND the (user, sess) rollup must all ride one user shuffle:\n${PlanCheck.render(df)}")
    GraftCache.clear()
  }

  test("rel_join_bucketed plans the join AND the rollup with zero hash exchange") {
    val df = SparkEntry.queries("rel_join_bucketed")(spark, sf)
    df.collect()
    assert(
      PlanCheck.has[org.apache.spark.sql.execution.joins.SortMergeJoinExec](df),
      PlanCheck.render(df))
    assert(
      PlanCheck.hashExchanges(df).isEmpty,
      s"bucketed join must not shuffle:\n${PlanCheck.render(df)}")
    // the merge join may re-sort each bucket locally (Spark 3.1+ keeps
    // sortBy ordering behind a legacy flag) — but only the two
    // per-bucket sorts, never more, and never a shuffle
    val sorts = PlanCheck.collectNodes[org.apache.spark.sql.execution.SortExec](df).count(!_.global)
    assert(sorts <= 2, s"at most the two local per-bucket merge sorts:\n${PlanCheck.render(df)}")
    // both scans must select every bucket of the 8-bucket layout
    val bucketed = PlanCheck.fileScans(df).flatMap(_.optionalBucketSet)
    assert(bucketed.forall(_.cardinality() === 8), PlanCheck.render(df))
    GraftCache.clear()
  }

  test("rel_join_skew_salted pins the shuffle-hash path and equals the broadcast join") {
    val df = SparkEntry.queries("rel_join_skew_salted")(spark, sf)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val shj = PlanCheck.collectNodes[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec](df)
    assert(shj.nonEmpty, PlanCheck.render(df))
    val keyNames = shj.map(_.leftKeys.flatMap(_.collect {
      case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.name
    }))
    assert(
      keyNames.exists(ks => ks.headOption.contains("event_type") && ks.exists(_.startsWith("salt"))),
      s"join keys must lead with event_type and include the salt, got $keyNames:\n${PlanCheck.render(df)}")
    assert(
      !PlanCheck.has[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec](df),
      PlanCheck.render(df))
    // same answer as the plan you'd use when the build side IS broadcastable
    val dim = Seq(("view", 1), ("click", 5), ("purchase", 20), ("signup", 10), ("error", 0))
    val want = Tables(spark, sf).events
      .collect()
      .map(r => (r.getString(3), r.getDouble(4)))
      .groupBy(_._1)
      .map { case (t, vs) =>
        val w = dim.find(_._1 == t).get._2
        // HALF_UP mirrors the operator's DECIMAL(18,4) cast; a bare
        // setScale(4) throws ArithmeticException for any double not
        // exactly representable at 4 decimal digits
        val sum = vs.map(v => BigDecimal(v._2).setScale(4, BigDecimal.RoundingMode.HALF_UP) * w).sum
        (t, vs.length.toLong, sum.toDouble)
      }
      .toSeq
      .sortBy(_._1)
    assert(got.toSeq === want)
    GraftCache.clear()
  }

  test("rel_join_skew_salted spreads each hot key across the salt domain") {
    val fact = Tables(spark, sf).events
      .select(col("event_id"), col("event_type"))
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(16)).cast("int"))
    // under the salted shuffle key the hot 'click' key occupies many
    // partitions; under the raw key it is ONE task however big it is
    def spread(keys: org.apache.spark.sql.Column*): Long = fact
      .repartition(32, keys: _*)
      .select(col("event_type"), spark_partition_id().as("p"))
      .filter(col("event_type") === "click")
      .distinct()
      .count()
    assert(spread(col("event_type"), col("salt")) >= 8)
    assert(spread(col("event_type")) === 1)
    // and every hot key genuinely populates all 16 sub-keys
    val perType = fact
      .groupBy("event_type")
      .agg(countDistinct(col("salt")).as("n_salts"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(perType.values.forall(_ === 16L), perType.toString)
    GraftCache.clear()
  }

  test("wd_degree_stats is a complete distribution (handshake identity)") {
    val got = SparkEntry
      .queries("wd_degree_stats")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val raw = wikidata.WikidataShredder
      .edge(wikidata.WikidataShredder.claims(wikidata.SyntheticDump.entities(spark, sf)))
      .select("src_id", "dst_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val undirected = raw
      .filter { case (a, b) => a != b }
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .distinct
    // Σ degree · count = directed edge count (each undirected edge twice)
    assert(got.map { case (d, n) => d * n }.sum === undirected.length)
    // and the distribution equals a direct recount
    val want = undirected
      .groupBy(_._1)
      .map(_._2.length.toLong)
      .groupBy(identity)
      .map { case (d, vs) => d -> vs.size.toLong }
    assert(got.toMap === want)
    GraftCache.clear()
  }

  test("wd_shortest_path matches an in-memory Dijkstra over the same graph") {
    val got = SparkEntry
      .queries("wd_shortest_path")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val raw = wikidata.WikidataShredder
      .edge(wikidata.WikidataShredder.claims(wikidata.SyntheticDump.entities(spark, sf)))
      .select("src_id", "dst_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = raw
      .filter { case (a, b) => a != b }
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .distinct
      .map { case (a, b) => (a, b, 1L + (a + b) % 5) }
      .groupBy(_._1)
    // textbook Dijkstra from the same source
    val dist = scala.collection.mutable.Map(10L -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, 10L))(Ordering.by(-_._1))
    while (pq.nonEmpty) {
      val (d, v) = pq.dequeue()
      if (d == dist(v))
        for ((_, b, w) <- adj.getOrElse(v, Array.empty[(Long, Long, Long)]))
          if (dist.get(b).forall(_ > d + w)) { dist(b) = d + w; pq.enqueue((d + w, b)) }
    }
    assert(got === dist.toMap)
    assert(got(10L) === 0L)
    // the DuckDB oracle prunes its recursive walk at total < 400; every
    // true distance must sit WELL inside that horizon or the oracle
    // would silently drop reachable vertices at a bigger dump
    assert(got.values.max < 200, s"distances ${got.values.max} approach the oracle's 400 bound")
    // relaxed fixpoint: no edge can still improve any distance
    for ((a, es) <- adj; (_, b, w) <- es if got.contains(a))
      assert(got(b) <= got(a) + w, s"edge $a->$b weight $w not relaxed")
    GraftCache.clear()
  }

  test("rel_stats_corr agrees with Spark's own streaming-moment aggregates") {
    val got = SparkEntry
      .queries("rel_stats_corr")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    val ref = Tables(spark, sf).lineitem
      .groupBy("l_returnflag")
      .agg(
        corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
        stddev_samp(col("l_quantity")).as("sq"),
        stddev_samp(col("l_extendedprice")).as("sp"),
        regr_slope(col("l_extendedprice"), col("l_quantity")).as("sl"),
        regr_intercept(col("l_extendedprice"), col("l_quantity")).as("ic"))
      .collect()
    assert(ref.nonEmpty)
    for (r <- ref) {
      val g = got(r.getString(0))
      val pairs = Seq(
        (g.getDouble(2), r.getDouble(1)), (g.getDouble(3), r.getDouble(2)),
        (g.getDouble(4), r.getDouble(3)), (g.getDouble(5), r.getDouble(4)),
        (g.getDouble(6), r.getDouble(5)), (g.getDouble(7), r.getDouble(6)))
      for ((a, b) <- pairs)
        assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)), s"${r.getString(0)}: $a vs $b")
    }
    GraftCache.clear()
  }

  test("rel_surrogate_key mints exactly 1..N in key order without a global window") {
    val df = SparkEntry.queries("rel_surrogate_key")(spark, sf)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._2).toSeq === (1L to rows.length).toSeq, "dense sequential keys")
    assert(rows.sortBy(_._1).map(_._2).toSeq === (1L to rows.length).toSeq, "key order = id order")
    // the row_number window (the data-sized one) must be partitioned by
    // the range bucket, never a single global partition
    val rnWindows = PlanCheck
      .collectNodes[org.apache.spark.sql.execution.window.WindowExec](df)
      .filter(_.windowExpression.exists(_.collect {
        case _: org.apache.spark.sql.catalyst.expressions.RowNumber => true
      }.nonEmpty))
    assert(rnWindows.nonEmpty, PlanCheck.render(df))
    assert(
      rnWindows.forall(_.partitionSpec.exists(_.collect {
        case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.name
      }.contains("bucket"))),
      s"the data-sized window must be bucket-partitioned:\n${PlanCheck.render(df)}")
    GraftCache.clear()
  }

  test("dedup_cross_source matrix matches a direct mirror recount") {
    val got = SparkEntry
      .queries("dedup_cross_source")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val docs = Tables(spark, sf).documents
      .select("doc_id", "source")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // every 7th doc is mirrored into source (n+3) mod 20; texts are
    // otherwise unique, so each cell counts exactly those mirrors
    val want = docs
      .filter(_._1 % 7 == 0)
      .map { case (_, src) =>
        val n = src.drop(3).toInt
        val m = s"src${(n + 3) % 20}"
        if (src < m) (src, m) else (m, src)
      }
      .groupBy(identity)
      .map { case (k, vs) => k -> vs.length.toLong }
    assert(got === want)
    assert(got.keys.forall { case (a, b) => a < b }, "ordered pairs only")
    GraftCache.clear()
  }

  test("rel_setops_all multiplicities follow the bag arithmetic") {
    val got = SparkEntry
      .queries("rel_setops_all")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val o = Tables(spark, sf).orders
      .select("o_custkey", "o_orderstatus", "o_orderpriority")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val ca = o.filter(_._2 != "F").groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cb = o.filter(_._3.startsWith("1")).groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val keys = (ca.keySet ++ cb.keySet).toSeq
    val want = keys.flatMap { k =>
      val (na, nb) = (ca.getOrElse(k, 0L), cb.getOrElse(k, 0L))
      Seq(("except_all", k) -> (na - nb), ("intersect_all", k) -> math.min(na, nb))
        .filter(_._2 > 0)
    }.toMap
    assert(got === want)
    GraftCache.clear()
  }

  test("rel_resample_ffill produces a dense grid with correct carries") {
    val got = SparkEntry
      .queries("rel_resample_ffill")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val events = Tables(spark, sf).events
      .filter(col("user_id") < 5)
      .selectExpr("user_id", "event_id", "ts_ns div 1000 as us", "CAST(round(value*100) AS LONG) as v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(events.nonEmpty)
    for ((user, rows) <- got.groupBy(_._1)) {
      val hrs = rows.map(_._2).sorted
      // dense: every hour between first and last observation present
      assert(hrs.toSeq === (hrs.head to hrs.last).toSeq, s"user $user grid gaps")
      val byHr = events
        .filter(_._1 == user)
        .groupBy(_._3 / 3600000000L)
        .map { case (hr, es) => hr -> es.maxBy(e => (e._3, e._2))._4 }
      var carry = Long.MinValue
      for (hr <- hrs) {
        carry = byHr.getOrElse(hr, carry)
        assert(rows.find(_._2 == hr).get._3 === carry, s"user $user hr $hr")
      }
    }
    GraftCache.clear()
  }

  test("rel_join_range_bucketed equals the naive overlap join, no nested loop") {
    val df = SparkEntry.queries("rel_join_range_bucketed")(spark, sf)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(
      !PlanCheck.has[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec](df) &&
        !PlanCheck.has[org.apache.spark.sql.execution.joins.CartesianProductExec](df),
      PlanCheck.render(df))
    // naive O(A*B) recount: every qualifying (window, order) pair once
    val orders = Tables(spark, sf).orders
      .selectExpr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS LONG) AS d0")
      .collect()
      .map(_.getLong(0))
    val want = (0L until 25L).map { nk =>
      val s = 9131L + nk * 100
      (nk, s, orders.count(d0 => s <= d0 + 7 && d0 <= s + 30).toLong)
    }.filter(_._3 > 0).toSet
    assert(got === want)
    GraftCache.clear()
  }

  test("text_keyword_search scores match a direct per-document recount") {
    val terms = Set("spark", "window", "hash")
    val got = SparkEntry
      .queries("text_keyword_search")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 20)
    val byDoc = Tables(spark, sf).documents
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(terms))
      .toMap
    for ((docId, nTerms, tfTotal) <- got) {
      val hits = byDoc(docId)
      assert(hits.distinct.length.toLong === nTerms, s"doc $docId n_terms")
      assert(hits.length.toLong === tfTotal, s"doc $docId tf_total")
    }
    // ranking: non-increasing (n_terms, tf_total) with doc_id tiebreak
    got.sliding(2).foreach {
      case Array((d1, n1, t1), (d2, n2, t2)) =>
        assert(
          n1 > n2 || (n1 == n2 && (t1 > t2 || (t1 == t2 && d1 < d2))),
          s"ranking order violated between $d1 and $d2")
      case _ => ()
    }
    GraftCache.clear()
  }
}
