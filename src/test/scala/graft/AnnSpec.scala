package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Quality checks for the approximate (rows-only) operators: the LSH and
  * IVF candidate generators must recover a reasonable fraction of the
  * brute-force top-k, and SimHash must surface exact copies at hamming 0.
  */
class AnnSpec extends AnyFunSuite {
  import TestSpark._

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val brute = pairs(SparkEntry.queries("ann_bruteforce")(spark, sf))

  test("ann_lsh recall vs brute force") {
    val lsh = pairs(SparkEntry.queries("ann_lsh")(spark, sf))
    val recall = (lsh & brute).size.toDouble / brute.size
    info(f"ann_lsh recall@5 = $recall%.3f (${lsh.size} candidates)")
    assert(recall > 0.05, s"LSH recall collapsed: $recall")
  }

  test("ann_ivf recall vs brute force") {
    val ivf = pairs(SparkEntry.queries("ann_ivf")(spark, sf))
    val recall = (ivf & brute).size.toDouble / brute.size
    info(f"ann_ivf recall@5 = $recall%.3f")
    assert(recall > 0.1, s"IVF recall collapsed: $recall")
  }

  test("ann_ivf_pq recall vs brute force") {
    val ivfpq = pairs(SparkEntry.queries("ann_ivf_pq")(spark, sf))
    assert(ivfpq.size === brute.size, "composed index must return full top-k lists")
    val recall = (ivfpq & brute).size.toDouble / brute.size
    info(f"ann_ivf_pq recall@5 = $recall%.3f")
    // the composed index approximates twice (nprobe pruning + residual
    // codes), so its floor sits between ann_ivf's and random
    assert(recall > 0.1, s"IVF-PQ recall collapsed: $recall")
  }

  test("ann_hnsw recall vs brute force") {
    GraftCache.clear()
    val hnsw = pairs(SparkEntry.queries("ann_hnsw")(spark, sf))
    GraftCache.clear()
    assert(hnsw.size === brute.size, "graph search must return full top-k lists")
    val recall = (hnsw & brute).size.toDouble / brute.size
    info(f"ann_hnsw recall@5 = $recall%.3f")
    // a 3-round W=8 beam over a symmetrized M=8 kNN graph from a
    // single entry point: the graph family's floor sits above the
    // coarse-partition indexes (the links ARE exact near-neighbors)
    assert(recall > 0.3, s"graph-ANN recall collapsed: $recall")
  }

  test("ann_rerank_exact: exact re-rank of the PQ shortlist recovers recall over raw PQ") {
    val pq = pairs(SparkEntry.queries("ann_pq")(spark, sf))
    val rr = pairs(SparkEntry.queries("ann_rerank_exact")(spark, sf))
    assert(rr.size === brute.size, "rerank must return full top-k lists")
    val rPq = (pq & brute).size.toDouble / brute.size
    val rRr = (rr & brute).size.toDouble / brute.size
    info(f"raw-PQ recall@5 = $rPq%.3f, rerank recall@5 = $rRr%.3f")
    // structural: PQ's top-5 is a subset of its top-20 shortlist, and
    // brute members of the shortlist always survive an exact re-rank —
    // so the two-stage recall can never fall below raw PQ's
    assert(rRr >= rPq, s"re-rank lost recall: $rRr < $rPq")
    // and it must genuinely pay: the codes misorder near neighbors far
    // more often than they drop them from a 4x-deep shortlist
    assert(rRr > rPq, s"re-rank bought nothing over raw PQ ($rRr)")
  }

  test("Lloyd refinement: objective non-increasing, converges, improves on the seed") {
    GraftCache.clear()
    val (assigned, rounds, objs) = ann.AnnCatalog.lloydTrain(spark, sf, 30)
    info(s"lloyd: $rounds rounds, objective ${objs.map(o => f"$o%.3e").mkString(" -> ")}")
    assert(rounds >= 1 && rounds < 30, s"expected convergence inside the cap, got $rounds")
    assert(objs.size === rounds + 1)
    objs.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + math.abs(a) * 1e-12, s"objective rose: $objs")
      case _ =>
    }
    // the label seeding is not a Lloyd fixpoint on this corpus: the
    // refinement must genuinely move vectors and lower the objective
    assert(objs.last < objs.head, s"no improvement over the k-means-lite seed: $objs")
    assert(assigned.select("vec_id").distinct().count() === 500L)
    GraftCache.clear()
  }

  test("Lloyd-refined cells: IVF retrieval recall measured against the label seed") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.{cosineFrom, dotQ}
    GraftCache.clear()
    val (assigned, _, _) = ann.AnnCatalog.lloydTrain(spark, sf, 30)
    // spec-side IVF search over the trained cells: mean centroids from
    // the assignment, nprobe=2, exact cosine on the probed cells only —
    // the same search shape ann_ivf deploys over label-seeded cells
    val cents = assigned
      .select(col("cell"), posexplode(col("qv")))
      .groupBy("cell", "pos")
      .agg(avg(col("col")).as("m"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))), x => x.getField("m"))
        .as("cmean"))
    val q = assigned
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("qv").as("qe"), col("nsq").as("qn"))
    val probeW = Window.partitionBy("q_id").orderBy(col("score").desc, col("cell"))
    val probes = q
      .join(broadcast(cents))
      .withColumn("score", aggregate(
        zip_with(col("qe"), col("cmean"), (a, b) => a.cast("double") * b),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= 2)
      .select("q_id", "qe", "qn", "cell")
    val topW = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    val lloydPairs = assigned
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", cosineFrom(dotQ(col("qe"), col("qv")), col("qn"), col("nsq")))
      .withColumn("rn", row_number().over(topW))
      .filter(col("rn") <= 5)
      .select("q_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallLloyd = (lloydPairs & brute).size.toDouble / brute.size
    val ivf = pairs(SparkEntry.queries("ann_ivf")(spark, sf))
    val recallLabel = (ivf & brute).size.toDouble / brute.size
    info(f"IVF recall@5: lloyd-refined cells $recallLloyd%.3f vs label seed $recallLabel%.3f")
    assert(recallLloyd > 0.1, s"lloyd-cell retrieval collapsed: $recallLloyd")
    GraftCache.clear()
  }

  test("ann_recall_report matches the set-level recall computation") {
    val rep = SparkEntry.queries("ann_recall_report")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rep.length === 10) // one row per sampled query vector
    assert(rep.forall(_._2 === 5L), "n_brute must be exactly k for every query")
    // the report's n_hit must agree with computing recall the long way
    val lsh = pairs(SparkEntry.queries("ann_lsh")(spark, sf))
    assert(rep.map(_._3).sum === (lsh & brute).size.toLong)
  }

  test("ann_ivf assignment is a partial aggregation, not a window") {
    // The centroid-assignment argmax must shuffle N rows (min_by with
    // map-side partial combine), not N*k window input. The only Window
    // left in the whole query is the rank over the already-k-bounded
    // top rows.
    val df = SparkEntry.queries("ann_ivf")(spark, sf)
    assert(
      PlanCheck.hasPartialAgg(df, classOf[org.apache.spark.sql.catalyst.expressions.aggregate.MinBy]),
      s"assignment lost partial combine:\n${PlanCheck.render(df)}")
    val windows = PlanCheck.countNodes[org.apache.spark.sql.execution.window.WindowExec](df)
    assert(windows <= 1, s"expected at most the final rank Window, got $windows:\n${PlanCheck.render(df)}")
  }

  test("ann_lsh candidate ranking goes through the bounded-heap operator") {
    val df = SparkEntry.queries("ann_lsh")(spark, sf)
    assert(
      PlanCheck.has[graft.plans.TopKPerGroupExec](df),
      s"bucket candidates not heap-bounded:\n${PlanCheck.render(df)}")
    assert(
      PlanCheck.countNodes[org.apache.spark.sql.execution.window.WindowExec](df) <= 1,
      s"full-sort window crept back:\n${PlanCheck.render(df)}")
  }

  test("ann_pq recall vs brute force, assignment partial, ADC integer-typed") {
    val pq = SparkEntry.queries("ann_pq")(spark, sf)
    val recall = (pairs(pq) & brute).size.toDouble / brute.size
    info(f"ann_pq recall@5 = $recall%.3f")
    // coarse label-derived codebooks: expect rough neighbors, not collapse
    assert(recall > 0.05, s"PQ recall collapsed: $recall")
    // ADC must be the order-independent BIGINT fixed-point sum
    assert(pq.schema("adc").dataType === org.apache.spark.sql.types.LongType)
    assert(
      PlanCheck.hasPartialAgg(pq, classOf[org.apache.spark.sql.catalyst.expressions.aggregate.MinBy]),
      s"code assignment lost partial combine:\n${PlanCheck.render(pq)}")
    assert(
      PlanCheck.countNodes[org.apache.spark.sql.execution.window.WindowExec](pq) <= 1,
      s"full-sort window crept back:\n${PlanCheck.render(pq)}")
  }

  test("dedup_span flags embedded and verbatim span copies") {
    val rows = SparkEntry
      .queries("dedup_span")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // doc 600000 embeds words 1-15 of doc 7: its 6 interior 10-gram
    // spans of that window duplicate doc 7's, the junk-bridging spans
    // don't — so SOME but not ALL spans are dups on both sides
    val (n7, d7, _) = rows(7L)
    val (nE, dE, _) = rows(600000L)
    assert(d7 >= 6 && d7 < n7, s"doc 7 span dups: $d7/$n7")
    assert(dE >= 6 && dE < nE, s"embed doc span dups: $dE/$nE")
    // verbatim copy: every span of doc 8 and its copy is duplicated
    assert(rows(8L)._1 === rows(8L)._2)
    assert(rows(600001L)._1 === rows(600001L)._2)
  }

  test("dedup_semdedup drops every injected copy, assignment keeps partial combine") {
    val df = SparkEntry.queries("dedup_semdedup")(spark, sf)
    val dropped = df
      .collect()
      .map(r => r.getLong(0) -> r.getLong(2))
      .toMap
    // every injected copy (vec_id+100000) must be in the drop list with
    // a keeper no later than its original (min-id keeper policy)
    val originals = spark.read
      .parquet(s"$sf/embeddings.parquet")
      .select("vec_id")
      .collect()
      .map(_.getLong(0))
      .filter(_ % 25 == 0)
    assert(originals.nonEmpty)
    originals.foreach { v =>
      assert(dropped.contains(v + 100000), s"copy of $v not dropped")
      assert(dropped(v + 100000) <= v, s"keeper for copy of $v is ${dropped(v + 100000)}")
    }
    assert(
      PlanCheck.hasPartialAgg(df, classOf[org.apache.spark.sql.catalyst.expressions.aggregate.MinBy]),
      s"cell assignment lost partial combine:\n${PlanCheck.render(df)}")
  }

  test("dedup_simhash finds exact copies at hamming 0") {
    val rows = SparkEntry
      .queries("dedup_simhash")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // injected copies: doc_id%50=0 tagged +300000 — must all appear at 0
    val copies = rows.filter { case (a, b, _) => b == a + 300000 }
    assert(copies.nonEmpty)
    assert(copies.forall(_._3 == 0))
    assert(rows.forall(_._3 <= 3))
  }

  test("dedup_minhash_lsh agrees with exact ngram jaccard at tau=0.7") {
    def ab(name: String) = SparkEntry
      .queries(name)(spark, sf)
      .select("id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val mh = ab("dedup_minhash_lsh")
    val exact = ab("dedup_ngram_jaccard")
    // LSH candidates are verified with the same exact Jaccard, so MinHash
    // output must be a subset of the exact pairs; banding (b=16, r=4)
    // at j>=0.7 catches a pair with prob ~1-(1-0.7^4)^16 ~ 0.99
    assert(mh.subsetOf(exact), s"false positives: ${mh -- exact}")
    assert(mh.size.toDouble >= 0.8 * exact.size, s"minhash recall too low: ${mh.size}/${exact.size}")
  }
}
