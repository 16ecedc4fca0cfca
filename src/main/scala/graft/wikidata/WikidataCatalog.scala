package graft.wikidata

import graft.{GraftCache, Q, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1 — the reference's core capability re-expressed
  * Spark-first: JSON-lines dump -> typed property-graph star schema.
  * Input is the deterministic SyntheticDump built from nation/region, so
  * every oracle reconstructs the expected shredded table relationally
  * from the same parquet the engine read.
  */
object WikidataCatalog extends QueryModule {

  private val nIsBig = "CAST(10+n_nationkey AS BIGINT)"

  /** Shared by wd_quantity (batch shred) and wd_stream_ingest (the same
    * shred run incrementally) — both must produce this exact relation. */
  /** Relational reconstruction of the shredded edge table (the same
    * union wd_edge's oracle checks) — shared with wd_pagerank, whose
    * oracle iterates over it. */
  private lazy val edgeUnionSql =
    s"""SELECT $nIsBig AS src_id, CAST(1000000031 AS BIGINT) AS property_id, CAST(100+n_regionkey AS BIGINT) AS dst_id FROM nation
       |UNION ALL SELECT 10+n_nationkey, 1000000007, 200+n_nationkey FROM nation
       |UNION ALL SELECT 10+n_nationkey, 1000000005, 10+n_nationkey FROM nation
       |UNION ALL SELECT 10+n_nationkey, 1000000006, 10+n_nationkey FROM nation
       |UNION ALL SELECT 1000000040+r_regionkey, 1000000031, 300+r_regionkey FROM region
       |UNION ALL SELECT 2000000007, 1000000008, 705032713
       |UNION ALL SELECT 2000000007, 1000000009, 1205032714
       |UNION ALL SELECT 2000000007, 1000000012, 2000000007""".stripMargin

  private lazy val quantityOracle =
    s"""SELECT $nIsBig AS src_id, CAST(1000001082 AS BIGINT) AS property_id, $nIsBig AS dst_id,
       |CAST(n_nationkey*1000 + 500.25 AS DOUBLE) AS amount,
       |CASE WHEN n_nationkey%3=0 THEN NULL ELSE CAST(n_nationkey*1000 + 490.25 AS DOUBLE) END AS lower_bound,
       |CASE WHEN n_nationkey%3=0 THEN NULL ELSE CAST(n_nationkey*1000 + 510.25 AS DOUBLE) END AS upper_bound,
       |CASE WHEN n_nationkey%3=0 THEN NULL ELSE CAST(4917 AS BIGINT) END AS unit_id
       |FROM nation ORDER BY src_id""".stripMargin

  /** Scoped session for the iterative graph operators: per-round frames
    * are vertex/edge-vector-sized, so the loop runs at
    * `spark.graft.graph.partitions` (default 8) shuffle width instead
    * of the session-wide count — at toy vertex counts the 32-partition
    * default is pure task-scheduling overhead multiplied by rounds; on
    * a cluster set the knob to ~2x cores like any shuffle width. */
  private[graft] def graphSession(s0: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession = {
    val s = s0.newSession()
    s.conf.set(
      "spark.sql.shuffle.partitions",
      s0.conf.get("spark.graft.graph.partitions", "8"))
    s
  }

  /** Degree cap on WEDGE CENTERS for the link-prediction family
    * (wd_link_predict / wd_resource_alloc): wedge mass is Σ deg(c)²
    * over shared endpoints, so one P31-style hub (deg ~10⁶ on real
    * Wikidata) alone contributes ~10¹² candidate pairs — the join that
    * OOMs a 1000-executor cluster while every bounded center finishes
    * in seconds. Centers above the cap are EXCLUDED from wedge
    * enumeration, the same structural move as DedupCatalog's
    * MaxBucketWidth: a hub shared by everything carries ~zero ranking
    * signal anyway (resource allocation already weights it 1/deg →
    * ≤ 1000 ppm), and the dropped mass is surfaced AS DATA by
    * `wd_wedge_cap_report` rather than silently. The cap is mirrored
    * verbatim in both oracles, so capped Spark and capped DuckDB agree
    * at every scale; GraphStress's planted-hub arm measures the
    * admitted-mass bound. */
  private[graft] val WedgeDegCap = 1000L

  /** The symmetric edge frame annotated with its CENTER-side degree:
    * (a, b, d) where d = deg(b) — the shared helper of the wedge-join
    * family, whose joins go through b as the wedge center. One
    * vertex-keyed aggregation joined back on the partition key. */
  private def withCenterDegree(symP: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val deg = symP.groupBy(col("a")).agg(count(lit(1)).as("d"))
    symP.join(deg.withColumnRenamed("a", "b"), "b").select("a", "b", "d")
  }

  /** Wedge-cap census over an arbitrary symmetric (a, b) edge frame —
    * the measurable form of the [[WedgeDegCap]] bound, shared by
    * GraphStress's planted-hub arm and its smoke spec: returns
    * (admittedMass, cappedMass, admittedEnumerated) where the mass
    * terms are Σ d·(d−1)/2 split at the cap (what wd_wedge_cap_report
    * reports as data) and admittedEnumerated is the ACTUAL row count
    * of the capped wedge join — equal to admittedMass by construction,
    * and bounded by cap·|E|/2 no matter how large a hub the graph
    * grows. */
  private[graft] def wedgeCapCensus(sym: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
    val deg = sym.groupBy(col("a")).agg(count(lit(1)).as("d"))
    val mass = deg.agg(
      sum(when(col("d") <= WedgeDegCap, expr("d * (d - 1) div 2")).otherwise(0L)).as("adm"),
      sum(when(col("d") > WedgeDegCap, expr("d * (d - 1) div 2")).otherwise(0L)).as("cap")).head()
    val adm = withCenterDegree(sym).filter(col("d") <= WedgeDegCap)
    val enumerated = adm.select(col("a").as("x"), col("b").as("c"))
      .join(adm.select(col("a").as("y"), col("b").as("c")), "c")
      .filter(col("x") < col("y"))
      .count()
    (Option(mass.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L),
      Option(mass.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L),
      enumerated)
  }

  /** Undirected view of the shredded entity graph: (a, b) edge pairs in
    * BOTH directions (self-loops removed) plus the distinct vertex set.
    * Each consumer appends its own self-edges (label/distance
    * carry-forward) and weights before persisting. */
  private def symmetricGraph(
      s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val raw = WikidataShredder
      .edge(WikidataShredder.claims(SyntheticDump.entities(s, dir)))
      .select("src_id", "dst_id")
    val und = raw.filter(col("src_id") =!= col("dst_id"))
    val sym = und
      .select(col("src_id").as("a"), col("dst_id").as("b"))
      .unionByName(und.select(col("dst_id").as("a"), col("src_id").as("b")))
      .distinct()
    val verts = raw
      .select(col("src_id").as("id"))
      .unionByName(raw.select(col("dst_id").as("id")))
      .distinct()
    (sym, verts)
  }

  /** Synchronous 3-round label propagation over the shredded graph —
    * the shared engine of wd_label_propagation (emits the partition)
    * and wd_modularity (audits it). Returns (sym, verts, labels) where
    * labels = (id, lbl) after the fixed unrolled schedule; see
    * wd_label_propagation's scaladoc for the determinism rationale. */
  private def lpaLabels(
      s: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val (symRaw, verts) = symmetricGraph(s, dir)
    // persisted: sym's upstream is the whole parse+shred chain, and the
    // edge list appears once per LPA round INSIDE the single label plan
    // (plus twice more in wd_modularity's eIn/degree joins) — without
    // the cache the dump parse re-runs per appearance. Edge-list-sized,
    // the canonical iterative-graph working set; GraftCache-registered
    // so harnesses reclaim it between queries.
    val sym = graft.GraftCache.register(symRaw.persist())
    var lab = verts.withColumn("lbl", col("id"))
    for (_ <- 1 to 3) {
      val md = sym
        .join(lab, sym("b") === lab("id"))
        .select(sym("a").as("nid"), col("lbl").as("nlbl"))
        .groupBy("nid", "nlbl")
        .agg(count(lit(1)).as("c"))
        .groupBy("nid")
        .agg(min_by(col("nlbl"), struct(negate(col("c")), col("nlbl"))).as("mlbl"))
      lab = lab
        .join(md, lab("id") === md("nid"), "left_outer")
        .select(lab("id"), coalesce(col("mlbl"), col("lbl")).as("lbl"))
    }
    (sym, verts, lab)
  }

  /** Oracle mirror of [[lpaLabels]]: CTE chain e → u (symmetric pairs)
    * → v → l0..l3 (the 3 unrolled rounds), no WITH prefix. Shared by
    * the wd_label_propagation and wd_modularity oracles. */
  private lazy val lpaSqlCtes: String = {
    val rounds = (1 to 3).map { i =>
      s"""n$i AS (SELECT u.a AS id, l.lbl FROM u JOIN l${i - 1} l ON u.b = l.id),
         |c$i AS (SELECT id, lbl, COUNT(*) AS c FROM n$i GROUP BY 1, 2),
         |m$i AS (SELECT id, lbl FROM (SELECT id, lbl,
         |        row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn FROM c$i)
         |        WHERE rn = 1),
         |l$i AS (SELECT p.id, COALESCE(m.lbl, p.lbl) AS lbl
         |        FROM l${i - 1} p LEFT JOIN m$i m ON p.id = m.id)""".stripMargin
    }.mkString(",\n")
    s"""e AS (SELECT src_id, dst_id FROM ($edgeUnionSql)),
       |u AS (SELECT src_id AS a, dst_id AS b FROM e WHERE src_id <> dst_id
       |      UNION SELECT dst_id, src_id FROM e WHERE src_id <> dst_id),
       |v AS (SELECT DISTINCT id FROM (SELECT src_id AS id FROM e UNION ALL SELECT dst_id FROM e)),
       |l0 AS (SELECT id, id AS lbl FROM v),
       |$rounds""".stripMargin
  }

  /** Convergence-probed cache-rotating fixpoint loop shared by the
    * iterative graph operators: materialize each round's frame with its
    * lineage TRUNCATED ([[roundFrame]]), compare a cheap scalar probe
    * against the previous round's, free the predecessor, and FAIL
    * LOUDLY if the cap is hit — the cap is a runaway backstop, not an
    * accepted outcome; returning non-fixpoint state would die later as
    * an opaque oracle hash mismatch. State is the caller's persisted
    * inputs plus 2 rotating frames regardless of round count.
    *
    * Lineage truncation per round is LOAD-BEARING at round counts
    * beyond a handful: Spark builds the physical-plan description
    * string for the SQL listener on EVERY action, and under AQE each
    * cached-nesting level prints both its current and initial plan, so
    * an un-truncated iterative lineage costs O(2^rounds) characters per
    * action — measured on a 32-vertex path graph: 9.8 KB at round 1
    * doubling every round to 496 MB at round 16, then driver OOM,
    * independent of data size. localCheckpoint collapses each round to
    * its materialized RDD so every round's plan is constant-size; on a
    * real cluster swap in reliable checkpoint() every few rounds for
    * executor-loss tolerance (the GraphX practice).
    *
    * Returns the fixpoint frame plus the number of step() rounds it
    * took — package-visible so specs (and the scaling-curve harness)
    * can assert round counts, e.g. that large-star/small-star beats
    * min-label propagation on a path graph. */
  private[graft] def fixpointCounted(
      init: org.apache.spark.sql.DataFrame,
      step: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      probe: org.apache.spark.sql.DataFrame => Any,
      maxRounds: Int,
      what: String): (org.apache.spark.sql.DataFrame, Int) = {
    var cur = roundFrame(init)
    // On ANY failure path — round cap hit (require below), step() or
    // probe() throwing — the current round's checkpoint blocks must be
    // freed here: they live outside the CacheManager, so GraftCache
    // .clear() cannot reclaim them and a leaked frame survives until
    // session teardown (ADVICE r7).
    try {
      var curProbe = probe(cur)
      var done = false
      var rounds = 0
      while (!done && rounds < maxRounds) {
        val next = roundFrame(step(cur))
        val nextProbe =
          try probe(next)
          catch { case e: Throwable => freeRoundFrame(next); throw e }
        freeRoundFrame(cur)
        cur = next
        rounds += 1
        done = nextProbe == curProbe
        curProbe = nextProbe
      }
      require(done, s"$what did not converge within $rounds rounds")
      val last = cur
      graft.GraftCache.registerCleanup(() => freeRoundFrame(last))
      (cur, rounds)
    } catch {
      case e: Throwable => freeRoundFrame(cur); throw e
    }
  }

  /** Materialize one fixpoint round and truncate its lineage (see the
    * [[fixpoint]] scaladoc for why truncation, not just persist(), is
    * required). */
  private def roundFrame(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.localCheckpoint(eager = true)

  /** Free a rotated-out round frame. localCheckpoint blocks live
    * outside the CacheManager, so Dataset.unpersist cannot reach them —
    * drop the underlying RDD's blocks directly. */
  private def freeRoundFrame(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => df.unpersist(blocking = false)
    }

  /** Stage the synthetic dump as compressed text files and return the
    * staged dir. The write goes through Hadoop's codec factory (picked
    * by `compression`), and [[WikidataShredder.parseFile]] reads it
    * back through the same factory keyed on the `.gz`/`.bz2` file
    * extension — so a query over the result pins the whole
    * compress→decompress→parse chain. The dir is removed at the next
    * GraftCache.clear() (the harness boundary), after the query's
    * result has been forced.
    */
  private def stageCompressed(
      s: org.apache.spark.sql.SparkSession,
      dir: String,
      codec: String,
      prefix: String): String = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix)
    SyntheticDump.lines(s, dir).write
      .mode("overwrite")
      .option("compression", codec)
      .text(tmp.toString)
    graft.GraftCache.registerCleanup { () =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(tmp.toFile)
    }
    tmp.toString
  }

  /** One large-star round (Kiveris et al., "Connected Components in
    * MapReduce and Beyond" — the reference engine has no graph ops;
    * cf. main.rs:1 scope): every vertex u attaches its LARGER
    * neighbors to m = min(Γ(u) ∪ {u}). Input/output edge sets are
    * canonical (a < b, distinct, no self-loops). Each emitted edge
    * (m, v) satisfies m <= old partner, so the exact sum of a+b over
    * the set strictly decreases on any change — the monotone
    * convergence probe [[lssProbe]] relies on this.
    */
  private[graft] def largeStar(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val nbrs = e
      .select("a", "b")
      .unionByName(e.select(col("b").as("a"), col("a").as("b")))
    val mins = nbrs
      .groupBy("a")
      .agg(min(col("b")).as("mb"))
      .select(col("a"), least(col("mb"), col("a")).as("m"))
    nbrs
      .filter(col("b") > col("a"))
      .join(mins, "a")
      .select(col("m").as("a"), col("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** One small-star round: orient each canonical edge at its larger
    * endpoint u, compute m = min(Γ⁻(u) ∪ {u}) = min of the smaller
    * neighbors, and re-attach u and every smaller neighbor to m.
    * Preserves the canonical a < b invariant (m < v and m < u by
    * construction) and is per-edge non-increasing like [[largeStar]].
    */
  private[graft] def smallStar(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val mins = e
      .groupBy(col("b").as("u"))
      .agg(min(col("a")).as("m"))
    e.join(mins, e("b") === mins("u"))
      .filter(col("a") =!= col("m"))
      .select(col("m").as("a"), col("a").as("b"))
      .unionByName(mins.select(col("m").as("a"), col("u").as("b")))
      .distinct()
  }

  /** Monotone probe for the alternating large-star/small-star loop:
    * both phases only shrink the per-edge sum and the distinct-set
    * size, so (count, exact DECIMAL sum of a+b) repeats across a
    * combined round iff the edge set is unchanged — i.e. both phases
    * were the identity, the paper's termination condition. */
  private[graft] val lssProbe: org.apache.spark.sql.DataFrame => Any = df => {
    val r = df
      .agg(
        count(lit(1)),
        sum((col("a") + col("b")).cast(org.apache.spark.sql.types.DecimalType(38, 0))))
      .head()
    (r.getLong(0), r.getDecimal(1))
  }

  /** PageRank recurrence over a directed edge frame (src_id, dst_id):
    * three damped iterations unrolled into one Catalyst DAG, every
    * rank a BIGINT in 1e-12 units, every division integral — bit-exact
    * across engines. Package-visible so the scaling harness
    * (tools/GraphStress) can run the same kernel over synthetic
    * 10x/100x edge frames; wd_pagerank's scale-posture scaladoc is the
    * contract. Returns (id, r). */
  private[graft] def pagerankKernel(edgeIn: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val edge = graft.GraftCache.register(edgeIn.persist())
    val deg = edge.groupBy("src_id").agg(count(lit(1)).as("d")).withColumnRenamed("src_id", "id")
    val verts = edge
      .select(col("src_id").as("id"))
      .unionByName(edge.select(col("dst_id").as("id")))
      .distinct()
    val n1 = verts.agg(count(lit(1)).as("n"))
    val r0 = verts
      .crossJoin(broadcast(n1))
      .select(col("id"), expr("1000000000000 div n").as("r"))
    (1 to 3).foldLeft(r0) { (r, _) =>
      val inc = edge
        .join(r.withColumnRenamed("id", "src_id"), "src_id")
        .join(deg.withColumnRenamed("id", "src_id"), "src_id")
        .select(col("dst_id").as("id"), expr("r div d").as("c"))
        .groupBy("id")
        .agg(sum(col("c")).as("inc"))
      verts
        .crossJoin(broadcast(n1))
        .join(inc, Seq("id"), "left")
        .select(
          col("id"),
          expr("(15 * (1000000000000 div n)) div 100 + (85 * coalesce(inc, 0)) div 100").as("r"))
    }
  }

  /** Min-label-propagation connected components over a symmetric edge
    * frame (a, b) + vertex frame (id) — the wd_connected_components
    * kernel (see that query's scale-posture scaladoc). Returns the
    * label frame (id, comp) and the round count. */
  private[graft] def ccMinLabelKernel(
      sym: org.apache.spark.sql.DataFrame,
      verts: org.apache.spark.sql.DataFrame,
      maxRounds: Int = 64): (org.apache.spark.sql.DataFrame, Int) = {
    // self-edges added so a vertex's own label rides the same min
    // aggregate (no second join); repartitioned by the join key
    // once and persisted — every round reuses the cached
    // partitioning and only ships the vertex-sized label vector
    val adj = graft.GraftCache.register(
      sym
        .unionByName(verts.select(col("id").as("a"), col("id").as("b")))
        .repartition(col("b"))
        .persist())
    // monotone probe: labels only decrease, so the exact DECIMAL
    // label sum is strictly smaller iff any label changed
    val dsum = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(sum(col("comp").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .head()
        .getDecimal(0)
    // round 0 fused into initialization: with self-edges in adj,
    // min(neighbor id) IS the first propagation round over identity
    // labels — one fewer materialized round and no identity pass
    fixpointCounted(
      init = adj
        .groupBy(col("a"))
        .agg(min(col("b")).as("comp"))
        .select(col("a").as("id"), col("comp")),
      step = prev =>
        adj
          .join(prev.select(col("id").as("b"), col("comp").as("nc")), "b")
          .groupBy(col("a"))
          .agg(min(col("nc")).as("comp"))
          .select(col("a").as("id"), col("comp")),
      probe = dsum,
      maxRounds = maxRounds,
      what = "connected components")
  }

  /** Large-star/small-star connected components over a symmetric edge
    * frame + vertex frame — the wd_connected_components_lss kernel
    * (see that query's scale-posture scaladoc). Returns the label
    * frame (id, comp) and the combined-round count. */
  private[graft] def ccLssKernel(
      sym: org.apache.spark.sql.DataFrame,
      verts: org.apache.spark.sql.DataFrame,
      maxRounds: Int = 64): (org.apache.spark.sql.DataFrame, Int) = {
    val vertsCached = graft.GraftCache.register(verts.persist())
    val init = sym.filter(col("a") < col("b")).select("a", "b")
    val (stars, rounds) = fixpointCounted(
      init = init,
      step = prev => smallStar(largeStar(prev)),
      probe = lssProbe,
      maxRounds = maxRounds,
      what = "large-star/small-star components")
    // defensive min: at a true fixpoint each b-side vertex holds
    // exactly one parent edge, so the min is a no-op — but a
    // probe collision would otherwise surface as duplicate rows
    // instead of a diagnosable wrong-label hash diff
    val parents = stars
      .groupBy(col("b").as("id"))
      .agg(min(col("a")).as("parent"))
    val labels = vertsCached
      .join(parents, Seq("id"), "left")
      .select(col("id"), coalesce(col("parent"), col("id")).as("comp"))
    (labels, rounds)
  }

  /** Single-source Bellman-Ford over a symmetric edge frame + vertex
    * frame with the deterministic 1 + (a+b) mod 5 edge weight — the
    * wd_shortest_path kernel (see that query's scale-posture
    * scaladoc). Only reached vertices carry state. Returns the
    * distance frame (id, dist) and the round count. */
  private[graft] def shortestPathKernel(
      sym: org.apache.spark.sql.DataFrame,
      verts: org.apache.spark.sql.DataFrame,
      source: Long,
      maxRounds: Int = 256): (org.apache.spark.sql.DataFrame, Int) = {
    val adj = graft.GraftCache.register(
      sym
        .withColumn("w", lit(1L) + pmod(col("a") + col("b"), lit(5L)))
        .unionByName(verts.select(col("id").as("a"), col("id").as("b"), lit(0L).as("w")))
        .repartition(col("b"))
        .persist())
    // (count, exact sum) pair: distances only decrease and the
    // reached set only grows, so the pair repeats iff at fixpoint
    val probe = (df: org.apache.spark.sql.DataFrame) => {
      val r = df
        .agg(
          count(lit(1)),
          sum(col("dist").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .head()
      (r.getLong(0), r.getDecimal(1))
    }
    // guard the source: a graph without it must fail HERE with a clear
    // message, not as an empty-vs-one-row hash diff downstream
    require(
      adj.filter(col("a") === source).limit(1).count() == 1,
      s"source vertex $source is absent from the graph")
    fixpointCounted(
      init = adj.sparkSession.range(1).select(lit(source).as("id"), lit(0L).as("dist")),
      step = prev =>
        adj
          .join(prev.select(col("id").as("b"), col("dist").as("db")), "b")
          .groupBy(col("a"))
          .agg(min(col("db") + col("w")).as("dist"))
          .select(col("a").as("id"), col("dist")),
      probe = probe,
      maxRounds = maxRounds,
      what = "shortest paths")
  }

  def queries: Seq[Q] = Seq(
    Q(
      "wd_parse",
      (s, dir) =>
        SyntheticDump
          .entities(s, dir)
          .select(col("id").as("id_str"), col("labels")("en")("value").as("label"))
          .orderBy("id_str"),
      Some("""SELECT * FROM (
             |SELECT 'Q'||(10+n_nationkey) AS id_str, n_name AS label FROM nation
             |UNION ALL SELECT 'P'||(40+r_regionkey), r_name FROM region
             |UNION ALL SELECT 'L7', 'lex'
             |UNION ALL SELECT 'Q5000000', 'solo'
             |) ORDER BY id_str""".stripMargin)
    ),
    Q(
      "wd_parse_gz",
      // Compressed-dump ingestion, the reference's PRIMARY input shape
      // (main.rs:261-269: file-or-stdin incl. .gz): the synthetic dump
      // is staged as gzip text files and read back through parseFile,
      // whose Hadoop codec path decompresses by extension — then
      // shredded to the quantity table so the oracle hash pins the
      // whole decompress->parse->shred chain, not just a line count.
      // gz is NOT splittable (one file = one read task); the staged dir
      // has one .gz part per input partition, which is exactly the
      // production mitigation (pre-chunked .gz parts).
      (s, dir) => {
        val tmp = stageCompressed(s, dir, "gzip", "graft_gz_dump")
        WikidataShredder
          .quantity(WikidataShredder.claims(WikidataShredder.parseFile(s, tmp)))
          .orderBy("src_id")
      },
      Some(quantityOracle)
    ),
    Q(
      "wd_parse_bz2",
      // Same ingestion chain through the bzip2 codec — the SPLITTABLE
      // compressed format, i.e. the one a single 100 TB dump file
      // should actually ship as (block-splittable: many read tasks per
      // file). Shredded to the edge table; oracle = wd_edge's union.
      (s, dir) => {
        val tmp = stageCompressed(s, dir, "bzip2", "graft_bz2_dump")
        WikidataShredder
          .edge(WikidataShredder.claims(WikidataShredder.parseFile(s, tmp)))
          .orderBy("src_id", "property_id", "dst_id")
      },
      Some(s"""SELECT * FROM (
             |$edgeUnionSql
             |) ORDER BY src_id, property_id, dst_id""".stripMargin)
    ),
    Q(
      "wd_id_codec",
      (s, dir) => {
        val base = Tables(s, dir).nation.select(col("n_nationkey").cast("long").as("n"))
        val n = col("n").cast("string")
        val ids = base
          .select(concat(lit("Q"), n).as("id_str"))
          .union(base.select(concat(lit("P"), n)))
          .union(base.select(concat(lit("L"), n)))
          .union(base.select(concat(lit("L"), n, lit("-F"), (pmod(col("n"), lit(5)) + 1).cast("string"))))
          .union(base.select(concat(lit("L"), n, lit("-S"), (pmod(col("n"), lit(3)) + 1).cast("string"))))
          .union(s.createDataFrame(
            Seq("@Quantity", "@Coordinate", "@String", "@DateTime", "@Entity").map(Tuple1(_)))
            .toDF("id_str"))
        ids
          .select(col("id_str"), IdCodec.idToU32(col("id_str")).as("u32"))
          .orderBy("id_str")
      },
      Some("""SELECT * FROM (
             |SELECT 'Q'||n_nationkey AS id_str, CAST(n_nationkey AS BIGINT) AS u32 FROM nation
             |UNION ALL SELECT 'P'||n_nationkey, 1000000000+n_nationkey FROM nation
             |UNION ALL SELECT 'L'||n_nationkey, 2000000000+n_nationkey FROM nation
             |UNION ALL SELECT 'L'||n_nationkey||'-F'||(n_nationkey%5+1),
             |  (n_nationkey + n_nationkey%5+1 + 5000000000) % 4294967296 FROM nation
             |UNION ALL SELECT 'L'||n_nationkey||'-S'||(n_nationkey%3+1),
             |  (n_nationkey + n_nationkey%3+1 + 5500000000) % 4294967296 FROM nation
             |UNION ALL SELECT * FROM (VALUES ('@Quantity', 4000000001), ('@Coordinate', 4000000002),
             |  ('@String', 4000000003), ('@DateTime', 4000000004), ('@Entity', 4000000005)) v(a, b)
             |) ORDER BY id_str""".stripMargin)
    ),
    Q(
      "wd_vertex",
      (s, dir) =>
        WikidataShredder
          .vertex(SyntheticDump.entities(s, dir))
          .orderBy("id"),
      Some(s"""SELECT * FROM (
             |SELECT $nIsBig AS id, n_name AS label,
             |  CASE WHEN n_nationkey%5=0 THEN NULL ELSE 'nation '||n_name END AS description FROM nation
             |UNION ALL SELECT 1000000040+r_regionkey, r_name, NULL FROM region
             |UNION ALL SELECT 2000000007, 'lex', 'a lexeme'
             |UNION ALL SELECT 5000000, 'solo', NULL
             |) ORDER BY id""".stripMargin)
    ),
    Q(
      "wd_edge",
      (s, dir) =>
        WikidataShredder
          .edge(WikidataShredder.claims(SyntheticDump.entities(s, dir)))
          .orderBy("src_id", "property_id", "dst_id"),
      Some(s"""SELECT * FROM (
             |$edgeUnionSql
             |) ORDER BY src_id, property_id, dst_id""".stripMargin)
    ),
    Q(
      "wd_string",
      (s, dir) =>
        WikidataShredder
          .string(WikidataShredder.claims(SyntheticDump.entities(s, dir)))
          .orderBy("src_id", "property_id", "string"),
      Some(s"""SELECT * FROM (
             |SELECT $nIsBig AS src_id, CAST(1000000003 AS BIGINT) AS property_id, $nIsBig AS dst_id, 'S-'||n_name AS "string" FROM nation
             |UNION ALL SELECT 10+n_nationkey, 1000000002, 10+n_nationkey, 'EXT-'||n_nationkey FROM nation
             |UNION ALL SELECT 10+n_nationkey, 1000000856, 10+n_nationkey, 'https://example.org/'||n_nationkey FROM nation
             |UNION ALL SELECT 10+n_nationkey, 1000001448, 10+n_nationkey, 'The '||n_name FROM nation
             |UNION ALL SELECT 2000000007, 1000000011, 2000000007, 'multi'
             |) ORDER BY src_id, property_id, "string"""".stripMargin)
    ),
    Q(
      "wd_quantity",
      (s, dir) =>
        WikidataShredder
          .quantity(WikidataShredder.claims(SyntheticDump.entities(s, dir)))
          .orderBy("src_id"),
      Some(quantityOracle)
    ),
    Q(
      "wd_stream_ingest",
      // Continuous dump ingestion: the dump lines arrive as a file
      // STREAM (written to a temp dir first, then readStream.text +
      // parseStream + the same shred operators), run to completion with
      // AvailableNow. The result must equal the batch shred of the same
      // dump — micro-batch boundaries cannot change a per-line shred.
      (s, dir) => {
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_dump").toString
        SyntheticDump.lines(s, dir).write.mode("overwrite").text(tmp)
        implicit val enc = org.apache.spark.sql.Encoders.STRING
        val src = s.readStream.text(tmp).as[String]
        val out = WikidataShredder.quantity(
          WikidataShredder.claims(WikidataShredder.parseStream(src)))
        val name = s"graft_wdingest_${System.nanoTime()}"
        val query = out.writeStream
          .format("memory")
          .queryName(name)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        val drained = graft.streaming.MemoryResult.drain(s, name)(_.orderBy("src_id"))
        // input temp dir fully consumed into the drained checkpoint
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
        drained
      },
      Some(quantityOracle)
    ),
    Q(
      "wd_coordinates",
      (s, dir) =>
        WikidataShredder
          .coordinates(WikidataShredder.claims(SyntheticDump.entities(s, dir)))
          .orderBy("src_id"),
      Some(s"""SELECT $nIsBig AS src_id, CAST(1000000625 AS BIGINT) AS property_id, $nIsBig AS dst_id,
             |CAST(n_nationkey*2.5 - 25.0 AS DOUBLE) AS latitude,
             |CAST(n_regionkey*10.0 - 20.0 AS DOUBLE) AS longitude,
             |CAST(0.01 AS DOUBLE) AS "precision",
             |CAST(2 AS BIGINT) AS globe_id
             |FROM nation ORDER BY src_id""".stripMargin)
    ),
    Q(
      "wd_coord_zorder",
      // Z-order (Morton) clustering key for the coordinates table — the
      // layout that makes geo BOX queries prunable: sorting by the
      // interleaved-bit code co-locates spatially-near points, so a
      // lat/lon range predicate touches O(few) parquet row groups via
      // min/max stats instead of the whole table. Codes are pure
      // integer bit-twiddling over the half-degree grid (the synthetic
      // coordinates are exact multiples of 0.5), identical in both
      // engines. At 100 TB the write path is repartitionByRange(morton)
      // + sortWithinPartitions(morton) into parquet — same recipe
      // ShreddedLayout uses for src_id, keyed by the curve instead.
      (s, dir) => {
        val spread = (c: String) =>
          s"""(((($c | shiftleft($c, 8)) & 16711935)
             |  | shiftleft((($c | shiftleft($c, 8)) & 16711935), 4)) & 252645135)""".stripMargin
        // two spread rounds inline (8,4) then (2,1) on the result
        def full(c: String): String = {
          val s1 = spread(c)
          val s2 = s"((($s1 | shiftleft($s1, 2)) & 858993459))"
          s"((($s2 | shiftleft($s2, 1)) & 1431655765))"
        }
        WikidataShredder
          .coordinates(WikidataShredder.claims(SyntheticDump.entities(s, dir)))
          .withColumn("lat_g", expr("CAST(latitude * 2 + 180 AS BIGINT)"))
          .withColumn("lon_g", expr("CAST(longitude * 2 + 360 AS BIGINT)"))
          .withColumn("morton", expr(s"${full("lat_g")} | shiftleft(${full("lon_g")}, 1)"))
          .select("morton", "src_id", "latitude", "longitude")
          .orderBy("morton", "src_id")
      },
      Some(s"""WITH c AS (SELECT $nIsBig AS src_id,
             |  CAST(n_nationkey*2.5 - 25.0 AS DOUBLE) AS latitude,
             |  CAST(n_regionkey*10.0 - 20.0 AS DOUBLE) AS longitude FROM nation),
             |g AS (SELECT src_id, latitude, longitude,
             |  CAST(latitude * 2 + 180 AS BIGINT) AS a0, CAST(longitude * 2 + 360 AS BIGINT) AS b0 FROM c),
             |s1 AS (SELECT *, (a0 | (a0 << 8)) & 16711935 AS a1, (b0 | (b0 << 8)) & 16711935 AS b1 FROM g),
             |s2 AS (SELECT *, (a1 | (a1 << 4)) & 252645135 AS a2, (b1 | (b1 << 4)) & 252645135 AS b2 FROM s1),
             |s3 AS (SELECT *, (a2 | (a2 << 2)) & 858993459 AS a3, (b2 | (b2 << 2)) & 858993459 AS b3 FROM s2),
             |s4 AS (SELECT *, (a3 | (a3 << 1)) & 1431655765 AS a4, (b3 | (b3 << 1)) & 1431655765 AS b4 FROM s3)
             |SELECT (a4 | (b4 << 1)) AS morton, src_id, latitude, longitude
             |FROM s4 ORDER BY morton, src_id""".stripMargin)
    ),
    Q(
      "wd_time",
      (s, dir) =>
        WikidataShredder
          .time(WikidataShredder.claims(SyntheticDump.entities(s, dir)))
          .select("src_id", "property_id", "dst_id", "time_micros", "time_str", "precision")
          .orderBy("src_id"),
      // time_micros oracle: DuckDB parses the signed BC rendering
      // natively ('-0503-03-11 ...'::TIMESTAMP, proleptic Gregorian,
      // astronomical years) — epoch_us of that must equal the engine's
      // BIGINT days-from-civil arithmetic, BC rows included.
      Some(s"""SELECT $nIsBig AS src_id, CAST(1000000571 AS BIGINT) AS property_id, $nIsBig AS dst_id,
             |CASE WHEN n_nationkey%7=0 THEN NULL
             |     ELSE epoch_us((CASE
             |       WHEN n_nationkey%5=0 THEN (1950+n_nationkey)||'-01-01 00:00:00'
             |       WHEN n_nationkey%3=0 THEN '-0'||(500+n_nationkey)||'-03-11 00:00:00'
             |       ELSE (1950+n_nationkey)||'-03-11 00:00:00' END)::TIMESTAMP) END AS time_micros,
             |CASE WHEN n_nationkey%7=0 THEN 'infinity'
             |     WHEN n_nationkey%5=0 THEN (1950+n_nationkey)||'-01-01 00:00:00'
             |     WHEN n_nationkey%3=0 THEN '-0'||(500+n_nationkey)||'-03-11 00:00:00'
             |     ELSE (1950+n_nationkey)||'-03-11 00:00:00' END AS time_str,
             |CASE WHEN n_nationkey%7=0 OR n_nationkey%5=0 THEN 9 ELSE 11 END AS "precision"
             |FROM nation ORDER BY src_id""".stripMargin)
    ),
    Q(
      "wd_rank_filter",
      (s, dir) =>
        WikidataShredder
          .claims(SyntheticDump.entities(s, dir))
          .groupBy("property_id")
          .agg(count(lit(1)).as("n"))
          .orderBy("property_id"),
      Some("""SELECT * FROM (
             |SELECT CAST(1000000002 AS BIGINT) AS property_id, (SELECT COUNT(*) FROM nation) AS n
             |UNION ALL SELECT 1000000003, (SELECT COUNT(*) FROM nation)
             |UNION ALL SELECT 1000000005, (SELECT COUNT(*) FROM nation)
             |UNION ALL SELECT 1000000006, (SELECT COUNT(*) FROM nation)
             |UNION ALL SELECT 1000000007, (SELECT COUNT(*) FROM nation)
             |UNION ALL SELECT 1000000008, 1
             |UNION ALL SELECT 1000000009, 1
             |UNION ALL SELECT 1000000011, 1
             |UNION ALL SELECT 1000000012, 1
             |UNION ALL SELECT 1000000031, (SELECT COUNT(*) FROM nation)+(SELECT COUNT(*) FROM region)
             |UNION ALL SELECT 1000000571, (SELECT COUNT(*) FROM nation)
             |UNION ALL SELECT 1000000625, (SELECT COUNT(*) FROM nation)
             |UNION ALL SELECT 1000000856, (SELECT COUNT(*) FROM nation)
             |UNION ALL SELECT 1000001082, (SELECT COUNT(*) FROM nation)
             |UNION ALL SELECT 1000001448, (SELECT COUNT(*) FROM nation)
             |) ORDER BY property_id""".stripMargin)
    ),
    Q(
      "wd_best_rank",
      // BEST-RANK (truthy, wdt:-namespace) statement selection — the
      // Wikidata semantics one level above wd_rank_filter's
      // deprecated-drop: within each (entity, property), a PREFERRED
      // statement suppresses the normal ones; absent any preferred,
      // all normals are best. The fixture's P7 carries only
      // preferred(+dropped deprecated), so a normal P7 competitor is
      // INJECTED per nation (dst Q(300+n)) — its suppression is the
      // oracle's test: the injected rows must NOT appear.
      //
      // Scale posture: best-rank is a per-(src, property) max of a
      // 2-valued weight — one map-side-combined aggregation producing
      // a keys-sized frame, joined back on the same key (one shuffle
      // pair, no data-sized window). At 100 TB this is the standard
      // aggregate-then-semi-join shape.
      (s, dir) => {
        val base = WikidataShredder.entityEdgesWithRank(SyntheticDump.entities(s, dir))
        val injected = Tables(s, dir).nation.select(
          (col("n_nationkey").cast("long") + 10L).as("src_id"),
          lit(1000000007L).as("property_id"),
          lit("normal").as("rank"),
          (col("n_nationkey").cast("long") + 300L).as("dst_id"))
        val all = base.unionByName(injected)
        def w = when(col("rank") === "preferred", 2L).otherwise(1L)
        val best = all
          .groupBy("src_id", "property_id")
          .agg(max(w).as("best_w"))
        all
          .join(best, Seq("src_id", "property_id"))
          .filter(w === col("best_w"))
          .select("src_id", "property_id", "dst_id", "rank")
          .orderBy("src_id", "property_id", "dst_id")
      },
      Some(s"""SELECT * FROM (
             |SELECT $nIsBig AS src_id, CAST(1000000031 AS BIGINT) AS property_id, CAST(100+n_regionkey AS BIGINT) AS dst_id, 'normal' AS "rank" FROM nation
             |UNION ALL SELECT 10+n_nationkey, 1000000007, 200+n_nationkey, 'preferred' FROM nation
             |UNION ALL SELECT 1000000040+r_regionkey, 1000000031, 300+r_regionkey, 'normal' FROM region
             |UNION ALL SELECT 2000000007, 1000000008, 705032713, 'normal'
             |UNION ALL SELECT 2000000007, 1000000009, 1205032714, 'normal'
             |) ORDER BY src_id, property_id, dst_id""".stripMargin)
    ),
    Q(
      "wd_upsert_vertex",
      // dump-refresh merge: a newer partial dump (changed labels + new
      // entities) upserts into the existing vertex table, latest wins —
      // union + per-id row_number on version, the scalable merge shape
      // (one shuffle on id; no driver-side diffing).
      (s, dir) => {
        val t = Tables(s, dir)
        val v1 = WikidataShredder
          .vertex(SyntheticDump.entities(s, dir))
          .select(col("id"), col("label"), lit(1).as("version"))
        val n = col("n_nationkey").cast("long")
        val updates = t.nation
          .filter(pmod(n, lit(4)) === 0)
          .select((n + 10).as("id"), concat(col("n_name"), lit(" v2")).as("label"), lit(2).as("version"))
          .union(t.region.select(
            (col("r_regionkey").cast("long") + 500).as("id"),
            concat(col("r_name"), lit(" new")).as("label"),
            lit(2).as("version")))
        val w = Window.partitionBy("id").orderBy(col("version").desc)
        v1.union(updates)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("id", "label")
          .orderBy("id")
      },
      Some("""SELECT * FROM (
             |SELECT CAST(10+n_nationkey AS BIGINT) AS id,
             |  CASE WHEN n_nationkey%4=0 THEN n_name||' v2' ELSE n_name END AS label FROM nation
             |UNION ALL SELECT 1000000040+r_regionkey, r_name FROM region
             |UNION ALL SELECT 2000000007, 'lex'
             |UNION ALL SELECT 5000000, 'solo'
             |UNION ALL SELECT 500+r_regionkey, r_name||' new' FROM region
             |) ORDER BY id""".stripMargin)
    ),
    Q(
      "wd_dump_diff",
      // Snapshot CDC: what changed between yesterday's shred and
      // today's — added / removed / changed rows with both labels, the
      // incremental-refresh primitive for consumers who must not
      // re-read a full dump (the reference's users re-shred from
      // scratch; at 100 TB the diff IS the product). The v2 snapshot is
      // derived deterministically from v1 (every 5th nation entity
      // removed, every 4th remaining relabeled, the region "new"
      // entities added) so the oracle reconstructs both sides
      // relationally. The diff itself is ONE full-outer join on the
      // entity id — a single co-partitioned shuffle, no driver-side
      // comparison; a production deployment buckets both snapshots by
      // id so even that shuffle drops away on refresh N+1.
      (s, dir) => {
        val t = Tables(s, dir)
        val v1 = WikidataShredder
          .vertex(SyntheticDump.entities(s, dir))
          .select(col("id"), col("label"))
        val isNation = col("id") < 1000 // nation vertex ids are 10..34
        val v2 = v1
          .filter(!(isNation && pmod(col("id") - 10, lit(5)) === 0))
          .withColumn(
            "label",
            when(isNation && pmod(col("id") - 10, lit(4)) === 0, concat(col("label"), lit(" v2")))
              .otherwise(col("label")))
          .union(t.region.select(
            (col("r_regionkey").cast("long") + 500).as("id"),
            concat(col("r_name"), lit(" new")).as("label")))
        v1.as("a")
          .join(v2.as("b"), Seq("id"), "full_outer")
          .withColumn(
            "change",
            when(col("a.label").isNull, "added")
              .when(col("b.label").isNull, "removed")
              .when(col("a.label") =!= col("b.label"), "changed"))
          .filter(col("change").isNotNull)
          .select(col("id"), col("change"), col("a.label").as("old_label"), col("b.label").as("new_label"))
          .orderBy("id")
      },
      Some("""WITH v1 AS (
             |  SELECT CAST(10+n_nationkey AS BIGINT) AS id, n_name AS label FROM nation
             |  UNION ALL SELECT 1000000040+r_regionkey, r_name FROM region
             |  UNION ALL SELECT 2000000007, 'lex'
             |  UNION ALL SELECT 5000000, 'solo'),
             |v2 AS (
             |  SELECT id, CASE WHEN id < 1000 AND (id-10)%4=0 THEN label||' v2' ELSE label END AS label
             |  FROM v1 WHERE NOT (id < 1000 AND (id-10)%5=0)
             |  UNION ALL SELECT 500+r_regionkey, r_name||' new' FROM region)
             |SELECT COALESCE(a.id, b.id) AS id,
             |  CASE WHEN a.label IS NULL THEN 'added'
             |       WHEN b.label IS NULL THEN 'removed'
             |       WHEN a.label <> b.label THEN 'changed' END AS change,
             |  a.label AS old_label, b.label AS new_label
             |FROM v1 a FULL OUTER JOIN v2 b ON a.id = b.id
             |WHERE (CASE WHEN a.label IS NULL THEN 'added'
             |            WHEN b.label IS NULL THEN 'removed'
             |            WHEN a.label <> b.label THEN 'changed' END) IS NOT NULL
             |ORDER BY id""".stripMargin)
    ),
    Q(
      "wd_query_labels",
      // Consumer-side graph query: resolve edge targets to their labels
      // (edge JOIN vertex ON dst_id=id) — the reference's users do this
      // against the DuckDB file; only dst ids with a vertex row match
      // (here: the novalue/somevalue self-loops).
      (s, dir) => {
        // one dump synthesis shared by the edge and vertex parses
        val ents = graft.GraftCache.register(SyntheticDump.entities(s, dir).persist())
        val edge = WikidataShredder.edge(WikidataShredder.claims(ents))
        val vertex = WikidataShredder.vertex(ents)
        edge
          .join(vertex, col("dst_id") === col("id"))
          .select(col("src_id"), col("property_id"), col("dst_id"), col("label").as("dst_label"))
          .orderBy("src_id", "property_id")
      },
      Some("""SELECT * FROM (
             |SELECT CAST(10+n_nationkey AS BIGINT) AS src_id, CAST(1000000005 AS BIGINT) AS property_id,
             |       CAST(10+n_nationkey AS BIGINT) AS dst_id, n_name AS dst_label FROM nation
             |UNION ALL SELECT 10+n_nationkey, 1000000006, 10+n_nationkey, n_name FROM nation
             |UNION ALL SELECT 2000000007, 1000000012, 2000000007, 'lex'
             |) ORDER BY src_id, property_id""".stripMargin)
    ),
    Q(
      "wd_sql_consumer",
      // The AD-HOC SQL surface — the reference's actual consumption
      // mode: main.rs produces a DuckDB FILE whose users speak raw SQL
      // at vertex/edge tables (reference lib.rs / value.rs table
      // layout), so a graft user must be able to run the SAME SENTENCE
      // without learning the DataFrame API. The shred AND a snapshot
      // landing table register as catalog views on an isolated session
      // (newSession: the session-scoped temp catalog, no cross-query
      // leakage), and the consumer query is ONE raw `spark.sql(...)`
      // string — a label-resolved in-degree profile over the graph
      // UNION'd with a priority profile over the landing table. Spark
      // parses, plans and optimizes the text through the same Catalyst
      // path as the DataFrame ops (pushdown/pruning identical), so
      // this is surface, not a second engine.
      //
      // Scale posture: the views are lazy plans over the same shred/
      // manifest reads every other operator uses — registering a view
      // costs nothing; the SQL text compiles to the exact join+agg DAG
      // its DataFrame twin would.
      (s0, dir) => {
        val s = s0.newSession()
        val ents = graft.GraftCache.register(SyntheticDump.entities(s, dir).persist())
        WikidataShredder.vertex(ents).createOrReplaceTempView("wd_vertex")
        WikidataShredder.edge(WikidataShredder.claims(ents))
          .createOrReplaceTempView("wd_edge")
        val table = graft.Stage.dir("graft_sqlconsumer_", dir).getPath
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(table))
        graft.sources.SnapshotTable.commit(
          Tables(s, dir).orders.select("o_orderkey", "o_custkey", "o_orderpriority"),
          table, append = false)
        graft.sources.SnapshotTable.read(s, table)
          .createOrReplaceTempView("landing_orders")
        s.sql("""
          SELECT v.label AS entity,
                 COUNT(*) AS n_in,
                 COUNT(DISTINCT e.property_id) AS n_props
          FROM wd_edge e JOIN wd_vertex v ON e.dst_id = v.id
          GROUP BY v.label
          UNION ALL
          SELECT 'orders_' || o_orderpriority,
                 COUNT(*),
                 COUNT(DISTINCT o_custkey)
          FROM landing_orders
          GROUP BY o_orderpriority
          ORDER BY entity""")
      },
      Some("""WITH m AS (
             |SELECT CAST(1000000005 AS BIGINT) AS property_id, n_name AS dst_label FROM nation
             |UNION ALL SELECT 1000000006, n_name FROM nation
             |UNION ALL SELECT 1000000012, 'lex')
             |SELECT * FROM (
             |SELECT dst_label AS entity, COUNT(*)::BIGINT AS n_in,
             |       COUNT(DISTINCT property_id)::BIGINT AS n_props
             |FROM m GROUP BY 1
             |UNION ALL
             |SELECT 'orders_' || o_orderpriority, COUNT(*)::BIGINT,
             |       COUNT(DISTINCT o_custkey)::BIGINT
             |FROM orders GROUP BY o_orderpriority
             |) ORDER BY entity""".stripMargin)
    ),
    Q(
      "wd_query_2hop",
      // 2-hop traversal: edge a JOIN edge b ON a.dst_id = b.src_id,
      // path counts per (property, property) pair.
      (s, dir) => {
        // persisted: both sides of the self-join would otherwise re-run
        // the dump parse; self-contained instead of relying on another
        // query's cache being resident (GraftCache-registered)
        val edge = graft.GraftCache.register(
          WikidataShredder.edge(
            WikidataShredder.claims(SyntheticDump.entities(s, dir))).persist())
        edge
          .as("a")
          .join(edge.as("b"), col("a.dst_id") === col("b.src_id"))
          .groupBy(col("a.property_id").as("p_first"), col("b.property_id").as("p_second"))
          .agg(count(lit(1)).as("n_paths"))
          .orderBy("p_first", "p_second")
      },
      Some("""SELECT * FROM (
             |SELECT pa.p AS p_first, pb.p AS p_second, (SELECT COUNT(*) FROM nation) AS n_paths
             |FROM (VALUES (CAST(1000000005 AS BIGINT)), (CAST(1000000006 AS BIGINT))) pa(p)
             |CROSS JOIN (VALUES (CAST(1000000005 AS BIGINT)), (CAST(1000000006 AS BIGINT)),
             |                   (CAST(1000000007 AS BIGINT)), (CAST(1000000031 AS BIGINT))) pb(p)
             |UNION ALL SELECT * FROM (VALUES
             |  (CAST(1000000012 AS BIGINT), CAST(1000000008 AS BIGINT), CAST(1 AS BIGINT)),
             |  (CAST(1000000012 AS BIGINT), CAST(1000000009 AS BIGINT), CAST(1 AS BIGINT)),
             |  (CAST(1000000012 AS BIGINT), CAST(1000000012 AS BIGINT), CAST(1 AS BIGINT))) v(a, b, c)
             |) ORDER BY p_first, p_second""".stripMargin)
    ),
    Q(
      "wd_query_path_closure",
      // Bounded transitive closure — the P279*/P31* ancestor walk that is
      // the canonical consumer query over the reference's edge table
      // (class-hierarchy traversal via repeated src_id=dst_id joins;
      // DuckDB consumers write it as a recursive CTE, which is exactly
      // the oracle here). Spark-first shape: BFS by iterated equi-joins
      // with the depth bound unrolled into the plan — each hop is one
      // shuffle on the join key, the frontier stays a projection (no
      // driver-side loop state), and min(depth) dedups path multiplicity
      // with a partial-first aggregate. At 100 TB each hop would reuse
      // the edge table's bucketing on src_id, so hops co-locate.
      (s, dir) => {
        val edge = graft.GraftCache.register(
          WikidataShredder
            .edge(WikidataShredder.claims(SyntheticDump.chainEntities(s, dir)))
            .filter(col("property_id") === 1000000279L)
            .select(col("src_id"), col("dst_id"))
            .persist())
        val base = edge.withColumn("depth", lit(1L))
        val paths = (2 to 3)
          .foldLeft((base, base)) { case ((acc, frontier), _) =>
            val next = frontier
              .as("f")
              .join(edge.as("e"), col("f.dst_id") === col("e.src_id"))
              .select(col("f.src_id"), col("e.dst_id"), (col("f.depth") + 1).as("depth"))
            (acc.unionByName(next), next)
          }
          ._1
        paths
          .groupBy("src_id", "dst_id")
          .agg(min(col("depth")).as("depth"))
          .orderBy("src_id", "dst_id")
      },
      Some("""WITH RECURSIVE e AS (
             |  SELECT CAST(10+n_nationkey AS BIGINT) AS src_id,
             |         CAST(10 + n_nationkey//2 AS BIGINT) AS dst_id FROM nation),
             |anc AS (
             |  SELECT src_id, dst_id, CAST(1 AS BIGINT) AS depth FROM e
             |  UNION ALL
             |  SELECT a.src_id, e.dst_id, a.depth + 1 FROM anc a
             |  JOIN e ON a.dst_id = e.src_id WHERE a.depth < 3)
             |SELECT src_id, dst_id, MIN(depth) AS depth FROM anc
             |GROUP BY src_id, dst_id ORDER BY src_id, dst_id""".stripMargin)
    ),
    Q(
      "wd_query_typed_filter",
      // Typed-value filter + label resolution: population-style quantity
      // claims above a threshold, joined back to the vertex label.
      (s, dir) => {
        val ents = graft.GraftCache.register(SyntheticDump.entities(s, dir).persist())
        val quantity = WikidataShredder.quantity(WikidataShredder.claims(ents))
        val vertex = WikidataShredder.vertex(ents)
        quantity
          .filter(col("amount") > 12000.0)
          .join(vertex, col("src_id") === col("id"))
          .select(col("src_id"), col("label"), col("amount"), col("unit_id"))
          .orderBy("src_id")
      },
      Some("""SELECT CAST(10+n_nationkey AS BIGINT) AS src_id, n_name AS label,
             |CAST(n_nationkey*1000 + 500.25 AS DOUBLE) AS amount,
             |CASE WHEN n_nationkey%3=0 THEN NULL ELSE CAST(4917 AS BIGINT) END AS unit_id
             |FROM nation WHERE n_nationkey*1000 + 500.25 > 12000.0 ORDER BY src_id""".stripMargin)
    ),
    Q(
      "wd_entity_search",
      // Consumer entity lookup — "find the entity by words in its label
      // or description", the query every reference user types before
      // anything else (the DuckDB file answers it with ILIKE scans).
      // Graft answers through the inverted-index shape the text family
      // uses: lowercase-tokenize label+description, restrict postings
      // to the query terms DURING the narrow explode (never a full
      // posting build), rank by distinct terms matched then total tf
      // then id. Search hits span labels ("lex", "solo", region names)
      // and description-only matches ("nation ..." descriptions), so
      // both fields provably participate.
      //
      // Scale posture: tokenize+filter is narrow map work; the only
      // shuffles are the entity-keyed rollup and the label-resolve join
      // of a result-sized frame back to vertex (both tiny next to a
      // dump-sized scan). At 100 TB the same plan persists the postings
      // once and every search reuses them.
      (s, dir) => {
        val ents = graft.GraftCache.register(SyntheticDump.entities(s, dir).persist())
        val v = WikidataShredder.vertex(ents)
        val terms = Seq("nation", "lex", "solo", "asia")
        val hits = v
          .select(
            col("id"),
            explode(split(lower(concat_ws(" ", col("label"), col("description"))), " ")).as("term"))
          .filter(col("term").isin(terms: _*))
          .groupBy("id")
          .agg(countDistinct(col("term")).as("n_terms"), count(lit(1)).as("tf"))
        hits
          .join(v.select("id", "label"), "id")
          .select(col("id"), col("label"), col("n_terms"), col("tf"))
          .orderBy(col("n_terms").desc, col("tf").desc, col("id"))
      },
      Some(s"""WITH v AS (
             |SELECT $nIsBig AS id, n_name AS label,
             |  CASE WHEN n_nationkey%5=0 THEN NULL ELSE 'nation '||n_name END AS description FROM nation
             |UNION ALL SELECT 1000000040+r_regionkey, r_name, NULL FROM region
             |UNION ALL SELECT 2000000007, 'lex', 'a lexeme'
             |UNION ALL SELECT 5000000, 'solo', NULL),
             |tok AS (SELECT id, g AS term
             |  FROM v, UNNEST(string_split(lower(concat_ws(' ', label, description)), ' ')) AS t(g)
             |  WHERE g IN ('nation', 'lex', 'solo', 'asia')),
             |agg AS (SELECT id, COUNT(DISTINCT term)::BIGINT AS n_terms, COUNT(*)::BIGINT AS tf
             |        FROM tok GROUP BY id)
             |SELECT agg.id, v.label, n_terms, tf FROM agg JOIN v USING (id)
             |ORDER BY n_terms DESC, tf DESC, id""".stripMargin)
    ),
    Q(
      "wd_shred_orders",
      // Scale-proportional ingestion: build + parse + shred one entity
      // per orders row (~150k at sf0.1); output the quantity table.
      (s, dir) =>
        WikidataShredder
          .quantity(WikidataShredder.claims(SyntheticDump.ordersEntities(s, dir)))
          .orderBy("src_id"),
      Some("""SELECT CAST(3000000+o_orderkey AS BIGINT) AS src_id,
             |CAST(1000000021 AS BIGINT) AS property_id,
             |CAST(3000000+o_orderkey AS BIGINT) AS dst_id,
             |CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS amount,
             |CAST(NULL AS DOUBLE) AS lower_bound, CAST(NULL AS DOUBLE) AS upper_bound,
             |CAST(NULL AS BIGINT) AS unit_id
             |FROM orders ORDER BY src_id""".stripMargin)
    ),
    Q(
      "wd_sink_layout",
      // The reference's end artifact: shred -> materialize ALL 6 tables
      // with the indexed layout (partition-by-property-bucket, sorted by
      // src_id; ShreddedLayout) -> reopen from disk and count. The
      // oracle reconstructs the expected counts relationally, so this is
      // a full write-path + read-path round trip under the driver gate.
      (s, dir) => {
        val base = s"${System.getProperty("java.io.tmpdir")}/graft_layout_" +
          java.lang.Integer.toHexString(dir.hashCode)
        ShreddedLayout.write(WikidataShredder.shred(SyntheticDump.entities(s, dir)), base)
        Seq("coordinates", "edge", "quantity", "string", "time", "vertex")
          .map { nm =>
            ShreddedLayout
              .read(s, base, nm)
              .agg(count(lit(1)).as("n_rows"))
              .withColumn("table_name", lit(nm))
          }
          .reduce(_.unionByName(_))
          .select("table_name", "n_rows")
          .orderBy("table_name")
      },
      Some("""SELECT * FROM (
             |SELECT 'coordinates' AS table_name, (SELECT COUNT(*) FROM nation) AS n_rows
             |UNION ALL SELECT 'edge', 4*(SELECT COUNT(*) FROM nation)+(SELECT COUNT(*) FROM region)+3
             |UNION ALL SELECT 'quantity', (SELECT COUNT(*) FROM nation)
             |UNION ALL SELECT 'string', 4*(SELECT COUNT(*) FROM nation)+1
             |UNION ALL SELECT 'time', (SELECT COUNT(*) FROM nation)
             |UNION ALL SELECT 'vertex', (SELECT COUNT(*) FROM nation)+(SELECT COUNT(*) FROM region)+2
             |) ORDER BY table_name""".stripMargin)
    ),
    Q(
      "wd_pipeline",
      (s, dir) => {
        val sh = WikidataShredder.shred(SyntheticDump.entities(s, dir))
        sh.all
          .map { case (nm, df) =>
            df.agg(count(lit(1)).as("n_rows")).withColumn("table_name", lit(nm))
          }
          .reduce(_.unionByName(_))
          .select("table_name", "n_rows")
          .orderBy("table_name")
      },
      Some("""SELECT * FROM (
             |SELECT 'coordinates' AS table_name, (SELECT COUNT(*) FROM nation) AS n_rows
             |UNION ALL SELECT 'edge', 4*(SELECT COUNT(*) FROM nation)+(SELECT COUNT(*) FROM region)+3
             |UNION ALL SELECT 'quantity', (SELECT COUNT(*) FROM nation)
             |UNION ALL SELECT 'string', 4*(SELECT COUNT(*) FROM nation)+1
             |UNION ALL SELECT 'time', (SELECT COUNT(*) FROM nation)
             |UNION ALL SELECT 'vertex', (SELECT COUNT(*) FROM nation)+(SELECT COUNT(*) FROM region)+2
             |) ORDER BY table_name""".stripMargin)
    ),
    Q(
      "wd_property_stats",
      // Property-usage dashboard — the first query every Wikidata
      // consumer runs against the shredded store ("which properties
      // carry how many claims of which value kind"), mirroring
      // Wikidata's own property-statistics page. One shred pass, one
      // property-keyed count per typed table, one union.
      //
      // Scale posture: per-table counts are map-side-combined on the
      // property key (property cardinality is tiny vs claims); the
      // union is of aggregate-sized frames.
      (s, dir) => {
        val sh = WikidataShredder.shred(SyntheticDump.entities(s, dir))
        sh.all
          .filter(_._1 != "vertex")
          .map { case (nm, df) =>
            df.groupBy("property_id")
              .agg(count(lit(1)).as("n_claims"))
              .withColumn("kind", lit(nm))
              .select("kind", "property_id", "n_claims")
          }
          .reduce(_.unionByName(_))
          .orderBy("kind", "property_id")
      },
      Some("""WITH nn AS (SELECT COUNT(*)::BIGINT AS n FROM nation),
             |rr AS (SELECT COUNT(*)::BIGINT AS r FROM region)
             |SELECT * FROM (
             |  SELECT 'coordinates' AS kind, CAST(1000000625 AS BIGINT) AS property_id, n AS n_claims FROM nn
             |  UNION ALL SELECT 'edge', 1000000005, n FROM nn
             |  UNION ALL SELECT 'edge', 1000000006, n FROM nn
             |  UNION ALL SELECT 'edge', 1000000007, n FROM nn
             |  UNION ALL SELECT 'edge', 1000000008, 1
             |  UNION ALL SELECT 'edge', 1000000009, 1
             |  UNION ALL SELECT 'edge', 1000000012, 1
             |  UNION ALL SELECT 'edge', 1000000031, nn.n + rr.r FROM nn, rr
             |  UNION ALL SELECT 'quantity', 1000001082, n FROM nn
             |  UNION ALL SELECT 'string', 1000000002, n FROM nn
             |  UNION ALL SELECT 'string', 1000000003, n FROM nn
             |  UNION ALL SELECT 'string', 1000000011, 1
             |  UNION ALL SELECT 'string', 1000000856, n FROM nn
             |  UNION ALL SELECT 'string', 1000001448, n FROM nn
             |  UNION ALL SELECT 'time', 1000000571, n FROM nn
             |) ORDER BY kind, property_id""".stripMargin)
    ),
    Q(
      "wd_pagerank",
      // PageRank over the shredded entity graph — the canonical "what
      // matters in this knowledge graph" consumer query. Three damped
      // iterations (d=0.85) UNROLLED into one Catalyst DAG; every rank
      // is a BIGINT in 1e-12 units and every division is integral
      // (floor), so the result is bit-exact across engines — no float
      // ever enters the recurrence. Dangling mass is dropped (pure
      // push model), identically on both sides.
      //
      // Scale posture: per iteration the contribution pass is one join
      // of edges against the rank vector on src_id (both co-partitioned
      // on the same key across iterations — on a cluster the edge table
      // is hash-bucketed once and every hop reuses it) followed by a
      // partial-first SUM on dst_id. Rank and degree vectors are
      // vertex-sized. With more iterations you would checkpoint the
      // rank vector every few hops to cap lineage growth; at 3 unrolled
      // hops the DAG is shallow enough not to need it.
      (s, dir) => {
        val edge = WikidataShredder
          .edge(WikidataShredder.claims(SyntheticDump.entities(s, dir)))
          .select("src_id", "dst_id")
        pagerankKernel(edge)
          .select(col("id").as("vertex_id"), col("r").as("rank_units"))
          .orderBy(col("rank_units").desc, col("vertex_id"))
      },
      Some {
        val iters = (1 to 3)
          .map { i =>
            val prev = if (i == 1) "r0" else s"r${i - 1}"
            s"""s$i AS (SELECT e.dst_id AS id, SUM($prev.r // deg.d)::BIGINT AS inc
               |      FROM edge e JOIN $prev ON e.src_id = $prev.id JOIN deg ON e.src_id = deg.id GROUP BY 1),
               |r$i AS (SELECT v.id, ((15 * (1000000000000 // p.n)) // 100 + (85 * COALESCE(s$i.inc, 0)) // 100)::BIGINT AS r
               |      FROM v CROSS JOIN p LEFT JOIN s$i ON v.id = s$i.id)"""
          }
          .mkString(",\n")
        s"""WITH edge AS (SELECT src_id, dst_id FROM ($edgeUnionSql)),
           |deg AS (SELECT src_id AS id, COUNT(*)::BIGINT AS d FROM edge GROUP BY 1),
           |v AS (SELECT DISTINCT id FROM (SELECT src_id AS id FROM edge UNION ALL SELECT dst_id FROM edge)),
           |p AS (SELECT COUNT(*)::BIGINT AS n FROM v),
           |r0 AS (SELECT v.id, (1000000000000 // p.n)::BIGINT AS r FROM v CROSS JOIN p),
           |$iters
           |SELECT id AS vertex_id, r AS rank_units FROM r3
           |ORDER BY rank_units DESC, vertex_id""".stripMargin
      }
    ),
    Q(
      "wd_connected_components",
      // Connected components over the shredded entity graph, iterated
      // to a CONVERGENCE-CHECKED fixpoint (unlike dedup_cluster_assign's
      // deliberately fixed two rounds): min-label propagation, loop
      // while any label changed — driven by the shared
      // [[graphSession]]/[[symmetricGraph]]/[[fixpoint]] harness it
      // shares with wd_shortest_path. The fixpoint (every vertex
      // labeled with its component's minimum id) is unique, so the
      // result is deterministic regardless of round count — which is
      // what lets a data-dependent driver loop coexist with the
      // oracle hash.
      //
      // Scale posture: the symmetric adjacency (self-edges added, so a
      // vertex's own label rides the same aggregate and no second
      // join is needed) is REPARTITIONED BY THE JOIN KEY once and
      // persisted — every round's join reuses that cached partitioning
      // and only ships the vertex-sized label vector; the min is
      // map-side combined. The convergence probe is monotone: labels
      // only decrease, so the DECIMAL label sum is strictly smaller
      // iff any label changed — one scalar aggregate per round to the
      // driver, never a data collect, no compare-join. The label
      // vector is re-persisted per round and the predecessor freed, so
      // state is the adjacency plus 2 vertex-sized caches regardless
      // of rounds. Round count is bounded by graph diameter; for a
      // high-diameter graph at 100 TB you would switch the recurrence
      // to large-star/small-star (Kiveris et al., "Connected Components
      // in MapReduce and Beyond"), which converges in O(log n) rounds
      // with the same per-round join shape — the harness loop,
      // convergence probe, and cache rotation carry over unchanged.
      (s0, dir) => {
        val s = graphSession(s0)
        val (sym, verts) = symmetricGraph(s, dir)
        val (labels, _) = ccMinLabelKernel(sym, verts)
        labels
          .select(col("id").as("vertex_id"), col("comp").as("component_id"))
          .orderBy("vertex_id")
      },
      Some(s"""WITH RECURSIVE e AS (SELECT src_id, dst_id FROM ($edgeUnionSql)),
             |u AS (SELECT src_id AS a, dst_id AS b FROM e WHERE src_id <> dst_id
             |      UNION SELECT dst_id, src_id FROM e WHERE src_id <> dst_id),
             |v AS (SELECT DISTINCT id FROM (SELECT src_id AS id FROM e UNION ALL SELECT dst_id FROM e)),
             |reach(x, y) AS (
             |  SELECT id, id FROM v
             |  UNION
             |  SELECT r.x, u.b FROM reach r JOIN u ON r.y = u.a
             |)
             |SELECT x AS vertex_id, MIN(y)::BIGINT AS component_id
             |FROM reach GROUP BY x ORDER BY x""".stripMargin)
    ),
    Q(
      "wd_connected_components_lss",
      // Connected components via alternating large-star/small-star
      // rounds (Kiveris et al., "Connected Components in MapReduce and
      // Beyond") — the HIGH-DIAMETER path wd_connected_components'
      // scaladoc names: min-label propagation needs O(diameter)
      // rounds, LSS contracts the graph itself and converges in
      // O(log n) rounds with the same per-round join shape. Same
      // oracle, same unique fixpoint (every vertex labeled with its
      // component minimum), so the two operators are
      // interchangeable; a spec asserts LSS takes FEWER rounds than
      // min-label on a path graph, where the gap is the whole point.
      //
      // Scale posture: state is the edge SET itself (canonical a < b,
      // distinct), rewritten each round by one groupBy-min + one
      // equi-join per phase — both map-side combinable, no windows,
      // no driver collect. Each phase only shrinks the per-edge sum
      // and the set size, so the convergence probe is one scalar
      // (count, exact DECIMAL sum) pair per combined round
      // ([[lssProbe]]); probes equal iff both phases were the
      // identity — the paper's termination condition. The rotating
      // caches keep state at 2 edge-set frames regardless of round
      // count; the final set is a star forest (every non-minimum
      // vertex holds exactly one edge to its component minimum), so
      // labels fall out of one left join against the vertex set —
      // isolated/self-loop-only vertices label themselves via
      // coalesce, matching the oracle's reflexive reach seed.
      (s0, dir) => {
        val s = graphSession(s0)
        val (sym, verts) = symmetricGraph(s, dir)
        val (labels, _) = ccLssKernel(sym, verts)
        labels
          .select(col("id").as("vertex_id"), col("comp").as("component_id"))
          .orderBy("vertex_id")
      },
      Some(s"""WITH RECURSIVE e AS (SELECT src_id, dst_id FROM ($edgeUnionSql)),
             |u AS (SELECT src_id AS a, dst_id AS b FROM e WHERE src_id <> dst_id
             |      UNION SELECT dst_id, src_id FROM e WHERE src_id <> dst_id),
             |v AS (SELECT DISTINCT id FROM (SELECT src_id AS id FROM e UNION ALL SELECT dst_id FROM e)),
             |reach(x, y) AS (
             |  SELECT id, id FROM v
             |  UNION
             |  SELECT r.x, u.b FROM reach r JOIN u ON r.y = u.a
             |)
             |SELECT x AS vertex_id, MIN(y)::BIGINT AS component_id
             |FROM reach GROUP BY x ORDER BY x""".stripMargin)
    ),
    Q(
      "wd_degree_stats",
      // Degree distribution of the shredded entity graph (undirected,
      // self-loops excluded) — the first structural dashboard run on
      // any new graph, and the input to the skew decisions the other
      // graph operators document (hub detection, large-star/small-star
      // switch-over, salting thresholds).
      //
      // Scale posture: two map-side-combined aggregations (per-vertex
      // degree, then vertices per degree) over the same symmetric
      // edge view the fixpoint operators use — no joins, no windows;
      // the distribution is at most max-degree rows.
      (s0, dir) => {
        val (sym, _) = symmetricGraph(s0, dir)
        sym
          .groupBy(col("a").as("id"))
          .agg(count(lit(1)).as("degree"))
          .groupBy("degree")
          .agg(count(lit(1)).as("n_vertices"))
          .orderBy("degree")
      },
      Some(s"""WITH e AS (SELECT src_id, dst_id FROM ($edgeUnionSql)),
             |u AS (SELECT src_id AS a, dst_id AS b FROM e WHERE src_id <> dst_id
             |      UNION SELECT dst_id, src_id FROM e WHERE src_id <> dst_id),
             |deg AS (SELECT a AS id, COUNT(*) AS degree FROM u GROUP BY 1)
             |SELECT degree, COUNT(*)::BIGINT AS n_vertices
             |FROM deg GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    Q(
      "wd_link_predict",
      // Common-neighbor link prediction over the shredded entity graph
      // (the classic structural-similarity baseline, Liben-Nowell &
      // Kleinberg 2003): for every NON-adjacent vertex pair, score =
      // |Γ(x) ∩ Γ(y)| — the wedge count through shared neighbors —
      // and the top-20 candidates are the edges a curator (or a
      // knowledge-graph completion pass) reviews first. Equi-joins
      // only: the wedge join is edges⋈edges on the shared endpoint,
      // the existing-edge exclusion one anti-join on the pair key.
      //
      // Scale posture: wedge mass is Σ deg(c)² over shared endpoints —
      // at 100 TB hubs dominate, so centers above [[WedgeDegCap]] are
      // EXCLUDED from enumeration (the MaxBucketWidth move; a hub
      // shared by everything carries ~no ranking signal) with the cap
      // mirrored verbatim in the oracle and the dropped mass surfaced
      // as data by wd_wedge_cap_report. Admitted wedge mass is bounded
      // by cap × |E| — GraphStress's planted-hub arm measures it. One
      // map-side-combined count per pair, TakeOrdered top-20 — never a
      // global sort; the symmetric edge view is persisted and shared
      // by the wedge join's both sides.
      (s0, dir) => {
        val (sym, _) = symmetricGraph(s0, dir)
        val symP = GraftCache.register(sym.persist())
        val adm = withCenterDegree(symP).filter(col("d") <= WedgeDegCap)
        val wedges = adm
          .select(col("a").as("x"), col("b").as("c"))
          .join(adm.select(col("a").as("y"), col("b").as("c")), "c")
          .filter(col("x") < col("y"))
          .groupBy("x", "y")
          .agg(count(lit(1)).as("n_common"))
        wedges
          .join(
            symP.select(col("a").as("x"), col("b").as("y")),
            Seq("x", "y"),
            "left_anti")
          .orderBy(col("n_common").desc, col("x"), col("y"))
          .limit(20)
      },
      Some(s"""WITH e AS (SELECT src_id, dst_id FROM ($edgeUnionSql)),
             |u AS (SELECT src_id AS a, dst_id AS b FROM e WHERE src_id <> dst_id
             |      UNION SELECT dst_id, src_id FROM e WHERE src_id <> dst_id),
             |deg AS (SELECT a, COUNT(*)::BIGINT AS d FROM u GROUP BY 1),
             |w AS (SELECT xx.a AS x, yy.a AS y, COUNT(*)::BIGINT AS n_common
             |      FROM u xx JOIN u yy ON xx.b = yy.b AND xx.a < yy.a
             |      JOIN deg ON deg.a = xx.b AND deg.d <= 1000
             |      GROUP BY 1, 2),
             |nc AS (SELECT w.* FROM w ANTI JOIN u ON w.x = u.a AND w.y = u.b)
             |SELECT x, y, n_common FROM nc
             |ORDER BY n_common DESC, x, y LIMIT 20""".stripMargin)
    ),
    Q(
      "wd_resource_alloc",
      // Resource-allocation link prediction (Zhou, Lü & Zhang 2009) —
      // the degree-weighted refinement of wd_link_predict: each shared
      // neighbor c contributes 1/deg(c), so a hub shared by everything
      // adds almost nothing while a rare shared neighbor is strong
      // evidence. RA consistently beats raw common-neighbor counting
      // on KG-completion benchmarks, which is why it is the second
      // ranker a curator reaches for. Exact integer arithmetic:
      // score_ppm = Σ 1000000 div deg(c) (integral division both
      // engines), so the ranking is bit-identical cross-engine — no
      // float accumulation order to diverge.
      //
      // Scale posture: same wedge-join shape as wd_link_predict —
      // centers above [[WedgeDegCap]] excluded (mirrored in the
      // oracle; RA's own 1/deg weighting makes the cap nearly free in
      // score terms: a capped center would have contributed ≤ 1000
      // ppm per wedge) — plus ONE vertex-keyed degree aggregation
      // joined back to the symmetric edge list on its partition key
      // before the wedge join — weights ride the edge rows, no extra
      // shuffle in the pair rollup, map-side combined sum per pair,
      // TakeOrdered top-20.
      (s0, dir) => {
        val (sym, _) = symmetricGraph(s0, dir)
        val symP = GraftCache.register(sym.persist())
        // weight rides the wedge-center edge rows: 1e6 div deg(c)
        val weighted = withCenterDegree(symP)
          .filter(col("d") <= WedgeDegCap)
          .select(col("a"), col("b"), expr("1000000 div d").as("w_ppm"))
        val wedges = weighted
          .select(col("a").as("x"), col("b").as("c"), col("w_ppm"))
          .join(weighted.select(col("a").as("y"), col("b").as("c")), "c")
          .filter(col("x") < col("y"))
          .groupBy("x", "y")
          .agg(count(lit(1)).as("n_common"), sum("w_ppm").as("score_ppm"))
        wedges
          .join(
            symP.select(col("a").as("x"), col("b").as("y")),
            Seq("x", "y"),
            "left_anti")
          .orderBy(col("score_ppm").desc, col("x"), col("y"))
          .limit(20)
      },
      Some(s"""WITH e AS (SELECT src_id, dst_id FROM ($edgeUnionSql)),
             |u AS (SELECT src_id AS a, dst_id AS b FROM e WHERE src_id <> dst_id
             |      UNION SELECT dst_id, src_id FROM e WHERE src_id <> dst_id),
             |deg AS (SELECT a, COUNT(*)::BIGINT AS d FROM u GROUP BY 1),
             |w AS (SELECT xx.a AS x, yy.a AS y, COUNT(*)::BIGINT AS n_common,
             |      SUM(1000000 // deg.d)::BIGINT AS score_ppm
             |      FROM u xx JOIN u yy ON xx.b = yy.b AND xx.a < yy.a
             |      JOIN deg ON deg.a = xx.b AND deg.d <= 1000
             |      GROUP BY 1, 2),
             |nc AS (SELECT w.* FROM w ANTI JOIN u ON w.x = u.a AND w.y = u.b)
             |SELECT x, y, n_common, score_ppm FROM nc
             |ORDER BY score_ppm DESC, x, y LIMIT 20""".stripMargin)
    ),
    Q(
      "wd_wedge_cap_report",
      // The DROPPED-MASS surface for the wedge cap (the cap_report
      // pattern, DedupCatalog's dedup_lsh_cap_report): per
      // center-degree bucket, the number of centers and the wedge mass
      // d·(d−1)/2 they generate, with the 'capped' bucket holding
      // everything [[WedgeDegCap]] excludes from wd_link_predict /
      // wd_resource_alloc. A recall trade must be VISIBLE data, not a
      // silent constant: an operator watching this report sees exactly
      // how much candidate mass the cap trades away as the graph grows
      // hubs (at the test SF the capped bucket is empty — the planted-
      // hub GraphStress arm is where it fills). Exact integer
      // arithmetic throughout; one vertex-keyed aggregation.
      (s0, dir) => {
        val (sym, _) = symmetricGraph(s0, dir)
        sym
          .groupBy(col("a")).agg(count(lit(1)).as("d"))
          .select(
            when(col("d") < 4, "deg_0001_0003")
              .when(col("d") < 16, "deg_0004_0015")
              .when(col("d") < 64, "deg_0016_0063")
              .when(col("d") <= WedgeDegCap, "deg_0064_1000")
              .otherwise("capped").as("bucket"),
            col("d"))
          .groupBy("bucket")
          .agg(
            count(lit(1)).as("n_centers"),
            sum(expr("d * (d - 1) div 2")).as("wedge_mass"))
          .withColumn("admitted", col("bucket") =!= "capped")
          .select("bucket", "admitted", "n_centers", "wedge_mass")
          .orderBy("bucket")
      },
      Some(s"""WITH e AS (SELECT src_id, dst_id FROM ($edgeUnionSql)),
             |u AS (SELECT src_id AS a, dst_id AS b FROM e WHERE src_id <> dst_id
             |      UNION SELECT dst_id, src_id FROM e WHERE src_id <> dst_id),
             |deg AS (SELECT a, COUNT(*)::BIGINT AS d FROM u GROUP BY 1),
             |b AS (SELECT CASE WHEN d < 4 THEN 'deg_0001_0003'
             |                  WHEN d < 16 THEN 'deg_0004_0015'
             |                  WHEN d < 64 THEN 'deg_0016_0063'
             |                  WHEN d <= 1000 THEN 'deg_0064_1000'
             |                  ELSE 'capped' END AS bucket, d FROM deg)
             |SELECT bucket, bucket <> 'capped' AS admitted,
             |COUNT(*)::BIGINT AS n_centers,
             |SUM(d * (d - 1) // 2)::BIGINT AS wedge_mass
             |FROM b GROUP BY 1, 2 ORDER BY bucket""".stripMargin)
    ),
    Q(
      "wd_hits",
      // HITS hubs & authorities (Kleinberg 1999) over the DIRECTED
      // shredded graph — the directed complement to PageRank: an
      // authority is pointed at by good hubs, a hub points at good
      // authorities. Two mutual-reinforcement rounds unrolled into one
      // DAG in EXACT integer arithmetic (no per-round normalization —
      // the float step that breaks cross-engine determinism; raw
      // scores after 2 rounds are bounded by max_deg³, documented
      // BIGINT headroom to ~10^6 degrees, far beyond any real KG hub).
      // Each round is one edge⋈vector equi-join + one
      // map-side-combined sum — the same shuffle shape as wd_pagerank
      // but over the asymmetric edge list, so direction mistakes
      // (joining on the wrong endpoint) invert hubs and authorities
      // and break the oracle.
      (s, dir) => {
        val e = WikidataShredder
          .edge(WikidataShredder.claims(SyntheticDump.entities(s, dir)))
          .select("src_id", "dst_id")
          .filter(col("src_id") =!= col("dst_id"))
          .distinct()
        val eP = GraftCache.register(e.persist())
        val a1 = eP.groupBy(col("dst_id").as("v")).agg(count(lit(1)).as("a1"))
        val h1 = eP.join(a1, eP("dst_id") === a1("v"))
          .groupBy(col("src_id").as("u")).agg(sum("a1").as("h1"))
        val a2 = eP.join(h1, eP("src_id") === h1("u"))
          .groupBy(col("dst_id").as("v")).agg(sum("h1").as("a2"))
        val h2 = eP.join(a2, eP("dst_id") === a2("v"))
          .groupBy(col("src_id").as("u")).agg(sum("a2").as("h2"))
        a2.select(col("v").as("vertex_id"), col("a2").as("auth"))
          .join(h2.select(col("u").as("vertex_id"), col("h2").as("hub")),
            Seq("vertex_id"), "full_outer")
          .na.fill(0L, Seq("auth", "hub"))
          .orderBy(col("auth").desc, col("hub").desc, col("vertex_id"))
          .limit(20)
      },
      Some(s"""WITH e AS (SELECT DISTINCT src_id, dst_id FROM ($edgeUnionSql)
             |           WHERE src_id <> dst_id),
             |a1 AS (SELECT dst_id AS v, COUNT(*)::BIGINT AS a1 FROM e GROUP BY 1),
             |h1 AS (SELECT e.src_id AS u, SUM(a1.a1)::BIGINT AS h1
             |       FROM e JOIN a1 ON e.dst_id = a1.v GROUP BY 1),
             |a2 AS (SELECT e.dst_id AS v, SUM(h1.h1)::BIGINT AS a2
             |       FROM e JOIN h1 ON e.src_id = h1.u GROUP BY 1),
             |h2 AS (SELECT e.src_id AS u, SUM(a2.a2)::BIGINT AS h2
             |       FROM e JOIN a2 ON e.dst_id = a2.v GROUP BY 1)
             |SELECT COALESCE(a2.v, h2.u) AS vertex_id,
             |COALESCE(a2.a2, 0)::BIGINT AS auth, COALESCE(h2.h2, 0)::BIGINT AS hub
             |FROM a2 FULL OUTER JOIN h2 ON a2.v = h2.u
             |ORDER BY auth DESC, hub DESC, vertex_id LIMIT 20""".stripMargin)
    ),
    Q(
      "wd_shortest_path",
      // Single-source weighted shortest paths over the shredded entity
      // graph (undirected, deterministic per-edge weight
      // 1 + (a+b) mod 5): distributed Bellman-Ford — min-plus
      // relaxation iterated to a convergence-checked fixpoint, the
      // same harness shape as wd_connected_components. Only REACHED
      // vertices carry state (the frontier starts as the one source
      // row), so unreachable components never enter the loop.
      //
      // Scale posture: the weighted adjacency (plus weight-0
      // self-edges, so a vertex's current distance rides the same
      // min aggregate — no union with the previous state) is
      // repartitioned by the join key once and persisted; each round
      // ships only the reached-vertex distance vector, min is
      // map-side combined, and the convergence probe is one scalar
      // (count, exact-decimal sum) pair per round — distances only
      // decrease and the reached set only grows, so the pair repeats
      // iff the fixpoint (unique, data-independent) is hit. Rounds ~
      // weighted diameter; the caches rotate so state is adjacency +
      // 2 vectors regardless of round count. The oracle walks the
      // same graph as a bounded recursive CTE (path enumeration —
      // fine at oracle scale, what Bellman-Ford exists to avoid).
      (s0, dir) => {
        val s = graphSession(s0)
        val (sym, verts) = symmetricGraph(s, dir)
        // the oracle seeds (10, 0) unconditionally; the kernel guards
        // the source's presence with a loud failure
        val (dist, _) = shortestPathKernel(sym, verts, source = 10L)
        // The oracle's recursive walk prunes at total + w < 400, so it
        // silently omits any vertex whose true distance is >= 400; on a
        // deeper/heavier corpus that would surface as an opaque hash
        // diff. Guard the horizon HERE with a loud failure while the
        // true max is still well under the bound (2x margin).
        val maxDist = dist.agg(max(col("dist"))).head().getLong(0)
        require(
          maxDist < 200,
          s"max shortest-path distance $maxDist approaches the oracle's 400 " +
            "recursion bound - raise the bound in the oracle SQL and this guard together")
        dist
          .select(col("id").as("vertex_id"), col("dist"))
          .orderBy("vertex_id")
      },
      Some(s"""WITH RECURSIVE e AS (SELECT src_id, dst_id FROM ($edgeUnionSql)),
             |u AS (SELECT src_id AS a, dst_id AS b FROM e WHERE src_id <> dst_id
             |      UNION SELECT dst_id, src_id FROM e WHERE src_id <> dst_id),
             |wadj AS (SELECT a, b, 1 + (a+b)%5 AS w FROM u),
             |walk(node, total) AS (
             |  SELECT CAST(10 AS BIGINT), CAST(0 AS BIGINT)
             |  UNION
             |  SELECT wadj.b, walk.total + wadj.w FROM walk
             |  JOIN wadj ON walk.node = wadj.a WHERE walk.total + wadj.w < 400
             |)
             |SELECT node AS vertex_id, MIN(total)::BIGINT AS dist
             |FROM walk GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    Q(
      "wd_label_propagation",
      // Community detection by synchronous label propagation (Raghavan
      // et al. 2007) over the shredded entity graph: every vertex
      // starts labeled with its own id and, for a FIXED 3 rounds,
      // adopts the most frequent label among its neighbors (ties broken
      // by the smallest label; isolated vertices keep their own). The
      // round count is fixed, not convergence-driven, because
      // synchronous LPA can oscillate on bipartite structures — a fixed
      // unrolled schedule is deterministic on BOTH engines, which is
      // what lets the oracle state the identical rounds (the
      // convergence-checked community op for this graph is
      // wd_connected_components).
      //
      // Scale posture: each round is one label-vector join against the
      // symmetric adjacency plus two map-side-combined aggregations
      // (per-(vertex, label) counts, then the argmax via min_by on
      // struct(-count, label) — partial-combinable, no window over
      // neighbor lists). Per-round shipped state is the vertex-sized
      // label vector; 3 rounds = 3 such joins, no lineage checkpoint
      // needed at fixed depth.
      (s0, dir) => {
        val s = graphSession(s0)
        val (_, _, lab) = lpaLabels(s, dir)
        lab
          .select(col("id").as("vertex_id"), col("lbl").as("community_id"))
          .orderBy("vertex_id")
      },
      Some(s"""WITH $lpaSqlCtes
           |SELECT id AS vertex_id, lbl::BIGINT AS community_id FROM l3 ORDER BY id""".stripMargin)
    ),
    Q(
      "wd_modularity",
      // Community-quality audit — Newman–Girvan MODULARITY of the LPA
      // partition (Newman 2006): Q = Σ_c [e_c/m − (d_c/2m)²], the score
      // every community-detection run publishes to decide whether the
      // partition is better than chance. Computed as an EXACT rational
      // over the common denominator 4m²: per-community numerator
      // 4·m·e_c − d_c², summed and scaled ×1e6 in DECIMAL(38,0) —
      // |Σnum| is bounded by 4m² so the ppm numerator crosses BIGINT
      // already past ~1.5e6 edges, and Spark's non-ANSI BIGINT sum
      // would wrap silently where DuckDB promotes to HUGEINT (the
      // ann_sq8/text_pmi lesson); BIGINT only on the wire. Shares
      // lpaLabels/lpaSqlCtes VERBATIM with
      // wd_label_propagation, so the audited partition cannot drift
      // from the one the LPA query emits.
      //
      // Scale posture: two label joins against the undirected edge list
      // (edge-keyed, map-side-combined counts), one vertex-sized degree
      // aggregation, a communities-sized rollup, a 1-row broadcast of
      // (m, Σnum). No pairwise work, no window over data.
      (s0, dir) => {
        val s = graphSession(s0)
        val (sym, _, lab) = lpaLabels(s, dir)
        // lineage-TRUNCATED, not just persisted: labels sit on top of
        // the cached sym inside a 3-round join pyramid, and per (below)
        // would stack a third cache level on top — nested caches under
        // AQE reprint their initial plans per action (the fixpoint
        // scaladoc's O(2^rounds) pathology), which dominated this
        // query's wall at sf0.1. One flat RDD leaf per stage instead.
        val labB = roundFrame(lab)
        graft.GraftCache.registerCleanup(() => freeRoundFrame(labB))
        // undirected edge list (a < b) — each edge once
        val und = sym.filter(col("a") < col("b"))
        val m = und.agg(count(lit(1)).as("m"))
        val eIn = und
          .join(labB.select(col("id").as("a"), col("lbl").as("la")), "a")
          .join(labB.select(col("id").as("b"), col("lbl").as("lb")), "b")
          .filter(col("la") === col("lb"))
          .groupBy(col("la").as("lbl"))
          .agg(count(lit(1)).as("e_in"))
        val dSum = sym
          .groupBy("a")
          .agg(count(lit(1)).as("deg"))
          .join(labB.select(col("id").as("a"), col("lbl")), "a")
          .groupBy("lbl")
          .agg(sum("deg").as("d_sum"))
        val nV = labB.groupBy("lbl").agg(count(lit(1)).as("n_vertices"))
        // truncated for the same reason: the communities rollup feeds
        // BOTH the 1-row total and the final projection — one flat
        // communities-sized leaf instead of re-executing the
        // eIn/dSum/nV pyramid (and its broadcasts) per consumer.
        val per = roundFrame(nV
          .join(dSum, Seq("lbl"), "left_outer")
          .join(eIn, Seq("lbl"), "left_outer")
          .na.fill(0L, Seq("d_sum", "e_in"))
          .crossJoin(broadcast(m))
          .withColumn(
            "contrib_d",
            expr("""4 * CAST(m AS DECIMAL(38,0)) * e_in
                   | - CAST(d_sum AS DECIMAL(38,0)) * d_sum""".stripMargin)))
        graft.GraftCache.registerCleanup(() => freeRoundFrame(per))
        val qTot = per.agg(sum("contrib_d").as("num_sum"), max("m").as("mm"))
        per
          .crossJoin(broadcast(qTot))
          .select(
            col("lbl").as("community_id"),
            col("n_vertices"),
            col("e_in"),
            col("d_sum"),
            col("contrib_d").cast("long").as("contrib_num"),
            expr("""CAST((num_sum * 1000000)
                   | div (4 * CAST(mm AS DECIMAL(38,0)) * mm) AS BIGINT)""".stripMargin)
              .as("q_ppm"))
          .orderBy("community_id")
      },
      Some(s"""WITH $lpaSqlCtes,
           |und AS (SELECT a, b FROM u WHERE a < b),
           |mm AS (SELECT COUNT(*)::BIGINT AS m FROM und),
           |ein AS (SELECT la.lbl AS lbl, COUNT(*)::BIGINT AS e_in
           |        FROM und JOIN l3 la ON und.a = la.id JOIN l3 lb ON und.b = lb.id
           |        WHERE la.lbl = lb.lbl GROUP BY 1),
           |deg AS (SELECT a AS id, COUNT(*)::BIGINT AS deg FROM u GROUP BY 1),
           |ds AS (SELECT l3.lbl, SUM(deg.deg)::BIGINT AS d_sum
           |       FROM deg JOIN l3 ON deg.id = l3.id GROUP BY 1),
           |nv AS (SELECT lbl, COUNT(*)::BIGINT AS n_vertices FROM l3 GROUP BY 1),
           |per AS (SELECT nv.lbl, nv.n_vertices,
           |        COALESCE(ein.e_in, 0)::BIGINT AS e_in,
           |        COALESCE(ds.d_sum, 0)::BIGINT AS d_sum,
           |        (4 * CAST(mm.m AS HUGEINT) * COALESCE(ein.e_in, 0)
           |          - CAST(COALESCE(ds.d_sum, 0) AS HUGEINT) * COALESCE(ds.d_sum, 0)) AS contrib_h
           |        FROM nv LEFT JOIN ds ON nv.lbl = ds.lbl LEFT JOIN ein ON nv.lbl = ein.lbl CROSS JOIN mm),
           |tot AS (SELECT SUM(contrib_h) AS num_sum, MAX(m) AS m2 FROM per, mm)
           |SELECT lbl::BIGINT AS community_id, n_vertices, e_in, d_sum, contrib_h::BIGINT AS contrib_num,
           |((tot.num_sum * 1000000) // (4 * CAST(tot.m2 AS HUGEINT) * tot.m2))::BIGINT AS q_ppm
           |FROM per, tot ORDER BY community_id""".stripMargin)
    )
  )
}

