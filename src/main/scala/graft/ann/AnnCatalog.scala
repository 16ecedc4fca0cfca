package graft.ann

import scala.util.chaining._

import graft.{Fan, Q, QueryModule, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 similarity search over the embeddings table.
  *
  *   - ann_bruteforce: exact cosine top-k — the correctness baseline.
  *     Queries are broadcast against the corpus (at 100 TB the corpus
  *     streams, queries stay in memory), per-query top-k via window.
  *   - ann_lsh: random-hyperplane signature (hash-derived +-1 planes)
  *     buckets the corpus; only bucket-mates are scored. rows-only.
  *   - ann_ivf: k-means-lite — centroids = per-label means (one pass),
  *     vectors assigned to nearest centroid, queries probe the 2 nearest
  *     cells. Centroids are broadcast (tiny). rows-only.
  *
  * Recall of the approximate variants vs the brute-force baseline is
  * measured in AnnSpec.
  */
object AnnCatalog extends QueryModule {

  private val K = 5

  /** ann_hnsw's quadratic-build bound — see the query's scaladoc. */
  private[graft] val GraphSampleCap = 50000L

  /** Quantized corpus, PERSISTED (r18): every consumer query reuses the
    * corpus 2-10x (centroid aggregations, assignment joins, query-side
    * filters), and without the cache each reuse re-runs the scan +
    * 64-dim quantize. Registered with GraftCache so the harnesses
    * unpersist between queries; single-use consumers pay one cache
    * write of a vectors-sized frame. */
  private def corpus(s: SparkSession, dir: String): DataFrame =
    graft.GraftCache.register(
      Fan
        .out(Tables(s, dir).embeddings)
        .withColumn("qv", quantize(col("embedding")))
        .withColumn("nsq", normSqQ(col("qv")))
        .persist())

  private def queriesDf(c: DataFrame): DataFrame =
    c.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("qv").as("qe"), col("nsq").as("qn"))

  /** (q_id, vec_id, cosine) for every query x corpus pair — the shared
    * base of ann_bruteforce (top-k) and ann_range_search (radius). */
  private def scoredPairs(c: DataFrame): DataFrame =
    c.join(broadcast(queriesDf(c)), col("vec_id") =!= col("q_id"))
      .withColumn("cosine", cosineFrom(dotQ(col("qe"), col("qv")), col("qn"), col("nsq")))
      .select("q_id", "vec_id", "cosine")

  /** Exact-integer centroids of `v` keyed by `key`: per-key elementwise
    * sums (BIGINT) + counts, so any "distance to centroid" divides an
    * exact integer by the count — one IEEE division, bit-identical in
    * DuckDB. Returns (cell, csum[64], cnt). */
  private def centroidsOf(v: DataFrame, key: String): DataFrame =
    v.select(col(key).as("cell"), posexplode(col("qv")))
      .groupBy("cell", "pos")
      .agg(sum(col("col")).as("sv"))
      .groupBy("cell")
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("sv")))), x => x.getField("sv"))
          .as("csum"))
      .join(v.groupBy(col(key).as("cell")).agg(count(lit(1)).as("cnt")), "cell")
      .select(col("cell"), col("csum"), col("cnt"))

  /** Coarse quantizer shared by ann_ivf and ann_ivf_pq: k-means-lite —
    * the label partition seeds the cells (one training pass; the
    * Lloyd-refined variant is [[lloydTrain]]). */
  private def coarseCentroids(c: DataFrame): DataFrame = centroidsOf(c, "label")

  /** Assign every vector to its nearest centroid (max mean dot).
    * Argmax by AGGREGATION, not a row_number window: min_by keyed on
    * struct(-score, cell) — same total order as (score DESC, cell ASC)
    * — gets map-side partial combine, so the shuffle carries N rows
    * instead of the window's N*k. Ties are broken inside the key (cell
    * is part of it), so equal-key rows carry identical payloads and the
    * result is deterministic. Returns (vec_id, label, qv, nsq, cell). */
  private def coarseAssign(c: DataFrame, cents: DataFrame): DataFrame =
    c.join(broadcast(cents))
      .withColumn("score", dotQ(col("qv"), col("csum")).cast("double") / col("cnt"))
      .groupBy("vec_id")
      .agg(min_by(
        struct(col("label"), col("qv"), col("nsq"), col("cell")),
        struct(negate(col("score")), col("cell"))).as("best"))
      .select(
        col("vec_id"), col("best.label").as("label"), col("best.qv").as("qv"),
        col("best.nsq").as("nsq"), col("best.cell").as("cell"))

  /** One Lloyd assignment step: nearest centroid by EUCLIDEAN distance
    * ||v - csum/cnt||² = nsq - 2·(v·csum)/cnt + (csum·csum)/cnt² —
    * the metric whose update step (the mean) is the argmin, so the
    * k-means objective is provably non-increasing per iteration (the
    * property LloydSpec asserts). v·csum stays an exact BIGINT dot;
    * csum·csum runs in doubles (its exact square can exceed BIGINT at
    * large cell counts, and this path is engine-internal — no oracle).
    * Centroids are broadcast; argmin is the same map-side-combined
    * min_by as [[coarseAssign]]. */
  private[graft] def lloydAssign(v: DataFrame, cents: DataFrame): DataFrame =
    v.drop("cell") // re-assignment input may carry the previous round's cell
      .join(broadcast(cents))
      .withColumn(
        "d",
        col("nsq").cast("double")
          - lit(2.0) * dotQ(col("qv"), col("csum")).cast("double") / col("cnt")
          + dot(col("csum"), col("csum")) / (col("cnt") * col("cnt")).cast("double"))
      .groupBy("vec_id")
      .agg(min_by(
        struct(col("qv"), col("nsq"), col("cell")),
        struct(col("d"), col("cell"))).as("best"))
      .select(
        col("vec_id"), col("best.qv").as("qv"), col("best.nsq").as("nsq"),
        col("best.cell").as("cell"))

  /** The k-means objective Σ ||v - mean(cell(v))||² of an assignment —
    * one broadcast join + global agg; the driver-side scalar is the
    * convergence-probe pattern the graph fixpoints use. */
  private[graft] def lloydObjective(assigned: DataFrame): Double =
    assigned
      .join(broadcast(centroidsOf(assigned, "cell")), "cell")
      .select(
        sum(
          col("nsq").cast("double")
            - lit(2.0) * dotQ(col("qv"), col("csum")).cast("double") / col("cnt")
            + dot(col("csum"), col("csum")) / (col("cnt") * col("cnt")).cast("double"))
          .as("obj"))
      .head()
      .getDouble(0)

  /** Distributed Lloyd training, convergence-probed: start from the
    * k-means-lite label seeding (the one-pass training ann_ivf/ann_pq
    * deploy — their oracle contract is UNCHANGED by this path), then
    * iterate update (exact-integer centroid sums over the current
    * assignment) + assignment (broadcast centroids, min_by argmin)
    * until no vector moves. Per-round work is one broadcast join and
    * two aggregations — no all-pairs, no driver-side data. Returns
    * (final assignment, rounds run, objective after each round,
    * including round 0 = the seed). */
  private[graft] def lloydTrain(
      s: SparkSession,
      dir: String,
      maxRounds: Int): (DataFrame, Int, Seq[Double]) = {
    val c = corpus(s, dir)
    val seed = coarseAssign(c, coarseCentroids(c)).select("vec_id", "qv", "nsq", "cell")
    val objectives = scala.collection.mutable.ArrayBuffer.empty[Double]
    // the shared fixpoint driver: per-round localCheckpoint truncates
    // the lineage (an unbounded iterative plan OOMs the planner), and
    // round frames are freed on every exit path. The probe is a
    // deterministic assignment fingerprint — equal fingerprints mean no
    // vector moved; the per-round objective rides along for the spec.
    val (fin, rounds) = graft.wikidata.WikidataCatalog.fixpointCounted(
      seed,
      df => lloydAssign(df, centroidsOf(df, "cell")),
      df => {
        objectives += lloydObjective(df)
        df.select(sum(hash(col("vec_id"), col("cell")).cast("long")).as("fp")).head().getLong(0)
      },
      maxRounds,
      "lloyd refinement")
    (fin, rounds, objectives.toSeq)
  }

  /** Unscaled squared distance between a residual subvector (scaled by
    * the cell count: sv = v*cnt - csum slice) and a sub-codebook
    * centroid held exactly as (ssum = Σ scaled residuals, scnt):
    * Σ_i (sv[i]/cnt - ssum[i]/(scnt·cnt))². Every division is an exact
    * BIGINT numerator over an exact BIGINT denominator — one IEEE op,
    * bit-identical cross-engine — and the 8-term sum is emitted as an
    * explicit LEFT-ASSOCIATIVE chain so Spark and DuckDB add in the
    * same order (float addition is order-sensitive; [[residDistSql]]
    * mirrors the exact shape). Unscaled (÷cnt) so ADC sums are
    * comparable ACROSS cells with different counts — the nprobe union
    * ranks candidates from different cells against each other. */
  private def residDist(sv: org.apache.spark.sql.Column, ssum: org.apache.spark.sql.Column,
      scnt: org.apache.spark.sql.Column, cnt: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (1 to 8).map { i =>
      val t = element_at(sv, i).cast("double") / cnt.cast("double") -
        element_at(ssum, i).cast("double") / (scnt * cnt).cast("double")
      t * t
    }.reduce(_ + _)

  /** DuckDB mirror of [[residDist]] — same divisions, same squares,
    * same left-associative add chain. */
  private def residDistSql(sv: String, ssum: String, scnt: String, cnt: String): String =
    (1 to 8).map { i =>
      val t = s"(CAST($sv[$i] AS DOUBLE)/CAST($cnt AS DOUBLE) - " +
        s"CAST($ssum[$i] AS DOUBLE)/CAST(($scnt*$cnt) AS DOUBLE))"
      s"($t*$t)"
    }.mkString("(", " + ", ")")

  /** Oracle mirror of scoredPairs, ending in the scored CTE. */
  private val scoredSql =
    """WITH n AS (SELECT vec_id,
      |      [CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT) for x in embedding] AS qv FROM embeddings),
      |m AS (SELECT vec_id, qv,
      |      (SELECT SUM(qv[i]*qv[i]) FROM UNNEST(range(1, len(qv)+1)) AS t(i)) AS nsq FROM n),
      |q AS (SELECT vec_id AS q_id, qv AS qe, nsq AS qn FROM m WHERE vec_id < 10),
      |scored AS (SELECT q.q_id, m.vec_id,
      |  CAST((SELECT SUM(q.qe[i]*m.qv[i]) FROM UNNEST(range(1, len(q.qe)+1)) AS t(i)) AS DOUBLE)
      |    / (sqrt(CAST(q.qn AS DOUBLE))*sqrt(CAST(m.nsq AS DOUBLE))) AS cosine
      |  FROM m CROSS JOIN q WHERE m.vec_id <> q.q_id)""".stripMargin

  /** The nprobe=2 IVF query path shared by ann_ivf (in-memory build)
    * and ann_index_persist (reopened-from-parquet artifacts): probe the
    * 2 best cells per query vector by mean-dot centroid score, exact
    * cosine over the probed cells' posting lists, top-K through the
    * bounded-heap operator. `assigned` must carry (vec_id, qv, nsq,
    * cell); `cents` (cell, csum, cnt). */
  private def ivfSearch(assigned: DataFrame, cents: DataFrame): DataFrame = {
    val q = assigned.filter(col("vec_id") < 10)
    // probe the 2 nearest cells per query — genuine k>1, so the
    // bounded-heap operator, not a full-sort window
    val probeScored = q
      .select(col("vec_id").as("q_id"), col("qv").as("qe"), col("nsq").as("qn"))
      .join(broadcast(cents))
      .withColumn("score", dotQ(col("qe"), col("csum")).cast("double") / col("cnt"))
    val probes = graft.plans.GraftOps
      .topKPerGroup(probeScored, Seq(col("q_id")), 2, col("score").desc, col("cell"))
      .select("q_id", "qe", "qn", "cell")
    val scored = assigned
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", cosineFrom(dotQ(col("qe"), col("qv")), col("qn"), col("nsq")))
    val top = graft.plans.GraftOps
      .topKPerGroup(scored, Seq(col("q_id")), K, col("cosine").desc, col("vec_id"))
    val wRank = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    top
      .withColumn("rank", row_number().over(wRank))
      .select("q_id", "rank", "vec_id", "cosine")
      .orderBy("q_id", "rank")
  }

  /** Oracle fragment recomputing the IVF BUILD relationally (quantize →
    * centroids → argmax assignment), ending in `assigned(vec_id, qv,
    * nsq, cell)` — shared by the search oracle [[ivfSql]] and the
    * index-health oracle of ann_cell_stats. */
  private val ivfBuildSql =
    """WITH n AS (SELECT vec_id, label,
      |      [CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT) for x in embedding] AS qv FROM embeddings),
      |m AS (SELECT vec_id, label, qv,
      |      (SELECT SUM(qv[i]*qv[i]) FROM UNNEST(range(1, len(qv)+1)) AS t(i)) AS nsq FROM n),
      |cs AS (SELECT label AS cell, i, SUM(qv[i])::BIGINT AS sv
      |       FROM m, UNNEST(range(1, len(qv)+1)) AS t(i) GROUP BY 1, 2),
      |cent AS (SELECT cell, list(sv ORDER BY i) AS csum FROM cs GROUP BY 1),
      |cnt AS (SELECT label AS cell, COUNT(*) AS cnt FROM m GROUP BY 1),
      |cc AS (SELECT cell, csum, cnt FROM cent JOIN cnt USING (cell)),
      |sc AS (SELECT m.vec_id, m.qv, m.nsq, cc.cell,
      |       CAST((SELECT SUM(m.qv[i]*cc.csum[i]) FROM UNNEST(range(1, len(m.qv)+1)) AS t(i)) AS DOUBLE)/cc.cnt AS score
      |       FROM m CROSS JOIN cc),
      |asg AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn FROM sc),
      |assigned AS (SELECT vec_id, qv, nsq, cell FROM asg WHERE rn = 1)""".stripMargin

  /** PQ ADC distances (q_id, vec_id, adc) — the full product-
    * quantization pipeline (subspaces → sub-codebooks → codes →
    * per-query LUT → integer ADC sum), shared by ann_pq (ranked top-K
    * directly off the ADC) and ann_rerank_exact (ADC shortlist → exact
    * re-rank). See ann_pq's Q comment for the method and the
    * exact-integer rationale. */
  private def pqAdc(c: DataFrame): DataFrame = {
    // m=8 subspaces × 8 dims over the 64-dim quantized vector.
    // truncated (r18): sub feeds the two codebook aggregations, the
    // code assignment AND the query LUT — four recomputations of the
    // corpus quantize + explode without it.
    val sub = graft.GraftCache.truncate(c
      .select(col("vec_id"), col("label"), col("qv"), explode(expr("sequence(0, 7)")).as("j"))
      .withColumn("sv", expr("slice(qv, j*8+1, 8)"))
      .select("vec_id", "label", "j", "sv"))
    // sub-codebooks: per (subspace, label) exact elementwise sums +
    // count + squared norm of the sum vector
    val cb = sub
      .select(col("j"), col("label"), posexplode(col("sv")))
      .groupBy("j", "label", "pos")
      .agg(sum(col("col")).as("sv_sum"))
      .groupBy("j", "label")
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("sv_sum")))), x => x.getField("sv_sum"))
          .as("csum"))
      .join(sub.groupBy("j", "label").agg(count(lit(1)).as("cnt")), Seq("j", "label"))
      // Σ csum² outgrows BIGINT once a cell holds ~10k 1e6-quantized
      // vectors (csum_i ~ n·1e6, its square ~ n²·1e12) — found by the
      // 100x DocStress arm, so the square runs in DECIMAL(38,0)
      // (HUGEINT in the oracle); values are identical where both fit
      .withColumn(
        "ssq",
        expr("aggregate(csum, CAST(0 AS DECIMAL(38,0)), (acc, x) -> acc + CAST(x AS DECIMAL(38,0)) * x)"))
      .select(col("j"), col("label").as("cell"), col("csum"), col("cnt"), col("ssq"))
      // truncated: cb is broadcast twice (codes + LUT) — tiny (r18)
      .pipe(graft.GraftCache.truncate)
    // ||v - s/c||² ranking ≡ (-2·v·s·c + ssq)/c² + const: exact
    // integer numerator, one portable IEEE division. The inner dot
    // stays a Long (safe to ~1e6-vector cells: 8·1e6·(n·1e6) < 2^63);
    // the -2·dot·cnt product crosses BIGINT around n~10k, so the outer
    // arithmetic runs in DECIMAL(38,0) — same 100x lesson as ssq.
    def score(sv: org.apache.spark.sql.Column) =
      (lit(-2L) * dotQ(sv, col("csum")).cast("decimal(38,0)") * col("cnt") + col("ssq"))
        .cast("double") / (col("cnt") * col("cnt"))
    // per-vector code per subspace: argmin by AGGREGATION (map-side
    // partial min_by), not a row_number window — same rationale as
    // ann_ivf's assignment
    val codes = sub
      .join(broadcast(cb), Seq("j"))
      .withColumn("sc", score(col("sv")))
      .groupBy("vec_id", "j")
      .agg(min_by(col("cell"), struct(col("sc"), col("cell"))).as("cell"))
    // per-query LUT: fixed-point BIGINT distance per (j, cell)
    val lut = sub
      .filter(col("vec_id") < 10)
      .join(broadcast(cb), Seq("j"))
      .select(
        col("vec_id").as("q_id"),
        col("j"),
        col("cell"),
        round(lit(1e6) * score(col("sv"))).cast("long").as("fp"))
    // ADC: integer sum of the m LUT entries selected by the codes
    codes
      .join(broadcast(lut), Seq("j", "cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(sum(col("fp")).as("adc"))
  }

  /** Oracle mirror of [[pqAdc]] — CTE chain from the raw embeddings to
    * adc(q_id, vec_id, adc), shared by ann_pq and ann_rerank_exact. */
  private val pqAdcSql =
    """WITH n AS (SELECT vec_id, label,
      |      [CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT) for x in embedding] AS qv FROM embeddings),
      |sub AS (SELECT vec_id, label, j, qv[j*8+1 : j*8+8] AS sv FROM n, UNNEST(range(8)) AS t(j)),
      |cbs AS (SELECT j, label AS cell, i, SUM(sv[i])::BIGINT AS s
      |        FROM sub, UNNEST(range(1, 9)) AS t(i) GROUP BY 1, 2, 3),
      |cbl AS (SELECT j, cell, list(s ORDER BY i) AS csum FROM cbs GROUP BY 1, 2),
      |cnt AS (SELECT j, label AS cell, COUNT(*) AS cnt FROM sub GROUP BY 1, 2),
      |cb AS (SELECT cbl.j, cbl.cell, csum, cnt,
      |       (SELECT SUM(csum[i]::HUGEINT*csum[i]) FROM UNNEST(range(1, 9)) AS t(i))::HUGEINT AS ssq
      |       FROM cbl JOIN cnt USING (j, cell)),
      |sc AS (SELECT s.vec_id, s.j, c.cell,
      |       CAST(-2::HUGEINT*(SELECT SUM(s.sv[i]*c.csum[i]) FROM UNNEST(range(1, 9)) AS t(i))*c.cnt + c.ssq
      |            AS DOUBLE)/(c.cnt*c.cnt) AS score
      |       FROM sub s JOIN cb c ON s.j = c.j),
      |codes AS (SELECT vec_id, j, cell FROM
      |          (SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY score, cell) AS rn FROM sc)
      |          WHERE rn = 1),
      |lut AS (SELECT s.vec_id AS q_id, s.j, c.cell,
      |        CAST(round(1e6 * (CAST(-2::HUGEINT*(SELECT SUM(s.sv[i]*c.csum[i]) FROM UNNEST(range(1, 9)) AS t(i))*c.cnt + c.ssq
      |                               AS DOUBLE)/(c.cnt*c.cnt))) AS BIGINT) AS fp
      |        FROM sub s JOIN cb c ON s.j = c.j WHERE s.vec_id < 10),
      |adc AS (SELECT l.q_id, k.vec_id, SUM(l.fp)::BIGINT AS adc
      |        FROM codes k JOIN lut l ON k.j = l.j AND k.cell = l.cell
      |        WHERE k.vec_id <> l.q_id GROUP BY 1, 2)""".stripMargin

  /** Oracle of the [[ivfSearch]] consumers — recomputes build + search
    * relationally; shared verbatim by ann_ivf and ann_index_persist
    * (the round trip must be lossless, so the SQL is identical). */
  private val ivfSql =
    s"""$ivfBuildSql,
       |qp AS (SELECT sc.vec_id AS q_id, sc.qv AS qe, sc.nsq AS qn, sc.cell,
       |       row_number() OVER (PARTITION BY sc.vec_id ORDER BY sc.score DESC, sc.cell) AS rn
       |       FROM sc WHERE sc.vec_id < 10),
       |probes AS (SELECT q_id, qe, qn, cell FROM qp WHERE rn <= 2),
       |scored AS (SELECT p.q_id, s.vec_id,
       |   CAST((SELECT SUM(p.qe[i]*s.qv[i]) FROM UNNEST(range(1, len(p.qe)+1)) AS t(i)) AS DOUBLE)
       |     / (sqrt(CAST(p.qn AS DOUBLE))*sqrt(CAST(s.nsq AS DOUBLE))) AS cosine
       |   FROM probes p JOIN assigned s ON s.cell = p.cell WHERE s.vec_id <> p.q_id),
       |ranked AS (SELECT q_id, vec_id, cosine,
       |   row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank FROM scored)
       |SELECT q_id, rank, vec_id, cosine FROM ranked WHERE rank <= $K ORDER BY q_id, rank""".stripMargin

  /** The frozen-centroid IVF oracle (train on vec_id < 400, assign
    * ALL vectors, nprobe=2 serve) — shared by ann_index_append and
    * ann_ivf_snapshot: both must produce the identical result, the
    * latter through the transactional storage detour. */
  private val frozenCentroidIvfSql =
    s"""WITH n AS (SELECT vec_id, label,
       |      [CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT) for x in embedding] AS qv FROM embeddings),
       |m AS (SELECT vec_id, label, qv,
       |      (SELECT SUM(qv[i]*qv[i]) FROM UNNEST(range(1, len(qv)+1)) AS t(i)) AS nsq FROM n),
       |cs AS (SELECT label AS cell, i, SUM(qv[i])::BIGINT AS sv
       |       FROM m, UNNEST(range(1, len(qv)+1)) AS t(i) WHERE vec_id < 400 GROUP BY 1, 2),
       |cent AS (SELECT cell, list(sv ORDER BY i) AS csum FROM cs GROUP BY 1),
       |cnt AS (SELECT label AS cell, COUNT(*) AS cnt FROM m WHERE vec_id < 400 GROUP BY 1),
       |cc AS (SELECT cell, csum, cnt FROM cent JOIN cnt USING (cell)),
       |sc AS (SELECT m.vec_id, m.qv, m.nsq, cc.cell,
       |       CAST((SELECT SUM(m.qv[i]*cc.csum[i]) FROM UNNEST(range(1, len(m.qv)+1)) AS t(i)) AS DOUBLE)/cc.cnt AS score
       |       FROM m CROSS JOIN cc),
       |asg AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn FROM sc),
       |assigned AS (SELECT vec_id, qv, nsq, cell FROM asg WHERE rn = 1),
       |qp AS (SELECT sc.vec_id AS q_id, sc.qv AS qe, sc.nsq AS qn, sc.cell,
       |       row_number() OVER (PARTITION BY sc.vec_id ORDER BY sc.score DESC, sc.cell) AS rn
       |       FROM sc WHERE sc.vec_id < 10),
       |probes AS (SELECT q_id, qe, qn, cell FROM qp WHERE rn <= 2),
       |scored AS (SELECT p.q_id, s.vec_id,
       |   CAST((SELECT SUM(p.qe[i]*s.qv[i]) FROM UNNEST(range(1, len(p.qe)+1)) AS t(i)) AS DOUBLE)
       |     / (sqrt(CAST(p.qn AS DOUBLE))*sqrt(CAST(s.nsq AS DOUBLE))) AS cosine
       |   FROM probes p JOIN assigned s ON s.cell = p.cell WHERE s.vec_id <> p.q_id),
       |ranked AS (SELECT q_id, vec_id, cosine,
       |   row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank FROM scored)
       |SELECT q_id, rank, vec_id, cosine FROM ranked WHERE rank <= $K ORDER BY q_id, rank""".stripMargin

  def queries: Seq[Q] = Seq(
    Q(
      "ann_bruteforce",
      (s, dir) => {
        // top-k per query via the custom bounded-heap operator (no
        // per-group sort); rank derived afterwards over the k-bounded
        // result — the scalable decomposition of "ranked top-k".
        val top = graft.plans.GraftOps
          .topKPerGroup(scoredPairs(corpus(s, dir)), Seq(col("q_id")), K, col("cosine").desc, col("vec_id"))
        val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
        top
          .withColumn("rank", row_number().over(w))
          .select("q_id", "rank", "vec_id", "cosine")
          .orderBy("q_id", "rank")
      },
      Some(s"""$scoredSql,
             |ranked AS (SELECT q_id, vec_id, cosine,
             |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank FROM scored)
             |SELECT q_id, rank, vec_id, cosine FROM ranked WHERE rank <= $K ORDER BY q_id, rank""".stripMargin)
    ),
    Q(
      "ann_range_search",
      // Radius search: ALL corpus vectors with cosine >= 0.35 of each
      // query — the retrieval-filtering complement of top-k (dedup uses
      // the same shape over self-pairs). Same broadcast-queries /
      // streaming-corpus decomposition as ann_bruteforce; the threshold
      // compares bit-identical doubles (exact integer dot, one IEEE
      // division) so the cut is stable cross-engine.
      (s, dir) =>
        scoredPairs(corpus(s, dir))
          .filter(col("cosine") >= 0.35)
          .orderBy("q_id", "vec_id"),
      Some(s"""$scoredSql
             |SELECT q_id, vec_id, cosine FROM scored WHERE cosine >= 0.35 ORDER BY q_id, vec_id""".stripMargin)
    ),
    Q(
      "ann_filtered",
      // FILTERED vector search — the hybrid-retrieval shape every
      // production vector store needs (metadata predicate AND nearest
      // neighbors): top-k per query restricted to corpus vectors
      // sharing the query's label. The filter is applied as a JOIN KEY
      // (pre-filtering), so non-matching vectors are eliminated before
      // any distance is computed — never score-then-discard
      // (post-filtering), which wastes the entire scan when the
      // predicate is selective and can return < k rows.
      //
      // Scale posture: identical to ann_bruteforce (broadcast queries x
      // streaming corpus, bounded-heap top-k) with the label equality
      // folded into the broadcast hash join's key. With an IVF index
      // the same pre-filter becomes "intersect the probe's posting list
      // with the metadata index before ADC scoring".
      (s, dir) => {
        val c = corpus(s, dir)
        val q = c
          .filter(col("vec_id") < 10)
          .select(
            col("vec_id").as("q_id"),
            col("label").as("q_label"),
            col("qv").as("qe"),
            col("nsq").as("qn"))
        val scored = c
          .join(broadcast(q), col("label") === col("q_label") && col("vec_id") =!= col("q_id"))
          .withColumn("cosine", cosineFrom(dotQ(col("qe"), col("qv")), col("qn"), col("nsq")))
          .select("q_id", "vec_id", "cosine")
        val top = graft.plans.GraftOps
          .topKPerGroup(scored, Seq(col("q_id")), K, col("cosine").desc, col("vec_id"))
        val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
        top
          .withColumn("rank", row_number().over(w))
          .select("q_id", "rank", "vec_id", "cosine")
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH n AS (SELECT vec_id, label,
             |      [CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT) for x in embedding] AS qv FROM embeddings),
             |m AS (SELECT vec_id, label, qv,
             |      (SELECT SUM(qv[i]*qv[i]) FROM UNNEST(range(1, len(qv)+1)) AS t(i)) AS nsq FROM n),
             |q AS (SELECT vec_id AS q_id, label AS q_label, qv AS qe, nsq AS qn FROM m WHERE vec_id < 10),
             |scored AS (SELECT q.q_id, m.vec_id,
             |  CAST((SELECT SUM(q.qe[i]*m.qv[i]) FROM UNNEST(range(1, len(q.qe)+1)) AS t(i)) AS DOUBLE)
             |    / (sqrt(CAST(q.qn AS DOUBLE))*sqrt(CAST(m.nsq AS DOUBLE))) AS cosine
             |  FROM m JOIN q ON m.label = q.q_label AND m.vec_id <> q.q_id),
             |ranked AS (SELECT q_id, vec_id, cosine,
             |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank FROM scored)
             |SELECT q_id, rank, vec_id, cosine FROM ranked WHERE rank <= $K ORDER BY q_id, rank""".stripMargin)
    ),
    Q(
      "ann_lsh",
      (s, dir) => {
        // 6-bit random-hyperplane signature over the quantized vector —
        // md5-derived CONSTANT planes (VectorFunctions.hyperBucket), so
        // the identical bucket is computable in DuckDB and the query
        // has a full SQL oracle. 64 buckets sizes the cells to the
        // corpus (a production corpus raises bits to keep cell width
        // bounded). Multiprobe: the query's own bucket plus all
        // hamming-1 neighbors — 7 equality probes per query.
        val c = corpus(s, dir)
        val sig = c.withColumn("bucket", hyperBucket(col("qv"), bits = 6))
        val q = sig
          .filter(col("vec_id") < 10)
          .select(
            col("vec_id").as("q_id"),
            col("qv").as("qe"),
            col("nsq").as("qn"),
            explode(
              array(
                col("bucket") +:
                  (0 until 6).map(j => col("bucket").bitwiseXOR(lit(1L << j))): _*))
              .as("bucket"))
        // top-k through the bounded-heap operator (no per-group sort of
        // the full candidate set); rank derived over the k-bounded rows
        // only — same decomposition as ann_bruteforce.
        val cand = sig
          .join(broadcast(q), Seq("bucket"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cosine", cosineFrom(dotQ(col("qe"), col("qv")), col("qn"), col("nsq")))
        val top = graft.plans.GraftOps
          .topKPerGroup(cand, Seq(col("q_id")), K, col("cosine").desc, col("vec_id"))
        val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
        top
          .withColumn("rank", row_number().over(w))
          .select("q_id", "rank", "vec_id", "cosine")
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH n AS (SELECT vec_id,
             |      [CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT) for x in embedding] AS qv FROM embeddings),
             |m AS (SELECT vec_id, qv,
             |      (SELECT SUM(qv[i]*qv[i]) FROM UNNEST(range(1, len(qv)+1)) AS t(i)) AS nsq,
             |      ${hyperBucketSql("qv", bits = 6)} AS bucket FROM n),
             |q AS (SELECT vec_id AS q_id, qv AS qe, nsq AS qn, pb FROM m,
             |      UNNEST([bucket, xor(bucket,1), xor(bucket,2), xor(bucket,4), xor(bucket,8),
             |              xor(bucket,16), xor(bucket,32)]) AS t(pb)
             |      WHERE vec_id < 10),
             |scored AS (SELECT q.q_id, m.vec_id,
             |  CAST((SELECT SUM(q.qe[i]*m.qv[i]) FROM UNNEST(range(1, len(q.qe)+1)) AS t(i)) AS DOUBLE)
             |    / (sqrt(CAST(q.qn AS DOUBLE))*sqrt(CAST(m.nsq AS DOUBLE))) AS cosine
             |  FROM q JOIN m ON q.pb = m.bucket WHERE m.vec_id <> q.q_id),
             |ranked AS (SELECT q_id, vec_id, cosine,
             |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank FROM scored)
             |SELECT q_id, rank, vec_id, cosine FROM ranked WHERE rank <= $K ORDER BY q_id, rank""".stripMargin)
    ),
    Q(
      "ann_pq",
      // Product quantization (Jégou et al., PAMI 2011) — the memory-
      // bound scale path: each vector is stored as m=8 one-byte-ish
      // codes (nearest sub-codebook centroid per 8-dim subspace) and
      // queries score the whole corpus from an 8×|cells| lookup table
      // (ADC) without touching the raw floats. Everything stays in the
      // exact-integer discipline so the query has a full SQL oracle:
      // centroids are per-label SUM vectors with a count (as ann_ivf),
      // distances compare -2·v·s·c + ssq over the common denominator c²
      // (one IEEE division of exact BIGINTs — bit-identical cross-
      // engine), and the per-subspace LUT entry is fixed-pointed to a
      // BIGINT (round(1e6·d)) so the 8-way ADC SUM is an integer
      // aggregate — order-independent, no float-summation drift.
      //
      // Scale posture: codebooks and the per-query LUT are tiny and
      // broadcast; code assignment is a map-side partial min_by keyed
      // (vec_id, j); the only wide shuffle is the (q_id, vec_id) ADC
      // sum, map-side combined from m rows per pair. A production
      // deployment collects the m codes into one array column and folds
      // the LUT in a single projection (no per-j rows at all); the
      // exploded shape here keeps every stage oracle-expressible.
      (s, dir) => {
        val adc = pqAdc(corpus(s, dir))
        val top = graft.plans.GraftOps
          .topKPerGroup(adc, Seq(col("q_id")), K, col("adc").asc, col("vec_id"))
        val w = Window.partitionBy("q_id").orderBy(col("adc").asc, col("vec_id"))
        top
          .withColumn("rank", row_number().over(w))
          .select("q_id", "rank", "vec_id", "adc")
          .orderBy("q_id", "rank")
      },
      Some(s"""$pqAdcSql,
             |ranked AS (SELECT q_id, vec_id, adc,
             |        row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rank FROM adc)
             |SELECT q_id, rank, vec_id, adc FROM ranked WHERE rank <= $K ORDER BY q_id, rank""".stripMargin)
    ),
    Q(
      "ann_rerank_exact",
      // Two-stage retrieval — THE production serving shape (FAISS
      // search(..., k') + refine; every deployed PQ index runs this):
      // stage 1 generates a C=20 shortlist per query from the
      // compressed codes alone (pqAdc — the corpus' raw floats are
      // never touched), stage 2 re-ranks ONLY the shortlist with the
      // exact cosine and keeps top-K. PQ's lossy codes misORDER near
      // neighbors far more often than they DROP them from a 4K-deep
      // shortlist, so the cheap exact pass over C rows per query
      // recovers most of the recall the codes lose (AnnSpec measures
      // shortlist recall@5 vs raw-PQ top-5 recall@5 against brute).
      //
      // Scale posture: stage 1 is ann_pq's memory-bound regime (codes
      // + broadcast LUTs, map-side-combined ADC sum); stage 2 touches
      // C·|queries| raw vectors via an equi-join of the tiny shortlist
      // against the corpus — fixed-size work per query, independent of
      // corpus size. The exact stage's join is keyed on vec_id, so at
      // 100 TB it is a point-lookup pattern (shortlist broadcast
      // against the vector store), never a scan.
      (s, dir) => {
        val c = corpus(s, dir)
        val C = 20
        val shortlist = graft.plans.GraftOps
          .topKPerGroup(pqAdc(c), Seq(col("q_id")), C, col("adc").asc, col("vec_id"))
          .select("q_id", "vec_id")
        // exact re-rank: raw vectors are read for shortlist members only
        val scored = broadcast(shortlist)
          .join(c.select(col("vec_id"), col("qv"), col("nsq")), "vec_id")
          .join(broadcast(queriesDf(c)), "q_id")
          .withColumn("cosine", cosineFrom(dotQ(col("qe"), col("qv")), col("qn"), col("nsq")))
        val top = graft.plans.GraftOps
          .topKPerGroup(scored, Seq(col("q_id")), K, col("cosine").desc, col("vec_id"))
        val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
        top
          .withColumn("rank", row_number().over(w))
          .select("q_id", "rank", "vec_id", "cosine")
          .orderBy("q_id", "rank")
      },
      Some(s"""$pqAdcSql,
             |mq AS (SELECT vec_id, qv,
             |       (SELECT SUM(qv[i]*qv[i]) FROM UNNEST(range(1, len(qv)+1)) AS t(i)) AS nsq FROM n),
             |shortlist AS (SELECT q_id, vec_id FROM
             |   (SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rn FROM adc)
             |   WHERE rn <= 20),
             |qs AS (SELECT vec_id AS q_id, qv AS qe, nsq AS qn FROM mq WHERE vec_id < 10),
             |scored AS (SELECT sl.q_id, sl.vec_id,
             |  CAST((SELECT SUM(q.qe[i]*v.qv[i]) FROM UNNEST(range(1, len(q.qe)+1)) AS t(i)) AS DOUBLE)
             |    / (sqrt(CAST(q.qn AS DOUBLE))*sqrt(CAST(v.nsq AS DOUBLE))) AS cosine
             |  FROM shortlist sl JOIN mq v ON v.vec_id = sl.vec_id JOIN qs q ON q.q_id = sl.q_id),
             |ranked AS (SELECT q_id, vec_id, cosine,
             |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank FROM scored)
             |SELECT q_id, rank, vec_id, cosine FROM ranked WHERE rank <= $K ORDER BY q_id, rank""".stripMargin)
    ),
    Q(
      "ann_ivf",
      (s, dir) => {
        val c = corpus(s, dir)
        // k-means-lite centroids in EXACT integer space + aggregation-
        // argmax assignment — see centroidsOf/coarseAssign for the
        // oracle-portability and shuffle-shape rationale. Cached (r18):
        // cents is broadcast twice, assigned feeds both ivfSearch
        // consumers. assigned is PERSISTED, not truncated — AnnSpec
        // pins the min_by partial combine structurally, and persist
        // keeps the producing plan visible through the cache scan
        // (truncate would flatten it to an RDD leaf).
        val cents = graft.GraftCache.truncate(coarseCentroids(c))
        val assigned = graft.GraftCache.register(coarseAssign(c, cents).persist())
        ivfSearch(assigned, cents)
      },
      Some(ivfSql)
    ),
    Q(
      "ann_index_persist",
      // The SERVING shape of the IVF index: build-time and query-time
      // are separate processes in production — the index artifacts
      // (centroid table + cell-assigned vector table) are built once,
      // written to storage, and query nodes open THOSE, never the
      // builder's in-memory frames. This query proves the round trip:
      // the same artifacts ann_ivf computes are persisted to parquet
      // (assignments partitioned BY CELL — so a query's nprobe cell
      // list prunes to 2 directories at the file listing, the layout
      // that makes a 100 TB index serveable), reopened cold, and
      // searched with the shared nprobe=2 path. The oracle is
      // ann_ivf's: persistence must be lossless, so any array/decimal
      // round-trip corruption or partition mix-up breaks the hash.
      (s, dir) => {
        val c = corpus(s, dir)
        // truncated: cents feeds the artifact write AND the assignment
        // broadcast (r18)
        val cents = graft.GraftCache.truncate(coarseCentroids(c))
        val assigned = coarseAssign(c, cents)
        val base = graft.Stage.dir("graft_ivf_idx_", dir).getPath
        cents.write.mode("overwrite").parquet(s"$base/centroids")
        assigned
          .write.mode("overwrite")
          .partitionBy("cell")
          .parquet(s"$base/assigned")
        val s2 = c.sparkSession
        ivfSearch(
          s2.read.parquet(s"$base/assigned"),
          s2.read.parquet(s"$base/centroids"))
      },
      Some(ivfSql)
    ),
    Q(
      "ann_ivf_filtered",
      // Pre-filtered search THROUGH THE INDEX — the scale path
      // ann_filtered's comment promises ("with an IVF index the same
      // pre-filter becomes: intersect the probe's posting list with
      // the metadata index before ADC scoring"), now implemented: the
      // metadata predicate (corpus label = query label) lands on the
      // probed cells' posting lists BEFORE any distance is computed,
      // so a selective filter shrinks the scored set instead of
      // wasting scan on discarded candidates. Cells are probed by the
      // UNfiltered coarse score (the index is shared across filters);
      // queries whose label is rare in their probed cells legitimately
      // return < k rows — the honest filtered-index semantics.
      (s, dir) => {
        val c = corpus(s, dir)
        // truncated: cents is broadcast twice (assign + probe scoring),
        // assigned feeds the query filter AND the posting-list join (r18)
        val cents = graft.GraftCache.truncate(coarseCentroids(c))
        val assigned = graft.GraftCache.truncate(coarseAssign(c, cents))
        val q = assigned
          .filter(col("vec_id") < 10)
          .select(
            col("vec_id").as("q_id"), col("label").as("q_label"),
            col("qv").as("qe"), col("nsq").as("qn"))
        val probeScored = q
          .join(broadcast(cents))
          .withColumn("score", dotQ(col("qe"), col("csum")).cast("double") / col("cnt"))
        val probes = graft.plans.GraftOps
          .topKPerGroup(probeScored, Seq(col("q_id")), 2, col("score").desc, col("cell"))
          .select("q_id", "q_label", "qe", "qn", "cell")
        val scored = assigned
          .join(broadcast(probes), Seq("cell"))
          .filter(col("label") === col("q_label") && col("vec_id") =!= col("q_id"))
          .withColumn("cosine", cosineFrom(dotQ(col("qe"), col("qv")), col("qn"), col("nsq")))
        val top = graft.plans.GraftOps
          .topKPerGroup(scored, Seq(col("q_id")), K, col("cosine").desc, col("vec_id"))
        val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
        top
          .withColumn("rank", row_number().over(w))
          .select("q_id", "rank", "vec_id", "cosine")
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH n AS (SELECT vec_id, label,
             |      [CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT) for x in embedding] AS qv FROM embeddings),
             |m AS (SELECT vec_id, label, qv,
             |      (SELECT SUM(qv[i]*qv[i]) FROM UNNEST(range(1, len(qv)+1)) AS t(i)) AS nsq FROM n),
             |cs AS (SELECT label AS cell, i, SUM(qv[i])::BIGINT AS sv
             |       FROM m, UNNEST(range(1, len(qv)+1)) AS t(i) GROUP BY 1, 2),
             |cent AS (SELECT cell, list(sv ORDER BY i) AS csum FROM cs GROUP BY 1),
             |cnt AS (SELECT label AS cell, COUNT(*) AS cnt FROM m GROUP BY 1),
             |cc AS (SELECT cell, csum, cnt FROM cent JOIN cnt USING (cell)),
             |sc AS (SELECT m.vec_id, m.label, m.qv, m.nsq, cc.cell,
             |       CAST((SELECT SUM(m.qv[i]*cc.csum[i]) FROM UNNEST(range(1, len(m.qv)+1)) AS t(i)) AS DOUBLE)/cc.cnt AS score
             |       FROM m CROSS JOIN cc),
             |asg AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn FROM sc),
             |assigned AS (SELECT vec_id, label, qv, nsq, cell FROM asg WHERE rn = 1),
             |qp AS (SELECT sc.vec_id AS q_id, sc.label AS q_label, sc.qv AS qe, sc.nsq AS qn, sc.cell,
             |       row_number() OVER (PARTITION BY sc.vec_id ORDER BY sc.score DESC, sc.cell) AS rn
             |       FROM sc WHERE sc.vec_id < 10),
             |probes AS (SELECT q_id, q_label, qe, qn, cell FROM qp WHERE rn <= 2),
             |scored AS (SELECT p.q_id, s.vec_id,
             |   CAST((SELECT SUM(p.qe[i]*s.qv[i]) FROM UNNEST(range(1, len(p.qe)+1)) AS t(i)) AS DOUBLE)
             |     / (sqrt(CAST(p.qn AS DOUBLE))*sqrt(CAST(s.nsq AS DOUBLE))) AS cosine
             |   FROM probes p JOIN assigned s ON s.cell = p.cell
             |   WHERE s.label = p.q_label AND s.vec_id <> p.q_id),
             |ranked AS (SELECT q_id, vec_id, cosine,
             |   row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank FROM scored)
             |SELECT q_id, rank, vec_id, cosine FROM ranked WHERE rank <= $K ORDER BY q_id, rank""".stripMargin)
    ),
    Q(
      "ann_index_append",
      // Day-2 INDEX APPEND — the ANN twin of dedup_lsh_incremental: a
      // new vector batch (vec_id ≥ 400) joins the index by ASSIGNMENT
      // against the FROZEN centroids trained on the seen corpus alone
      // (vec_id < 400) — no retrain, which is exactly how a production
      // IVF index absorbs daily embeddings until drift forces a
      // rebuild (ann_cell_stats is the dashboard that calls it).
      // Queries then serve from the merged assignment through the
      // shared nprobe=2 path; day-2 work = one broadcast-centroid
      // argmax over the batch.
      (s, dir) => {
        val c = corpus(s, dir)
        // truncated: cents is broadcast twice, the merged assignment
        // feeds both ivfSearch consumers (r18)
        val cents = graft.GraftCache.truncate(
          centroidsOf(c.filter(col("vec_id") < 400), "label"))
        ivfSearch(graft.GraftCache.truncate(coarseAssign(c, cents)), cents)
      },
      Some(frozenCentroidIvfSql)
    ),
    Q(
      "ann_ivf_snapshot",
      // The IVF index AS A SNAPSHOT TABLE — the serving layout of
      // ann_index_persist upgraded to the transactional layer: day-1
      // assignments commit range-clustered BY CELL with per-file cell
      // stats, the day-2 batch (vec_id ≥ 400, assigned against the
      // same frozen centroids as ann_index_append) lands as an
      // ordinary APPEND — atomic, time-travelable, vacuum-managed —
      // and its new files carry their own cell stats, so a query's
      // nprobe cell list STILL prunes at the manifest after any number
      // of day-2 appends (Round15Spec pins the strict file subset per
      // cell, both before and after the append). Search reads the
      // merged index through the manifest (never a directory listing)
      // and serves through the shared nprobe=2 path; the oracle is
      // ann_index_append's — the transactional detour must be
      // lossless, so an array round-trip corruption, a lost append,
      // or a stats mix-up breaks the hash.
      (s, dir) => {
        val c = corpus(s, dir)
        // truncated: cents is broadcast by BOTH day-1/day-2 assignments
        // and the search probe scoring (r18)
        val cents = graft.GraftCache.truncate(
          centroidsOf(c.filter(col("vec_id") < 400), "label"))
        val table = graft.Stage.dir("graft_ivfsnap_", dir).getPath
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(table))
        def clustered(df: DataFrame) = df
          .withColumn("cell", col("cell").cast("long"))
          .repartitionByRange(5, col("cell")).sortWithinPartitions("cell")
        graft.sources.SnapshotTable.commit(
          clustered(coarseAssign(c.filter(col("vec_id") < 400), cents)),
          table, append = false, statsColumns = Seq("cell"))
        graft.sources.SnapshotTable.commit(
          clustered(coarseAssign(c.filter(col("vec_id") >= 400), cents)),
          table, append = true, statsColumns = Seq("cell"))
        ivfSearch(graft.sources.SnapshotTable.read(c.sparkSession, table), cents)
      },
      Some(frozenCentroidIvfSql)
    ),
    Q(
      "ann_index_health",
      // Day-2 INDEX HEALTH — the centroid-DRIFT dashboard that decides
      // when ann_index_append's no-retrain absorption has gone on too
      // long (the signal production IVF deployments alert on): per
      // cell, the squared relative drift between the FROZEN centroid
      // recorded at train time (μ0 = c0/n0, label-seeded over vec_id
      // < 400) and the mean of the cell's CURRENT members after all
      // vectors assign to the frozen cells (μ1 = c1/n1). Computed as
      // an EXACT rational ppm over the common denominator —
      // 1e6·Σ(n0·c1j − n1·c0j)² div (n1²·Σc0j²) — in DECIMAL(38,0)/
      // HUGEINT intermediates (n0·c1j crosses BIGINT squared), BIGINT
      // on the wire; the threshold an operator sets on drift_ppm is
      // then bit-stable. Cells that received no current member are
      // dead cells — ann_cell_stats' axis, excluded here.
      //
      // Scale posture: one broadcast-centroid argmax over the corpus
      // (the existing assignment path), two map-side-combined per-cell
      // sum aggregations, then cells-sized narrow arithmetic.
      (s, dir) => {
        val c = corpus(s, dir)
        // truncated: cents feeds the assignment broadcast AND the
        // drift join (r18)
        val cents = graft.GraftCache.truncate(
          centroidsOf(c.filter(col("vec_id") < 400), "label"))
        // truncated: centroidsOf(assigned) scans its input twice (sum +
        // count aggregations) — one assignment shuffle, not two (r18)
        val assigned = graft.GraftCache.truncate(coarseAssign(c, cents))
        val cur = centroidsOf(assigned, "cell")
        cents
          .select(col("cell"), col("csum").as("c0"), col("cnt").as("n0"))
          .join(cur.select(col("cell"), col("csum").as("c1"), col("cnt").as("n1")), "cell")
          .withColumn(
            "num",
            expr("""aggregate(
                   |  zip_with(c1, c0, (y, x) ->
                   |    CAST(n0 AS DECIMAL(38,0)) * y - CAST(n1 AS DECIMAL(38,0)) * x),
                   |  CAST(0 AS DECIMAL(38,0)), (acc, v) -> acc + v * v)""".stripMargin))
          .withColumn(
            "den",
            expr("""aggregate(c0, CAST(0 AS DECIMAL(38,0)),
                   |  (acc, x) -> acc + CAST(x AS DECIMAL(38,0)) * x)""".stripMargin))
          .select(
            col("cell").cast("long").as("cell"),
            col("n0").as("n_trained"),
            col("n1").as("n_current"),
            expr("""CAST((num * 1000000)
                   | div (CAST(n1 AS DECIMAL(38,0)) * n1 * den) AS BIGINT)""".stripMargin)
              .as("drift_ppm"))
          .orderBy("cell")
      },
      Some("""WITH n AS (SELECT vec_id, label,
             |      [CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT) for x in embedding] AS qv FROM embeddings),
             |m AS (SELECT vec_id, label, qv,
             |      (SELECT SUM(qv[i]*qv[i]) FROM UNNEST(range(1, len(qv)+1)) AS t(i)) AS nsq FROM n),
             |cs AS (SELECT label AS cell, i, SUM(qv[i])::BIGINT AS sv
             |       FROM m, UNNEST(range(1, len(qv)+1)) AS t(i) WHERE vec_id < 400 GROUP BY 1, 2),
             |cent AS (SELECT cell, list(sv ORDER BY i) AS csum FROM cs GROUP BY 1),
             |cnt AS (SELECT label AS cell, COUNT(*) AS cnt FROM m WHERE vec_id < 400 GROUP BY 1),
             |cc AS (SELECT cell, csum, cnt FROM cent JOIN cnt USING (cell)),
             |sc AS (SELECT m.vec_id, m.qv, cc.cell,
             |       CAST((SELECT SUM(m.qv[i]*cc.csum[i]) FROM UNNEST(range(1, len(m.qv)+1)) AS t(i)) AS DOUBLE)/cc.cnt AS score
             |       FROM m CROSS JOIN cc),
             |asg AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn FROM sc),
             |assigned AS (SELECT vec_id, qv, cell FROM asg WHERE rn = 1),
             |c1s AS (SELECT cell, i, SUM(qv[i])::BIGINT AS sv
             |        FROM assigned, UNNEST(range(1, len(qv)+1)) AS t(i) GROUP BY 1, 2),
             |c1 AS (SELECT cell, list(sv ORDER BY i) AS csum1 FROM c1s GROUP BY 1),
             |n1 AS (SELECT cell, COUNT(*) AS cnt1 FROM assigned GROUP BY 1),
             |h AS (SELECT cc.cell, cc.cnt AS n0, n1.cnt1 AS nc, cc.csum AS c0, c1.csum1 AS cv
             |      FROM cc JOIN c1 USING (cell) JOIN n1 USING (cell)),
             |d AS (SELECT cell, n0, nc,
             |  list_sum([(CAST(n0 AS HUGEINT)*cv[i] - CAST(nc AS HUGEINT)*c0[i])
             |            * (CAST(n0 AS HUGEINT)*cv[i] - CAST(nc AS HUGEINT)*c0[i])
             |            for i in range(1, len(c0)+1)]) AS num,
             |  list_sum([CAST(c0[i] AS HUGEINT)*c0[i] for i in range(1, len(c0)+1)]) AS den
             |  FROM h)
             |SELECT cell::BIGINT AS cell, n0::BIGINT AS n_trained, nc::BIGINT AS n_current,
             |((num * 1000000) // (CAST(nc AS HUGEINT)*nc*den))::BIGINT AS drift_ppm
             |FROM d ORDER BY cell""".stripMargin)
    ),
    Q(
      "ann_nprobe_curve",
      // The IVF TUNING curve — recall@K as a function of nprobe (1, 2,
      // 4), the plot every vector-search deployment draws before
      // picking its latency/recall operating point. The exact top-K
      // baseline and the cell assignment are each computed ONCE
      // (persisted); the three probe widths share them, so the query is
      // one index build + one brute pass + three nprobe-bounded scans —
      // the marginal cost of a curve point is just its probe scan.
      // recall_ppm is an exact integer (hits·1e6 div (n_queries·K)), so
      // the curve itself is hash-verified cross-engine, and it must be
      // monotone in nprobe by construction (probing more cells only
      // adds candidates) — spec-asserted.
      (s, dir) => {
        val c = corpus(s, dir)
        val cents = coarseCentroids(c)
        val assigned = graft.GraftCache.register(coarseAssign(c, cents).persist())
        val brute = graft.GraftCache.register(
          graft.plans.GraftOps
            .topKPerGroup(scoredPairs(c), Seq(col("q_id")), K, col("cosine").desc, col("vec_id"))
            .select("q_id", "vec_id")
            .persist())
        // truncated: sits on the cached assigned (GraftCache.truncate)
        val probeScored = graft.GraftCache.truncate(
          assigned
            .filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("qv").as("qe"), col("nsq").as("qn"))
            .join(broadcast(cents))
            .withColumn("score", dotQ(col("qe"), col("csum")).cast("double") / col("cnt")))
        val nqDf = c.filter(col("vec_id") < 10).agg(count(lit(1)).as("nq"))
        val curve = Seq(1, 2, 4)
          .map { np =>
            val probes = graft.plans.GraftOps
              .topKPerGroup(probeScored, Seq(col("q_id")), np, col("score").desc, col("cell"))
              .select("q_id", "qe", "qn", "cell")
            val scored = assigned
              .join(broadcast(probes), Seq("cell"))
              .filter(col("vec_id") =!= col("q_id"))
              .withColumn("cosine", cosineFrom(dotQ(col("qe"), col("qv")), col("qn"), col("nsq")))
            graft.plans.GraftOps
              .topKPerGroup(scored, Seq(col("q_id")), K, col("cosine").desc, col("vec_id"))
              .join(brute, Seq("q_id", "vec_id"), "leftsemi")
              .agg(count(lit(1)).as("n_hits"))
              .select(lit(np.toLong).as("nprobe"), col("n_hits"))
          }
          .reduce(_.unionByName(_))
        curve
          .crossJoin(broadcast(nqDf))
          .selectExpr("nprobe", "n_hits", s"n_hits * 1000000 div (nq * $K) AS recall_ppm")
          .orderBy("nprobe")
      },
      Some(s"""$ivfBuildSql,
             |bq AS (SELECT vec_id AS q_id, qv AS qe, nsq AS qn FROM m WHERE vec_id < 10),
             |bscored AS (SELECT bq.q_id, m.vec_id,
             |  CAST((SELECT SUM(bq.qe[i]*m.qv[i]) FROM UNNEST(range(1, len(bq.qe)+1)) AS t(i)) AS DOUBLE)
             |    / (sqrt(CAST(bq.qn AS DOUBLE))*sqrt(CAST(m.nsq AS DOUBLE))) AS cosine
             |  FROM m CROSS JOIN bq WHERE m.vec_id <> bq.q_id),
             |brute AS (SELECT q_id, vec_id FROM
             |  (SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
             |   FROM bscored) WHERE rn <= $K),
             |qp AS (SELECT sc.vec_id AS q_id, sc.qv AS qe, sc.nsq AS qn, sc.cell,
             |       row_number() OVER (PARTITION BY sc.vec_id ORDER BY sc.score DESC, sc.cell) AS rn
             |       FROM sc WHERE sc.vec_id < 10),
             |nps AS (SELECT np FROM UNNEST([1, 2, 4]) AS t(np)),
             |probes AS (SELECT nps.np, qp.q_id, qp.qe, qp.qn, qp.cell
             |           FROM qp, nps WHERE qp.rn <= nps.np),
             |iscored AS (SELECT p.np, p.q_id, s.vec_id,
             |  CAST((SELECT SUM(p.qe[i]*s.qv[i]) FROM UNNEST(range(1, len(p.qe)+1)) AS t(i)) AS DOUBLE)
             |    / (sqrt(CAST(p.qn AS DOUBLE))*sqrt(CAST(s.nsq AS DOUBLE))) AS cosine
             |  FROM probes p JOIN assigned s ON s.cell = p.cell WHERE s.vec_id <> p.q_id),
             |ivtop AS (SELECT np, q_id, vec_id FROM
             |  (SELECT np, q_id, vec_id,
             |          row_number() OVER (PARTITION BY np, q_id ORDER BY cosine DESC, vec_id) AS rn
             |   FROM iscored) WHERE rn <= $K),
             |nq AS (SELECT COUNT(*)::BIGINT AS nq FROM bq),
             |hits AS (SELECT np, COUNT(*)::BIGINT AS n_hits
             |         FROM ivtop JOIN brute USING (q_id, vec_id) GROUP BY np)
             |SELECT np::BIGINT AS nprobe, n_hits, (n_hits * 1000000) // (nq.nq * $K) AS recall_ppm
             |FROM hits, nq ORDER BY nprobe""".stripMargin)
    ),
    Q(
      "ann_cell_stats",
      // IVF index-health report — the pre-deployment check next to
      // ann_recall_report: per-cell posting-list sizes plus each cell's
      // share (exact ppm) and balance factor (cell size ÷ perfectly-
      // balanced size, in milli — 1000 = ideal). Cell imbalance is THE
      // operational hazard of an IVF index at 100 TB: a hot cell turns
      // every probe that hits it into a scan of a disproportionate
      // posting list (the skew problem, inside the index), and the fix
      // — re-train centroids, split hot cells, or salt — starts from
      // exactly this table. All ratio columns are exact BIGINT
      // divisions, so the report hashes cross-engine.
      //
      // Scale posture: one map-side-combined count per cell over the
      // assignment (cells-sized result), then a 1-row broadcast of the
      // totals — never a second pass over the vectors.
      (s, dir) => {
        val c = corpus(s, dir)
        val cents = coarseCentroids(c)
        val assigned = coarseAssign(c, cents)
        val per = assigned.groupBy("cell").agg(count(lit(1)).as("n_vec"))
        val tot = per.agg(sum(col("n_vec")).as("total"), count(lit(1)).as("n_cells"))
        per
          .crossJoin(broadcast(tot))
          .selectExpr(
            "cell",
            "n_vec",
            "n_vec * 1000000 div total AS ppm",
            "n_vec * n_cells * 1000 div total AS balance_milli")
          .orderBy("cell")
      },
      Some(s"""$ivfBuildSql,
             |per AS (SELECT cell, COUNT(*)::BIGINT AS n_vec FROM assigned GROUP BY 1),
             |tot AS (SELECT SUM(n_vec)::BIGINT AS total, COUNT(*)::BIGINT AS n_cells FROM per)
             |SELECT cell, n_vec, (n_vec * 1000000) // total AS ppm,
             |(n_vec * n_cells * 1000) // total AS balance_milli
             |FROM per, tot ORDER BY cell""".stripMargin)
    ),
    Q(
      "ann_ivf_pq",
      // The production vector-index composition (Jégou et al. IVF-ADC;
      // the shape FAISS deploys as IndexIVFPQ): coarse quantizer
      // assigns each vector to a cell, the RESIDUAL v - centroid(cell)
      // is product-quantized per cell, and a query scans only its
      // nprobe nearest cells, scoring candidates from a per-(cell,
      // subspace) lookup table over the 8 codes — never touching raw
      // vectors. Everything stays in the exact-integer discipline so
      // the full composition is oracle-checkable: residuals are held
      // SCALED by the cell count (rv = v·cnt − csum, exact BIGINT),
      // sub-codebook centroids as (Σ scaled residuals, count), and
      // every distance is residDist's fixed shape — exact-integer
      // divisions and a left-associative double chain mirrored
      // operator-for-operator in SQL. LUT entries round to BIGINT so
      // the 8-way ADC sum is an integer aggregate (order-independent).
      //
      // Scale posture: codebooks are per-(cell, subspace, code) — tiny
      // (cells×8×codes rows), broadcast. Code assignment and the ADC
      // sum are map-side-combined aggregations; candidate generation is
      // nprobe-bounded by the (cell) equi-join — a query scores only
      // its probed cells' posting lists, never the corpus. At 100 TB
      // the raw vectors are read ONCE at index build; queries touch
      // 1-byte-ish codes, the memory-bound regime PQ exists for.
      (s, dir) => {
        // cache discipline (r18): without it the corpus (scan +
        // quantize) re-ran ~10x — cents is broadcast THREE times (each
        // materialization recomputing both centroid aggregations),
        // assigned twice, sub three times. persist the depth-1 corpus;
        // truncate the tiny derived stages (they sit on cached state —
        // GraftCache.truncate's nested-cache rule).
        val c = corpus(s, dir) // persisted by the helper
        val cents = graft.GraftCache.truncate(coarseCentroids(c))
        val assigned = graft.GraftCache.truncate(coarseAssign(c, cents))
        // scaled residual rv = v·cnt − csum: exact BIGINT elementwise
        val resid = assigned
          .join(broadcast(cents), Seq("cell"))
          .withColumn("rv", zip_with(col("qv"), col("csum"), (v, cs) => v * col("cnt") - cs))
          .select("vec_id", "cell", "cnt", "rv")
        val sub = resid
          .select(
            col("vec_id"), col("cell"), col("cnt"), col("rv"),
            explode(expr("sequence(0, 7)")).as("j"))
          .withColumn("sv", expr("slice(rv, j*8+1, 8)"))
          // k-means-lite seed for the sub-codebooks: a 4-bit random-
          // hyperplane bucket of the residual subvector (content-
          // derived — the label seed collapses here, because a coarse
          // cell is dominated by one label and the codebook degenerates
          // to a single code). The plane dot's SIGN is invariant under
          // the positive per-cell scaling of rv, and the same constant
          // planes are computable in DuckDB (hyperBucketSql).
          .withColumn("seed", hyperBucket(col("sv"), bits = 4, dim = 8))
          .select("vec_id", "cell", "cnt", "j", "sv", "seed")
          // truncated: sub feeds the two codebook aggregations AND the
          // code-assignment join (r18)
          .pipe(graft.GraftCache.truncate)
        // per-(cell, subspace) residual sub-codebooks over the seed
        val cb = sub
          .select(col("cell"), col("j"), col("seed"), posexplode(col("sv")))
          .groupBy("cell", "j", "seed", "pos")
          .agg(sum(col("col")).as("s"))
          .groupBy("cell", "j", "seed")
          .agg(
            transform(array_sort(collect_list(struct(col("pos"), col("s")))), x => x.getField("s"))
              .as("ssum"))
          .join(sub.groupBy("cell", "j", "seed").agg(count(lit(1)).as("scnt")), Seq("cell", "j", "seed"))
          .select(col("cell"), col("j"), col("seed").as("code"), col("ssum"), col("scnt"))
          // truncated: cb is broadcast twice (codes + lut) — tiny
          // (cells x 8 x codes rows), one materialization (r18)
          .pipe(graft.GraftCache.truncate)
        // codes: argmin residual distance per (vector, subspace) within
        // its cell — aggregation-argmin (map-side combine), not a window
        val codes = sub
          .join(broadcast(cb), Seq("cell", "j"))
          .withColumn("d", residDist(col("sv"), col("ssum"), col("scnt"), col("cnt")))
          .groupBy("vec_id", "j")
          .agg(min_by(struct(col("cell"), col("code")), struct(col("d"), col("code"))).as("best"))
          .select(col("vec_id"), col("j"), col("best.cell").as("cell"), col("best.code").as("code"))
        // nprobe=2 nearest cells per query, by the same coarse score as
        // ann_ivf (max mean dot)
        val probeScored = assigned
          .filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("qv").as("qe"))
          .join(broadcast(cents))
          .withColumn("score", dotQ(col("qe"), col("csum")).cast("double") / col("cnt"))
        val probes = graft.plans.GraftOps
          .topKPerGroup(probeScored, Seq(col("q_id")), 2, col("score").desc, col("cell"))
          .select("q_id", "qe", "cell", "csum", "cnt")
        // per-probe query residual → fixed-point LUT per (subspace, code)
        val qsub = probes
          .withColumn("qrv", zip_with(col("qe"), col("csum"), (v, cs) => v * col("cnt") - cs))
          .select(
            col("q_id"), col("cell"), col("cnt"), col("qrv"),
            explode(expr("sequence(0, 7)")).as("j"))
          .withColumn("qsv", expr("slice(qrv, j*8+1, 8)"))
        val lut = qsub
          .join(broadcast(cb), Seq("cell", "j"))
          .select(
            col("q_id"), col("cell"), col("j"), col("code"),
            round(residDist(col("qsv"), col("ssum"), col("scnt"), col("cnt"))).cast("long").as("fp"))
        // ADC: integer sum of the 8 LUT entries selected by the codes,
        // nprobe-bounded by the (cell) join key
        val adc = codes
          .join(broadcast(lut), Seq("cell", "j", "code"))
          .filter(col("vec_id") =!= col("q_id"))
          .groupBy("q_id", "vec_id")
          .agg(sum(col("fp")).as("adc"))
        val top = graft.plans.GraftOps
          .topKPerGroup(adc, Seq(col("q_id")), K, col("adc").asc, col("vec_id"))
        val w = Window.partitionBy("q_id").orderBy(col("adc").asc, col("vec_id"))
        top
          .withColumn("rank", row_number().over(w))
          .select("q_id", "rank", "vec_id", "adc")
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH n AS (SELECT vec_id, label,
             |      [CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT) for x in embedding] AS qv FROM embeddings),
             |m AS (SELECT vec_id, label, qv,
             |      (SELECT SUM(qv[i]*qv[i]) FROM UNNEST(range(1, len(qv)+1)) AS t(i)) AS nsq FROM n),
             |cs AS (SELECT label AS cell, i, SUM(qv[i])::BIGINT AS sv
             |       FROM m, UNNEST(range(1, len(qv)+1)) AS t(i) GROUP BY 1, 2),
             |cent AS (SELECT cell, list(sv ORDER BY i) AS csum FROM cs GROUP BY 1),
             |cntc AS (SELECT label AS cell, COUNT(*) AS cnt FROM m GROUP BY 1),
             |cc AS (SELECT cell, csum, cnt FROM cent JOIN cntc USING (cell)),
             |sc AS (SELECT m.vec_id, m.label, m.qv, cc.cell,
             |       CAST((SELECT SUM(m.qv[i]*cc.csum[i]) FROM UNNEST(range(1, len(m.qv)+1)) AS t(i)) AS DOUBLE)/cc.cnt AS score
             |       FROM m CROSS JOIN cc),
             |asg AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn FROM sc),
             |assigned AS (SELECT vec_id, label, qv, cell FROM asg WHERE rn = 1),
             |ar AS (SELECT a.vec_id, a.cell, cc.cnt,
             |       [a.qv[i]*cc.cnt - cc.csum[i] for i in range(1, 65)] AS rv
             |       FROM assigned a JOIN cc USING (cell)),
             |subr AS (SELECT vec_id, cell, cnt, j, rv[j*8+1 : j*8+8] AS sv
             |        FROM ar, UNNEST(range(8)) AS t(j)),
             |sub AS (SELECT *, ${hyperBucketSql("sv", bits = 4, dim = 8)} AS seed FROM subr),
             |cbs AS (SELECT cell, j, seed AS code, i, SUM(sv[i])::BIGINT AS s
             |        FROM sub, UNNEST(range(1, 9)) AS t(i) GROUP BY 1, 2, 3, 4),
             |cbl AS (SELECT cell, j, code, list(s ORDER BY i) AS ssum FROM cbs GROUP BY 1, 2, 3),
             |sct AS (SELECT cell, j, seed AS code, COUNT(*) AS scnt FROM sub GROUP BY 1, 2, 3),
             |cb AS (SELECT cell, j, code, ssum, scnt FROM cbl JOIN sct USING (cell, j, code)),
             |cd AS (SELECT s.vec_id, s.j, s.cell, c.code,
             |       ${residDistSql("s.sv", "c.ssum", "c.scnt", "s.cnt")} AS d
             |       FROM sub s JOIN cb c ON s.cell = c.cell AND s.j = c.j),
             |codes AS (SELECT vec_id, j, cell, code FROM
             |          (SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY d, code) AS rn FROM cd)
             |          WHERE rn = 1),
             |qp AS (SELECT sc.vec_id AS q_id, sc.qv AS qe, sc.cell,
             |       row_number() OVER (PARTITION BY sc.vec_id ORDER BY sc.score DESC, sc.cell) AS rn
             |       FROM sc WHERE sc.vec_id < 10),
             |probes AS (SELECT q_id, qe, cell FROM qp WHERE rn <= 2),
             |qr AS (SELECT p.q_id, p.cell, cc.cnt,
             |       [p.qe[i]*cc.cnt - cc.csum[i] for i in range(1, 65)] AS qrv
             |       FROM probes p JOIN cc USING (cell)),
             |qsub AS (SELECT q_id, cell, cnt, j, qrv[j*8+1 : j*8+8] AS qsv
             |         FROM qr, UNNEST(range(8)) AS t(j)),
             |lut AS (SELECT q.q_id, q.cell, q.j, c.code,
             |        CAST(round(${residDistSql("q.qsv", "c.ssum", "c.scnt", "q.cnt")}) AS BIGINT) AS fp
             |        FROM qsub q JOIN cb c ON q.cell = c.cell AND q.j = c.j),
             |adc AS (SELECT l.q_id, k.vec_id, SUM(l.fp)::BIGINT AS adc
             |        FROM codes k JOIN lut l ON k.cell = l.cell AND k.j = l.j AND k.code = l.code
             |        WHERE k.vec_id <> l.q_id GROUP BY 1, 2),
             |ranked AS (SELECT q_id, vec_id, adc,
             |        row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rank FROM adc)
             |SELECT q_id, rank, vec_id, adc FROM ranked WHERE rank <= $K ORDER BY q_id, rank""".stripMargin)
    ),
    Q(
      "ann_recall_report",
      // Recall@k of the LSH index vs the exact baseline AS DATA — the
      // observability query an ANN deployment runs on a sampled slice
      // before trusting the index (AnnSpec asserts a floor in CI; this
      // emits the per-query numbers a dashboard tracks). Joins the
      // brute-force top-k with the LSH top-k per query: n_hit / n_brute
      // is recall@5, kept as exact integers so the oracle comparison
      // never touches a ratio.
      //
      // Scale posture: this is the one place brute force is FINE — it
      // runs over a small query SAMPLE (10 here), so the exact side is
      // a broadcast-queries scan, not an all-pairs join; the index side
      // is the production probe path unchanged. At 100 TB the sample
      // stays fixed-size while the corpus grows — the report costs one
      // corpus scan regardless of index size.
      (s, dir) => {
        val c = corpus(s, dir)
        val brute = graft.plans.GraftOps
          .topKPerGroup(scoredPairs(c), Seq(col("q_id")), K, col("cosine").desc, col("vec_id"))
          .select("q_id", "vec_id")
        val sig = c.withColumn("bucket", hyperBucket(col("qv"), bits = 6))
        val q = sig
          .filter(col("vec_id") < 10)
          .select(
            col("vec_id").as("q_id"),
            col("qv").as("qe"),
            col("nsq").as("qn"),
            explode(
              array(
                col("bucket") +:
                  (0 until 6).map(j => col("bucket").bitwiseXOR(lit(1L << j))): _*))
              .as("bucket"))
        val cand = sig
          .join(broadcast(q), Seq("bucket"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cosine", cosineFrom(dotQ(col("qe"), col("qv")), col("qn"), col("nsq")))
        val lsh = graft.plans.GraftOps
          .topKPerGroup(cand, Seq(col("q_id")), K, col("cosine").desc, col("vec_id"))
          .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
        brute
          .join(lsh, Seq("q_id", "vec_id"), "left")
          .groupBy("q_id")
          .agg(
            count(lit(1)).as("n_brute"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .orderBy("q_id")
      },
      Some(s"""WITH n AS (SELECT vec_id,
             |      [CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT) for x in embedding] AS qv FROM embeddings),
             |m AS (SELECT vec_id, qv,
             |      (SELECT SUM(qv[i]*qv[i]) FROM UNNEST(range(1, len(qv)+1)) AS t(i)) AS nsq,
             |      ${hyperBucketSql("qv", bits = 6)} AS bucket FROM n),
             |q AS (SELECT vec_id AS q_id, qv AS qe, nsq AS qn FROM m WHERE vec_id < 10),
             |bscored AS (SELECT q.q_id, m.vec_id,
             |  CAST((SELECT SUM(q.qe[i]*m.qv[i]) FROM UNNEST(range(1, len(q.qe)+1)) AS t(i)) AS DOUBLE)
             |    / (sqrt(CAST(q.qn AS DOUBLE))*sqrt(CAST(m.nsq AS DOUBLE))) AS cosine
             |  FROM m CROSS JOIN q WHERE m.vec_id <> q.q_id),
             |brank AS (SELECT q_id, vec_id,
             |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank FROM bscored),
             |brute AS (SELECT q_id, vec_id FROM brank WHERE rank <= $K),
             |qp AS (SELECT vec_id AS q_id, qv AS qe, nsq AS qn, pb FROM m,
             |      UNNEST([bucket, xor(bucket,1), xor(bucket,2), xor(bucket,4), xor(bucket,8),
             |              xor(bucket,16), xor(bucket,32)]) AS t(pb)
             |      WHERE vec_id < 10),
             |lscored AS (SELECT qp.q_id, m.vec_id,
             |  CAST((SELECT SUM(qp.qe[i]*m.qv[i]) FROM UNNEST(range(1, len(qp.qe)+1)) AS t(i)) AS DOUBLE)
             |    / (sqrt(CAST(qp.qn AS DOUBLE))*sqrt(CAST(m.nsq AS DOUBLE))) AS cosine
             |  FROM qp JOIN m ON qp.pb = m.bucket WHERE m.vec_id <> qp.q_id),
             |lrank AS (SELECT q_id, vec_id,
             |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank FROM lscored),
             |lsh AS (SELECT q_id, vec_id FROM lrank WHERE rank <= $K)
             |SELECT b.q_id, COUNT(*) AS n_brute,
             |SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit
             |FROM brute b LEFT JOIN lsh l ON b.q_id = l.q_id AND b.vec_id = l.vec_id
             |GROUP BY b.q_id ORDER BY b.q_id""".stripMargin)
    ),
    Q(
      "ann_hybrid_rrf",
      // Hybrid retrieval: fuse a KEYWORD ranking (inverted-index shape
      // over documents, as text_keyword_search) with a VECTOR ranking
      // (exact cosine of the corpus against query vector 0) by
      // reciprocal-rank fusion — score = Σ 1/(60+rank), the standard
      // RRF with k=60, computed in EXACT fixed point
      // (1e12 div (60+rank), BIGINT) so no float ever enters the
      // fusion. The shared id domain of documents and embeddings plays
      // the doc ↔ embedding linkage a production corpus carries.
      //
      // Scale posture: each branch reduces to a top-50 candidate list
      // before fusion — the keyword branch filters postings to the
      // query terms inside the narrow explode stage and takes top-50
      // via TakeOrdered (never a global sort); the vector branch is the
      // production broadcast-query scored path. Fusion is a full-outer
      // join of two ≤50-row frames and the final top-20 another
      // TakeOrdered; the per-branch rank windows run on 50-row frames
      // (deliberately unpartitioned — candidate lists, not the corpus).
      (s, dir) => {
        import graft.functions.TextFunctions.{keywordOrder, keywordScores}
        val terms = Seq("spark", "window", "hash")
        // scoring + order shared with text_keyword_search
        // (TextFunctions.keywordScores — one definition of "relevance")
        val kw = keywordScores(Tables(s, dir).documents, terms)
          .orderBy(keywordOrder: _*)
          .limit(50)
          // unpartitioned row_number over the LIMITed 50-row candidate
          // list — deliberate (RRF fuses tiny top-k lists)
          .withColumn("r_kw", row_number().over(Window.orderBy(keywordOrder: _*)).cast("long"))
          .select(col("doc_id").as("id"), col("r_kw"))
        val vecOrder: Seq[org.apache.spark.sql.Column] =
          Seq(col("cosine").desc, col("vec_id").asc)
        val vec = scoredPairs(corpus(s, dir))
          .filter(col("q_id") === 0)
          .orderBy(vecOrder: _*)
          .limit(50)
          .withColumn("r_vec", row_number().over(Window.orderBy(vecOrder: _*)).cast("long"))
          .select(col("vec_id").as("id"), col("r_vec"))
        kw.join(vec, Seq("id"), "full_outer")
          .select(
            col("id"),
            (coalesce(expr("1000000000000 div (60 + r_kw)"), lit(0L)) +
              coalesce(expr("1000000000000 div (60 + r_vec)"), lit(0L))).as("rrf"),
            col("r_kw"),
            col("r_vec"))
          .orderBy(col("rrf").desc, col("id"))
          .limit(20)
      },
      Some(s"""$scoredSql,
             |${graft.functions.TextFunctions.keywordScoresSql("documents", Seq("spark", "window", "hash"))},
             |kr AS (SELECT doc_id AS id,
             |         ROW_NUMBER() OVER (ORDER BY n_terms DESC, tf DESC, doc_id) AS r_kw
             |       FROM kagg QUALIFY r_kw <= 50),
             |vr AS (SELECT vec_id AS id,
             |         ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS r_vec
             |       FROM scored WHERE q_id = 0 QUALIFY r_vec <= 50)
             |SELECT COALESCE(kr.id, vr.id) AS id,
             |  (COALESCE(1000000000000 // (60 + r_kw), 0)
             |   + COALESCE(1000000000000 // (60 + r_vec), 0))::BIGINT AS rrf,
             |  CAST(r_kw AS BIGINT) AS r_kw, CAST(r_vec AS BIGINT) AS r_vec
             |FROM kr FULL OUTER JOIN vr ON kr.id = vr.id
             |ORDER BY rrf DESC, id LIMIT 20""".stripMargin)
    ),
    Q(
      "ann_ivf_sq8",
      // The second composed production index (FAISS IndexIVFScalarQuantizer
      // shape, completing the quantizer x coarse-index matrix next to
      // ann_ivf_pq): coarse cells bound WHICH vectors are scored
      // (nprobe=2 posting lists — scan cost ~ nprobe/ncells of the
      // corpus), SQ8 bounds WHAT is read per vector (one byte per
      // component instead of a float — 4x less IO on the posting
      // lists). Codes are global per-dimension [min,max] quantization
      // over the RAW vectors (the by_residual=false FAISS variant —
      // one code table serves every cell, so a cell split/merge never
      // re-encodes); search is the same asymmetric integer ADC as
      // ann_sq8, restricted to the probed cells' lists.
      //
      // Scale posture: probes come from the broadcast centroid table
      // through the bounded-heap operator; the ADC join touches only
      // probed posting lists; the LUT stays structural-size (queries x
      // 64 dims x 256 codes, broadcast); sums in exact DECIMAL(38,0),
      // wire format the lossless hi/lo BIGINT split (ann_sq8's
      // contract).
      (s, dir) => {
        val c = corpus(s, dir)
        // truncated: cents is broadcast twice, assigned feeds the code
        // table, the probe scoring AND the ADC posting-list join (r18)
        val cents = graft.GraftCache.truncate(coarseCentroids(c))
        val assigned = graft.GraftCache.truncate(coarseAssign(c, cents))
        val stats = c
          .select(posexplode(col("qv")))
          .groupBy("pos")
          .agg(min(col("col")).as("mn"), max(col("col")).as("mx"))
        val codes = assigned
          .select(col("vec_id"), col("cell"), posexplode(col("qv")))
          .join(broadcast(stats), "pos")
          .select(
            col("vec_id"),
            col("cell"),
            col("pos"),
            when(col("mx") > col("mn"), expr("((col - mn) * 255) div (mx - mn)"))
              .otherwise(lit(0L)).as("code"))
        val probeScored = assigned
          .filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("qv").as("qe"))
          .join(broadcast(cents))
          .withColumn("score", dotQ(col("qe"), col("csum")).cast("double") / col("cnt"))
        val probes = graft.plans.GraftOps
          .topKPerGroup(probeScored, Seq(col("q_id")), 2, col("score").desc, col("cell"))
          .select("q_id", "cell")
        val lut = c
          .filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), posexplode(col("qv")).as(Seq("pos", "qe")))
          .join(broadcast(stats), "pos")
          .select(col("q_id"), col("pos"), col("qe"), col("mn"), col("mx"),
            explode(expr("sequence(CAST(0 AS BIGINT), CAST(255 AS BIGINT))")).as("code"))
          .withColumn("d", col("qe") * 255 - (col("mn") * 255 + col("code") * (col("mx") - col("mn"))))
          .select(col("q_id"), col("pos"), col("code"), (col("d") * col("d")).as("fp"))
        val adc = codes
          .join(broadcast(probes), Seq("cell"))
          .join(broadcast(lut), Seq("q_id", "pos", "code"))
          .filter(col("vec_id") =!= col("q_id"))
          .groupBy("q_id", "vec_id")
          .agg(sum(col("fp").cast("decimal(38,0)")).as("dist"))
        val top = graft.plans.GraftOps
          .topKPerGroup(adc, Seq(col("q_id")), K, col("dist").asc, col("vec_id"))
        val w = Window.partitionBy("q_id").orderBy(col("dist").asc, col("vec_id"))
        top
          .withColumn("rank", row_number().over(w))
          .withColumn("dist_hi", expr("dist div 1000000000"))
          .withColumn("dist_lo", expr("CAST(dist % 1000000000 AS BIGINT)"))
          .select("q_id", "rank", "vec_id", "dist_hi", "dist_lo")
          .orderBy("q_id", "rank")
      },
      Some(s"""$ivfBuildSql,
             |e2 AS (SELECT vec_id, i-1 AS pos, qv[i] AS v FROM n, UNNEST(range(1, len(qv)+1)) AS t(i)),
             |st AS (SELECT pos, MIN(v) AS mn, MAX(v) AS mx FROM e2 GROUP BY pos),
             |codes2 AS (SELECT e2.vec_id, a.cell, e2.pos,
             |           CASE WHEN mx > mn THEN ((v - mn) * 255) // (mx - mn) ELSE 0 END AS code
             |           FROM e2 JOIN st USING (pos) JOIN assigned a ON a.vec_id = e2.vec_id),
             |qp2 AS (SELECT sc.vec_id AS q_id, sc.cell,
             |        row_number() OVER (PARTITION BY sc.vec_id ORDER BY sc.score DESC, sc.cell) AS rn
             |        FROM sc WHERE sc.vec_id < 10),
             |probes2 AS (SELECT q_id, cell FROM qp2 WHERE rn <= 2),
             |lut2 AS (SELECT e2.vec_id AS q_id, e2.pos, cd AS code,
             |         (e2.v*255 - (st.mn*255 + cd*(st.mx - st.mn)))
             |           * (e2.v*255 - (st.mn*255 + cd*(st.mx - st.mn))) AS fp
             |         FROM e2 JOIN st USING (pos), UNNEST(range(0, 256)) AS t(cd)
             |         WHERE e2.vec_id < 10),
             |adc2 AS (SELECT p.q_id, k.vec_id, SUM(CAST(l.fp AS DECIMAL(38,0))) AS dist
             |         FROM codes2 k JOIN probes2 p ON k.cell = p.cell
             |         JOIN lut2 l ON l.q_id = p.q_id AND l.pos = k.pos AND l.code = k.code
             |         WHERE k.vec_id <> p.q_id GROUP BY 1, 2),
             |ranked2 AS (SELECT q_id, vec_id, dist,
             |        row_number() OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS rank FROM adc2)
             |SELECT q_id, rank, vec_id,
             |  CAST(CAST(dist AS HUGEINT) // 1000000000 AS BIGINT) AS dist_hi,
             |  CAST(CAST(dist AS HUGEINT) % 1000000000 AS BIGINT) AS dist_lo
             |FROM ranked2 WHERE rank <= $K ORDER BY q_id, rank""".stripMargin)
    ),
    Q(
      "ann_sq8",
      // Scalar quantization (FAISS SQ8): each dimension is trained to
      // its corpus [min, max] range and every component stored as ONE
      // 8-bit code — 4x the memory compression of raw floats with
      // near-exact recall (vs PQ's lossier 8-codes-per-vector). Search
      // is asymmetric ADC: the query stays exact, corpus vectors are
      // scored from their codes via a per-(dim, code) lookup table.
      // Exact-integer discipline throughout: codes are integer
      // divisions of quantized BIGINTs, the reconstruction is held as
      // an exact numerator over the common denominator 255
      // (recon = mn*255 + code*(mx-mn)), and the squared-distance sum
      // runs in DECIMAL(38,0) (64 terms of up to ~6e17 can exceed
      // BIGINT) — order-independent, bit-identical in DuckDB.
      //
      // Scale posture: training is ONE map-side-combined min/max
      // aggregation (64 rows out, broadcast); encoding is a narrow
      // per-row projection; the LUT is structural-size (queries x 64
      // dims x 256 codes — never corpus-derived), built by exploding a
      // constant sequence and broadcast; the only wide shuffle is the
      // (q_id, vec_id) ADC sum, map-side combined from 64 rows per
      // pair. Same deployment shape as ann_pq with the codebook
      // replaced by the trained ranges.
      (s, dir) => {
        val c = corpus(s, dir)
        // train: per-dimension corpus min/max (64 rows, broadcast)
        val stats = c
          .select(posexplode(col("qv")))
          .groupBy("pos")
          .agg(min(col("col")).as("mn"), max(col("col")).as("mx"))
        // encode: one 0..255 code per (vector, dimension)
        val codes = c
          .select(col("vec_id"), posexplode(col("qv")))
          .join(broadcast(stats), "pos")
          .select(
            col("vec_id"),
            col("pos"),
            when(col("mx") > col("mn"), expr("((col - mn) * 255) div (mx - mn)"))
              .otherwise(lit(0L)).as("code"))
        // per-query LUT over the FULL code domain (constant size):
        // d = qe*255 - recon_num, fp = d^2 (<= ~6e17, BIGINT-safe)
        val lut = c
          .filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), posexplode(col("qv")).as(Seq("pos", "qe")))
          .join(broadcast(stats), "pos")
          .select(col("q_id"), col("pos"), col("qe"), col("mn"), col("mx"),
            explode(expr("sequence(CAST(0 AS BIGINT), CAST(255 AS BIGINT))")).as("code"))
          .withColumn("d", col("qe") * 255 - (col("mn") * 255 + col("code") * (col("mx") - col("mn"))))
          .select(col("q_id"), col("pos"), col("code"), (col("d") * col("d")).as("fp"))
        val adc = codes
          .join(broadcast(lut), Seq("pos", "code"))
          .filter(col("vec_id") =!= col("q_id"))
          .groupBy("q_id", "vec_id")
          .agg(sum(col("fp").cast("decimal(38,0)")).as("dist"))
        val top = graft.plans.GraftOps
          .topKPerGroup(adc, Seq(col("q_id")), K, col("dist").asc, col("vec_id"))
        val w = Window.partitionBy("q_id").orderBy(col("dist").asc, col("vec_id"))
        // the exact DECIMAL(38,0) dist (worst case ~4e19 — past BIGINT,
        // past float64's 2^53 exactness) never rides the wire: it
        // splits losslessly into two BIGINTs over the 1e9 radix (hi
        // <= ~4e10, lo < 1e9), the driver-hashable wire family
        top
          .withColumn("rank", row_number().over(w))
          .withColumn("dist_hi", expr("dist div 1000000000"))
          .withColumn("dist_lo", expr("CAST(dist % 1000000000 AS BIGINT)"))
          .select("q_id", "rank", "vec_id", "dist_hi", "dist_lo")
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH n AS (SELECT vec_id,
             |      [CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT) for x in embedding] AS qv FROM embeddings),
             |e AS (SELECT vec_id, i-1 AS pos, qv[i] AS v FROM n, UNNEST(range(1, len(qv)+1)) AS t(i)),
             |st AS (SELECT pos, MIN(v) AS mn, MAX(v) AS mx FROM e GROUP BY pos),
             |codes AS (SELECT vec_id, e.pos,
             |          CASE WHEN mx > mn THEN ((v - mn) * 255) // (mx - mn) ELSE 0 END AS code
             |          FROM e JOIN st ON e.pos = st.pos),
             |lut AS (SELECT e.vec_id AS q_id, e.pos, cd AS code,
             |        (e.v*255 - (st.mn*255 + cd*(st.mx - st.mn)))
             |          * (e.v*255 - (st.mn*255 + cd*(st.mx - st.mn))) AS fp
             |        FROM e JOIN st ON e.pos = st.pos, UNNEST(range(0, 256)) AS t(cd)
             |        WHERE e.vec_id < 10),
             |adc AS (SELECT l.q_id, k.vec_id, SUM(CAST(l.fp AS DECIMAL(38,0))) AS dist
             |        FROM codes k JOIN lut l ON k.pos = l.pos AND k.code = l.code
             |        WHERE k.vec_id <> l.q_id GROUP BY 1, 2),
             |ranked AS (SELECT q_id, vec_id, dist,
             |        row_number() OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS rank FROM adc)
             |SELECT q_id, rank, vec_id,
             |  CAST(CAST(dist AS HUGEINT) // 1000000000 AS BIGINT) AS dist_hi,
             |  CAST(CAST(dist AS HUGEINT) % 1000000000 AS BIGINT) AS dist_lo
             |FROM ranked WHERE rank <= $K ORDER BY q_id, rank""".stripMargin)
    ),
    Q(
      "ann_matryoshka",
      // Dimension-adaptive two-stage retrieval (Kusupati et al. 2022,
      // Matryoshka Representation Learning — the "shortlist with the
      // first D' dims, rerank with all D" serving pattern OpenAI/Google
      // embedding APIs expose as truncatable dimensions): stage 1
      // scores the corpus with only the FIRST 16 of 64 components (4×
      // less memory traffic than the full vector — the same cost lever
      // as PQ but with zero training), keeps a C=25 shortlist per
      // query, stage 2 re-ranks the shortlist with the exact full-dim
      // cosine. Completes the cheap-pass family: quantized codes
      // (ann_rerank_exact) vs truncated dims (here) over the identical
      // refine stage.
      //
      // Scale posture: stage 1 is the brute plan on a 4×-narrower
      // payload (slice happens at scan, broadcast queries, bounded-heap
      // top-C); stage 2 is the fixed-size shortlist join of
      // ann_rerank_exact. Never more than one corpus pass.
      (s, dir) => {
        val c = corpus(s, dir)
        val C = 25
        val c16 = c.withColumn("qv16", slice(col("qv"), 1, 16))
          .withColumn("n16", dotQ(col("qv16"), col("qv16")))
        val q16 = c16
          .filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("qv16").as("qe16"), col("n16").as("qn16"))
        val pairs16 = c16
          .join(broadcast(q16), col("vec_id") =!= col("q_id"))
          .withColumn("cos16", cosineFrom(dotQ(col("qe16"), col("qv16")), col("qn16"), col("n16")))
        val shortlist = graft.plans.GraftOps
          .topKPerGroup(pairs16, Seq(col("q_id")), C, col("cos16").desc, col("vec_id"))
          .select("q_id", "vec_id")
        val scored = broadcast(shortlist)
          .join(c.select(col("vec_id"), col("qv"), col("nsq")), "vec_id")
          .join(broadcast(queriesDf(c)), "q_id")
          .withColumn("cosine", cosineFrom(dotQ(col("qe"), col("qv")), col("qn"), col("nsq")))
        val top = graft.plans.GraftOps
          .topKPerGroup(scored, Seq(col("q_id")), K, col("cosine").desc, col("vec_id"))
        val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
        top
          .withColumn("rank", row_number().over(w))
          .select("q_id", "rank", "vec_id", "cosine")
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH n AS (SELECT vec_id,
             |      [CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT) for x in embedding] AS qv FROM embeddings),
             |m AS (SELECT vec_id, qv, qv[1:16] AS qv16,
             |      (SELECT SUM(qv[i]*qv[i]) FROM UNNEST(range(1, len(qv)+1)) AS t(i)) AS nsq,
             |      (SELECT SUM(qv[i]*qv[i]) FROM UNNEST(range(1, 17)) AS t(i)) AS n16 FROM n),
             |q AS (SELECT vec_id AS q_id, qv16 AS qe16, n16 AS qn16 FROM m WHERE vec_id < 10),
             |s1 AS (SELECT q.q_id, m.vec_id,
             |  CAST((SELECT SUM(q.qe16[i]*m.qv16[i]) FROM UNNEST(range(1, 17)) AS t(i)) AS DOUBLE)
             |    / (sqrt(CAST(q.qn16 AS DOUBLE))*sqrt(CAST(m.n16 AS DOUBLE))) AS cos16
             |  FROM q JOIN m ON m.vec_id <> q.q_id),
             |shortlist AS (SELECT q_id, vec_id FROM
             |   (SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id ORDER BY cos16 DESC, vec_id) AS rn FROM s1)
             |   WHERE rn <= 25),
             |qs AS (SELECT vec_id AS q_id, qv AS qe, nsq AS qn FROM m WHERE vec_id < 10),
             |scored AS (SELECT sl.q_id, sl.vec_id,
             |  CAST((SELECT SUM(q.qe[i]*v.qv[i]) FROM UNNEST(range(1, len(q.qe)+1)) AS t(i)) AS DOUBLE)
             |    / (sqrt(CAST(q.qn AS DOUBLE))*sqrt(CAST(v.nsq AS DOUBLE))) AS cosine
             |  FROM shortlist sl JOIN m v ON v.vec_id = sl.vec_id JOIN qs q ON q.q_id = sl.q_id),
             |ranked AS (SELECT q_id, vec_id, cosine,
             |        row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank FROM scored)
             |SELECT q_id, rank, vec_id, cosine FROM ranked WHERE rank <= $K ORDER BY q_id, rank""".stripMargin)
    ),
    Q(
      "ann_hnsw",
      // GRAPH-based ANN — the NSW navigable-small-world family
      // (Malkov & Yashunin 2018's base layer), the index shape the
      // production vector stores (HNSW/DiskANN) actually serve,
      // re-expressed in Spark's execution model: an ITERATIVE
      // insertion build is replaced by an exact M=8 kNN graph over the
      // sample-bounded corpus (symmetrized — NSW's undirected links),
      // and the greedy search by a DETERMINISTIC fixed-round beam
      // search: start at a fixed entry vertex, T=3 rounds of
      // expand-neighbors → rescore → keep the W=8 best (ties on
      // vec_id), then top-K of the final beam. Fixed T/W instead of a
      // visited-set best-first makes the search a pure 3-unrolled
      // dataflow — reproducible relationally, so unlike most HNSW
      // implementations this one is ORACLE-CHECKED, not recall-only.
      //
      // Scale posture: the graph layer is built over a bounded sample
      // (the whole corpus here; ≤100k vectors at 100 TB — the same
      // cap as the IVF training sample) and BROADCAST (n·M edge
      // pairs); the all-pairs build cost is sample², never corpus².
      // Per round the candidate set is queries × W × M — broadcast
      // against the key-partitioned corpus vectors for rescoring; the
      // corpus is never scanned. AnnSpec pins recall vs brute force.
      (s, dir) => {
        val M = 8; val W = 8; val T = 3
        // STRUCTURAL sample cap on the quadratic build stage: the kNN
        // graph covers at most GraphSampleCap vectors (vec_id-
        // deterministic, mirrored in the oracle; inert at test scales)
        // — DocStress measures the build at 10x input as ~100x pairs /
        // ~10x wall, the regime this cap bounds at 100 TB. Production
        // graph ANN over the FULL corpus means incremental insertion
        // builds (inherently sequential — un-Spark-like); the IVF
        // family is this engine's full-corpus serving path, and the
        // graph tier serves the sampled stratum.
        val c = graft.GraftCache.register(
          corpus(s, dir).filter(col("vec_id") < GraphSampleCap).persist())
        // graph BUILD distances use the first 16 of 64 dims (the
        // matryoshka truncation lever — 4× less compute on the
        // quadratic stage); the beam SEARCH rescores exact full-dim,
        // so only link selection is approximate — exactly the trade
        // real HNSW builds make with NN-descent approximate graphs
        val c16 = c.withColumn("v16", slice(col("qv"), 1, 16))
          .withColumn("n16", dotQ(col("v16"), col("v16")))
        val rhs = c16.select(col("vec_id").as("dst"), col("v16").as("dv"), col("n16").as("dn"))
        val pairs = c16
          .join(broadcast(rhs), col("vec_id") =!= col("dst"))
          .withColumn("c", cosineFrom(dotQ(col("v16"), col("dv")), col("n16"), col("dn")))
          .select(col("vec_id").as("src"), col("dst"), col("c"))
        val knn = graft.plans.GraftOps
          .topKPerGroup(pairs, Seq(col("src")), M, col("c").desc, col("dst"))
          .select("src", "dst")
        // lineage-truncate the iterative state (graph + per-round
        // beam): both frames are tiny (n·M edges, queries×W beam rows)
        // and sit on cached/unrolled state — see GraftCache.truncate.
        def trunc(df: DataFrame): DataFrame = graft.GraftCache.truncate(df)
        val edges = trunc(
          knn.union(knn.select(col("dst").as("src"), col("src").as("dst"))).distinct())
        val qDf = queriesDf(c)
        def score(cand: DataFrame): DataFrame =
          broadcast(cand)
            .join(c.select(col("vec_id"), col("qv"), col("nsq")), "vec_id")
            .join(broadcast(qDf), "q_id")
            .withColumn("cosine", cosineFrom(dotQ(col("qe"), col("qv")), col("qn"), col("nsq")))
            .select("q_id", "vec_id", "cosine")
        var beam = score(qDf.select("q_id").withColumn("vec_id", lit(0L)))
        for (_ <- 1 to T) {
          val cand = beam
            .select("q_id", "vec_id")
            .join(broadcast(edges), col("vec_id") === col("src"))
            .select(col("q_id"), col("dst").as("vec_id"))
            .union(beam.select("q_id", "vec_id"))
            .distinct()
          beam = trunc(graft.plans.GraftOps
            .topKPerGroup(score(cand), Seq(col("q_id")), W, col("cosine").desc, col("vec_id")))
        }
        val top = graft.plans.GraftOps.topKPerGroup(
          beam.filter(col("vec_id") =!= col("q_id")),
          Seq(col("q_id")), K, col("cosine").desc, col("vec_id"))
        val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
        top
          .withColumn("rank", row_number().over(w))
          .select("q_id", "rank", "vec_id", "cosine")
          .orderBy("q_id", "rank")
      },
      Some {
        val round = (t: Int) =>
          s"""c$t AS (SELECT DISTINCT q_id, vec_id FROM (
             |  SELECT b${t - 1}.q_id, ed.dst AS vec_id FROM b${t - 1} JOIN ed ON b${t - 1}.vec_id = ed.src
             |  UNION ALL SELECT q_id, vec_id FROM b${t - 1})),
             |s$t AS (SELECT c$t.q_id, c$t.vec_id,
             |  CAST((SELECT SUM(q.qe[i]*m.qv[i]) FROM UNNEST(range(1, len(q.qe)+1)) AS t(i)) AS DOUBLE)
             |    / (sqrt(CAST(q.qn AS DOUBLE))*sqrt(CAST(m.nsq AS DOUBLE))) AS cosine
             |  FROM c$t JOIN m ON m.vec_id = c$t.vec_id JOIN q ON q.q_id = c$t.q_id),
             |b$t AS (SELECT q_id, vec_id, cosine FROM (SELECT q_id, vec_id, cosine,
             |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn FROM s$t)
             |  WHERE rn <= 8)""".stripMargin
        s"""WITH n AS (SELECT vec_id,
           |      [CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT) for x in embedding] AS qv FROM embeddings),
           |m AS (SELECT vec_id, qv,
           |      (SELECT SUM(qv[i]*qv[i]) FROM UNNEST(range(1, len(qv)+1)) AS t(i)) AS nsq FROM n),
           |q AS (SELECT vec_id AS q_id, qv AS qe, nsq AS qn FROM m WHERE vec_id < 10),
           |m16 AS (SELECT vec_id, qv[1:16] AS v16,
           |  (SELECT SUM(qv[i]*qv[i]) FROM UNNEST(range(1, 17)) AS t(i)) AS n16
           |  FROM m WHERE vec_id < 50000),
           |ap AS (SELECT a.vec_id AS src, b.vec_id AS dst,
           |  CAST((SELECT SUM(a.v16[i]*b.v16[i]) FROM UNNEST(range(1, 17)) AS t(i)) AS DOUBLE)
           |    / (sqrt(CAST(a.n16 AS DOUBLE))*sqrt(CAST(b.n16 AS DOUBLE))) AS c
           |  FROM m16 a JOIN m16 b ON a.vec_id <> b.vec_id),
           |kn AS (SELECT src, dst FROM (SELECT src, dst,
           |  row_number() OVER (PARTITION BY src ORDER BY c DESC, dst) AS rn FROM ap) WHERE rn <= 8),
           |ed AS (SELECT src, dst FROM kn UNION SELECT dst AS src, src AS dst FROM kn),
           |b0 AS (SELECT q.q_id, 0::BIGINT AS vec_id,
           |  CAST((SELECT SUM(q.qe[i]*m.qv[i]) FROM UNNEST(range(1, len(q.qe)+1)) AS t(i)) AS DOUBLE)
           |    / (sqrt(CAST(q.qn AS DOUBLE))*sqrt(CAST(m.nsq AS DOUBLE))) AS cosine
           |  FROM q JOIN m ON m.vec_id = 0),
           |${round(1)},
           |${round(2)},
           |${round(3)},
           |ranked AS (SELECT q_id, vec_id, cosine,
           |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
           |  FROM b3 WHERE vec_id <> q_id)
           |SELECT q_id, rank, vec_id, cosine FROM ranked WHERE rank <= $K ORDER BY q_id, rank""".stripMargin
      }
    )
  )
}
