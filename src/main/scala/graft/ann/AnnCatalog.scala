package graft.ann

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

  private def corpus(s: SparkSession, dir: String): DataFrame =
    Fan
      .out(Tables(s, dir).embeddings)
      .withColumn("qv", quantize(col("embedding")))
      .withColumn("nsq", normSqQ(col("qv")))

  private def queriesDf(c: DataFrame): DataFrame =
    c.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("qv").as("qe"), col("nsq").as("qn"))

  def queries: Seq[Q] = Seq(
    Q(
      "ann_bruteforce",
      (s, dir) => {
        val c = corpus(s, dir)
        val q = queriesDf(c)
        // top-k per query via the custom bounded-heap operator (no
        // per-group sort); rank derived afterwards over the k-bounded
        // result — the scalable decomposition of "ranked top-k".
        val scored = c
          .join(broadcast(q), col("vec_id") =!= col("q_id"))
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
      Some(s"""WITH n AS (SELECT vec_id,
             |      [CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT) for x in embedding] AS qv FROM embeddings),
             |m AS (SELECT vec_id, qv,
             |      (SELECT SUM(qv[i]*qv[i]) FROM UNNEST(range(1, len(qv)+1)) AS t(i)) AS nsq FROM n),
             |q AS (SELECT vec_id AS q_id, qv AS qe, nsq AS qn FROM m WHERE vec_id < 10),
             |scored AS (SELECT q.q_id, m.vec_id,
             |  CAST((SELECT SUM(q.qe[i]*m.qv[i]) FROM UNNEST(range(1, len(q.qe)+1)) AS t(i)) AS DOUBLE)
             |    / (sqrt(CAST(q.qn AS DOUBLE))*sqrt(CAST(m.nsq AS DOUBLE))) AS cosine
             |  FROM m CROSS JOIN q WHERE m.vec_id <> q.q_id),
             |ranked AS (SELECT q_id, vec_id, cosine,
             |  row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank FROM scored)
             |SELECT q_id, rank, vec_id, cosine FROM ranked WHERE rank <= $K ORDER BY q_id, rank""".stripMargin)
    ),
    Q(
      "ann_lsh",
      (s, dir) => {
        // 8-bit signature: bit j = sign(v . h_j), h_j[i] = +-1 derived
        // from xxhash64(j*64+i) — deterministic pseudo-random planes.
        val c = corpus(s, dir)
        def bucket(v: org.apache.spark.sql.Column) =
          aggregate(
            transform(
              sequence(lit(0), lit(7)),
              j =>
                when(
                  aggregate(
                    sequence(lit(0), lit(63)),
                    lit(0.0),
                    (acc, i) =>
                      acc + element_at(v, i + 1).cast("double") *
                        when(pmod(xxhash64(j * 64 + i), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))) >= 0,
                  lit(1L)).otherwise(lit(0L))),
            lit(0L),
            (acc, b) => acc * 2 + b)
        val sig = c.withColumn("bucket", bucket(col("embedding")))
        // multiprobe: the query's own bucket plus all hamming-1 neighbors
        // (flip each of the 8 signature bits) — 9 probes per query
        val q = sig
          .filter(col("vec_id") < 10)
          .select(
            col("vec_id").as("q_id"),
            col("qv").as("qe"),
            col("nsq").as("qn"),
            explode(
              transform(
                sequence(lit(-1), lit(7)),
                j =>
                  when(j < 0, col("bucket"))
                    .otherwise(col("bucket").bitwiseXOR(call_function("shiftleft", lit(1L), j)))))
              .as("bucket"))
        val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
        sig
          .join(broadcast(q), Seq("bucket"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cosine", cosineFrom(dotQ(col("qe"), col("qv")), col("qn"), col("nsq")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= K)
          .select("q_id", "rank", "vec_id", "cosine")
          .orderBy("q_id", "rank")
      },
      None // rows-only: approximate candidate set; recall measured in AnnSpec
    ),
    Q(
      "ann_ivf",
      (s, dir) => {
        val c = corpus(s, dir)
        // k-means-lite centroids: one-pass per-label dimension means.
        val cents = c
          .select(col("label"), posexplode(col("embedding")))
          .groupBy("label", "pos")
          .agg(avg(col("col").cast("double")).as("m"))
          .groupBy("label")
          .agg(
            transform(array_sort(collect_list(struct(col("pos"), col("m")))), x => x.getField("m"))
              .as("centroid"))
          .select(col("label").as("cell"), col("centroid"))
        // assign every vector to its nearest centroid (cosine-equivalent
        // for unit vectors: max dot)
        val wAssign = Window.partitionBy("vec_id").orderBy(col("score").desc, col("cell"))
        val assigned = c
          .join(broadcast(cents))
          .withColumn("score", dot(col("embedding"), col("centroid")))
          .withColumn("rn", row_number().over(wAssign))
          .filter(col("rn") === 1)
          .select("vec_id", "embedding", "qv", "nsq", "cell")
        val q = assigned.filter(col("vec_id") < 10)
        // probe the 2 nearest cells per query
        val wProbe = Window.partitionBy("q_id").orderBy(col("score").desc, col("cell"))
        val probes = q
          .select(
            col("vec_id").as("q_id"),
            col("embedding").as("pe"),
            col("qv").as("qe"),
            col("nsq").as("qn"))
          .join(broadcast(cents))
          .withColumn("score", dot(col("pe"), col("centroid")))
          .withColumn("rn", row_number().over(wProbe))
          .filter(col("rn") <= 2)
          .select("q_id", "qe", "qn", "cell")
        val wRank = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
        assigned
          .join(broadcast(probes), Seq("cell"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cosine", cosineFrom(dotQ(col("qe"), col("qv")), col("qn"), col("nsq")))
          .withColumn("rank", row_number().over(wRank))
          .filter(col("rank") <= K)
          .select("q_id", "rank", "vec_id", "cosine")
          .orderBy("q_id", "rank")
      },
      None // rows-only: approximate; recall measured in AnnSpec
    )
  )
}
