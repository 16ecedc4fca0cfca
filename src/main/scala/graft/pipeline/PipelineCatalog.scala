package graft.pipeline

import graft.{Fan, Q, QueryModule, Tables}
import graft.dedup.DedupCatalog
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** The whole curation pipeline as ONE declarative plan — what a
  * training-data team actually ships:
  *
  *   quality filter -> EXACT dedup (digest keep-list) -> near-dup
  *   cluster removal (keep the canonical representative) ->
  *   deterministic split assignment -> per-split per-language report.
  *
  * Every stage reuses the production operators (quality formula, exact
  * digest dedup, the MinHash+LSH cluster assignment, the md5-bucket
  * split) and the whole chain stays inside Catalyst: the optimizer sees
  * one DAG — quality filtering prunes before the dedup joins, the
  * anti-join against non-canonical duplicates is a broadcastable id
  * list, and nothing leaves the cluster.
  *
  * Exact dedup is NOT redundant with the near-dup stage: the LSH bucket
  * cap (DedupCatalog.MaxBucketWidth) intentionally drops degenerate
  * buckets, so a flood of >cap IDENTICAL documents produces no near-dup
  * pairs at all — only the digest stage catches it. The query proves
  * this by injecting a 60-copy clique of one document (doc_ids
  * 400000..400059): wider than the cap in every band, so it must
  * survive LSH and die at the digest stage, in both engines.
  */
object PipelineCatalog extends QueryModule {

  /** quality >= 0.8 as an EXACT integer inequality. quality is
    *   min(nw,100)/200 + 0.3*alpha/len + 0.2*(nw-stop)/nw
    * — a sum of small-integer ratios. Multiplying through by the positive
    * common denominator 200*len*nw gives
    *   min(nw,100)*len*nw + 60*alpha*nw + 40*(nw-stop)*len >= 160*len*nw
    * which both engines evaluate in exact BIGINT arithmetic: no float
    * boundary can flip a document between engines (round-1 driver hash
    * fail was exactly such a boundary).
    */
  private val qualityGateSql =
    "LEAST(nw,100)*len*nw + 60*alpha*nw + 40*(nw-stop)*len >= 160*len*nw"

  def queries: Seq[Q] = Seq(
    Q(
      "pipe_end_to_end",
      (s, dir) => {
        val docs = Tables(s, dir).documents.select("doc_id", "lang", "text")
        // 60 identical copies of doc 7 — a boilerplate flood wider than
        // the LSH bucket cap, so the near-dup stage (by design) proposes
        // no pairs for it; the exact stage must drop all 60.
        val clique = docs
          .filter(col("doc_id") === 7)
          .crossJoin(s.range(60).select((col("id") + 400000L).as("copy_id")))
          .select(col("copy_id").as("doc_id"), col("lang"), col("text"))
        val aug = Fan.out(docs.unionByName(clique))
        Pipeline
          .curate(aug)
          .groupBy("split", "lang")
          .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("n_tokens"))
          .orderBy("split", "lang")
      },
      Some("WITH aug AS (SELECT doc_id, lang, text FROM documents\n" +
        "     UNION ALL SELECT 400000+i, lang, text FROM documents, UNNEST(range(60)) AS t(i) WHERE doc_id=7),\n" +
        DedupCatalog.minhashPairsCtesFrom("aug") + DedupCatalog.clusterAssignSqlTail +
        s""",
           |neardrop AS (SELECT x AS doc_id FROM r2 WHERE rep_id <> x),
           |exdrop AS (SELECT doc_id FROM
           |           (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM aug)
           |           WHERE doc_id <> keep_id),
           |dupdrop AS (SELECT doc_id FROM exdrop UNION SELECT doc_id FROM neardrop),
           |qm AS (SELECT doc_id, lang,
           |       len(string_split(text,' '))::BIGINT AS nw,
           |       length(text)::BIGINT AS len,
           |       (length(text)-length(regexp_replace(text,'[a-z]','','g')))::BIGINT AS alpha,
           |       len([w for w in string_split(text,' ') if w IN $StopwordsSql])::BIGINT AS stop
           |       FROM aug),
           |kept AS (SELECT doc_id, lang, nw FROM qm
           |         WHERE $qualityGateSql
           |           AND doc_id NOT IN (SELECT doc_id FROM dupdrop)),
           |assigned AS (SELECT lang, nw,
           |  CASE WHEN ('0x'||substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 80 THEN 'train'
           |       WHEN ('0x'||substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90 THEN 'val'
           |       ELSE 'test' END AS split
           |  FROM kept)
           |SELECT split, lang, COUNT(*) AS n_docs, SUM(nw)::BIGINT AS n_tokens
           |FROM assigned GROUP BY split, lang ORDER BY split, lang""".stripMargin)
    )
  )
}
