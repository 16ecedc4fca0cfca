package graft.pipeline

import graft.{Fan, Q, QueryModule, Tables}
import graft.dedup.DedupCatalog
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** The whole curation pipeline as ONE declarative plan — what a
  * training-data team actually ships:
  *
  *   quality filter -> near-dup cluster removal (keep the canonical
  *   representative) -> deterministic split assignment -> per-split
  *   per-language report.
  *
  * Every stage reuses the production operators (quality formula, the
  * MinHash+LSH cluster assignment, the md5-bucket split) and the whole
  * chain stays inside Catalyst: the optimizer sees one DAG — quality
  * filtering prunes before the dedup joins, the anti-join against
  * non-canonical duplicates is a broadcastable id list, and nothing
  * leaves the cluster.
  */
object PipelineCatalog extends QueryModule {

  private val qualitySql =
    """least(CAST(1.0 AS DOUBLE), len(string_split(text,' '))::DOUBLE/100.0)*0.5
      |  + ((length(text)-length(regexp_replace(text,'[a-z]','','g')))::DOUBLE/length(text))*0.3
      |  + (1.0 - len([w for w in string_split(text,' ') if w IN (('the'), ('a'), ('of'), ('and'), ('is'), ('to'), ('in'))])::DOUBLE/len(string_split(text,' ')))*0.2""".stripMargin

  def queries: Seq[Q] = Seq(
    Q(
      "pipe_end_to_end",
      (s, dir) => {
        val d = Fan.out(Tables(s, dir).documents)
        val quality = d
          .withColumn("nw", size(ws(col("text"))))
          .withColumn(
            "quality",
            least(lit(1.0), col("nw").cast("double") / 100.0) * 0.5 +
              ((length(col("text")) - length(regexp_replace(col("text"), "[a-z]", "")))
                .cast("double") / length(col("text"))) * 0.3 +
              (lit(1.0) - stopHits(ws(col("text"))).cast("double") / size(ws(col("text")))) * 0.2)
          .filter(col("quality") >= 0.8)
        // drop non-canonical members of near-dup clusters
        val dupDrop = DedupCatalog
          .clusterAssign(s, dir)
          .filter(col("rep_id") =!= col("doc_id"))
          .select("doc_id")
        val kept = quality.join(broadcast(dupDrop), Seq("doc_id"), "left_anti")
        kept
          .withColumn(
            "split",
            when(
              pmod(conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
                .cast("long"), lit(100L)) < 80, "train")
              .when(
                pmod(conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
                  .cast("long"), lit(100L)) < 90, "val")
              .otherwise("test"))
          .groupBy("split", "lang")
          .agg(count(lit(1)).as("n_docs"), sum(col("nw").cast("long")).as("n_tokens"))
          .orderBy("split", "lang")
      },
      Some(DedupCatalog.minhashPairsSql + DedupCatalog.clusterAssignSqlTail +
        s""",
           |dupdrop AS (SELECT x AS doc_id FROM r2 WHERE rep_id <> x),
           |kept AS (SELECT doc_id, lang, len(string_split(text,' ')) AS nw FROM documents
           |         WHERE ($qualitySql) >= 0.8
           |           AND doc_id NOT IN (SELECT doc_id FROM dupdrop)),
           |assigned AS (SELECT lang, nw,
           |  CASE WHEN ('0x'||substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 80 THEN 'train'
           |       WHEN ('0x'||substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90 THEN 'val'
           |       ELSE 'test' END AS split
           |  FROM kept)
           |SELECT split, lang, COUNT(*) AS n_docs, SUM(nw) AS n_tokens
           |FROM assigned GROUP BY split, lang ORDER BY split, lang""".stripMargin)
    )
  )
}
