package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives as pure Column expressions (codegen-inlined; no UDFs
  * in the hot path). Every helper has an exact DuckDB mirror used by the
  * oracle SQL in the catalogs — keep both in sync:
  *   ws        <-> string_split(text, ' ')
  *   shingles  <-> [array_to_string(ws[i:i+k-1],' ') for i in range(1, len(ws)-k+2)]
  *   stopHits  <-> len([w for w in ws if w IN (...)])
  *   normText  <-> trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
  */
object TextFunctions {

  /** Tiny fixed stopword profile (enough for ratio features over the
    * synthetic corpus; a real deployment would broadcast a per-language
    * list). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")

  val StopwordsSql: String = Stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  def ws(text: Column): Column = split(text, " ")

  /** Word k-grams, positional (duplicates kept). Empty for docs shorter
    * than k words. Native single-pass expression — see
    * graft.expressions.ShingleK. */
  def shingles(words: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.ShingleK(
        org.apache.spark.sql.graftbridge.Bridge.expression(words),
        k,
        distinct = false))

  /** Interpreted reference formulation — kept as ShingleK's spec mirror.
    * Note Spark's sequence(1, n) is DESCENDING for n<1, hence the
    * guard. */
  def shinglesInterpreted(words: Column, k: Int): Column =
    when(
      size(words) >= k,
      transform(
        sequence(lit(1), size(words) - (k - 1)),
        i => concat_ws(" ", slice(words, i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct shingle set — the MinHash/Jaccard input (first-occurrence
    * order, like DuckDB list_distinct). */
  def shingleSet(text: Column, k: Int = 3): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.ShingleK(
        org.apache.spark.sql.graftbridge.Bridge.expression(ws(text)),
        k,
        distinct = true))

  /** Content-defined-chunking boundary positions (native codegen — see
    * graft.expressions.CdcBoundaries). Oracle mirror:
    *   [i for i in range(2, greatest(len(text)-window+1,1)+1)
    *      if ('0x'||substr(md5(text[i:i+window-1]),1,8))::BIGINT % mod = 0] */
  def cdcBoundaries(text: Column, window: Int = 8, mod: Int = 64): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.CdcBoundaries(
        org.apache.spark.sql.graftbridge.Bridge.expression(text),
        window,
        mod))

  /** Keyword relevance scoring over the inverted-index shape, shared by
    * text_keyword_search and ann_hybrid_rrf's keyword branch (one
    * definition, so the two "same keyword ranking" claims cannot
    * silently diverge): postings restricted to the query terms INSIDE
    * the narrow explode stage, per-doc (distinct terms, total tf)
    * integer scoring. Callers order by [[keywordOrder]] and cut their
    * own top-k (TakeOrdered, never a global sort). */
  def keywordScores(docs: org.apache.spark.sql.DataFrame, terms: Seq[String]): org.apache.spark.sql.DataFrame =
    graft.Fan
      .out(docs.select("doc_id", "text"))
      .select(col("doc_id"), explode(ws(col("text"))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id")
      .agg(countDistinct(col("term")).as("n_terms"), count(lit(1)).as("tf"))

  /** The relevance order both consumers share: distinct terms matched,
    * then total term frequency, then doc_id as the total tiebreak. */
  def keywordOrder: Seq[Column] = Seq(col("n_terms").desc, col("tf").desc, col("doc_id").asc)

  /** Oracle mirror of [[keywordScores]]: CTE fragment (no WITH prefix)
    * ending in `kagg(doc_id, n_terms, tf)`. */
  def keywordScoresSql(src: String, terms: Seq[String]): String =
    s"""ktok AS (SELECT doc_id, g AS term
       |  FROM $src, UNNEST(string_split(text, ' ')) AS t(g)
       |  WHERE g IN (${terms.map(t => s"'$t'").mkString(", ")})),
       |kagg AS (SELECT doc_id, COUNT(DISTINCT term)::BIGINT AS n_terms, COUNT(*)::BIGINT AS tf
       |         FROM ktok GROUP BY doc_id)""".stripMargin

  def stopHits(words: Column): Column =
    size(filter(words, w => w.isin(Stopwords: _*)))

  def normText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Native winnowing fingerprint over collect_list'd (pos, hash)
    * structs — see graft.expressions.WinnowFingerprint. */
  def winnowFp(structs: Column, w: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.WinnowFingerprint(
        org.apache.spark.sql.graftbridge.Bridge.expression(structs),
        w))
}
