package graft.text

import graft.{Fan, GraftCache, Q, QueryModule, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 text analysis — language-ID heuristic, quality
  * scoring, token counting, winnowing fingerprints. All per-document
  * Column-expression plans: narrow (embarrassingly parallel, no
  * shuffle), so they scale linearly with input splits.
  */
object TextCatalog extends QueryModule {

  /** The Gopher rule columns over a (doc_id, text) frame — ONE
    * definition of the rule set, shared by text_gopher_rules (the
    * per-document report) and pipe_rule_ablation (the per-rule tuning
    * table), so the ablation can never drift from the rules it
    * ablates. Pure narrow per-row work. */
  private[graft] def gopherRuleFrame(d: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    d.withColumn("wc", size(ws(col("text"))).cast("long"))
      .withColumn("alpha_chars", length(regexp_replace(col("text"), "[^a-z]", "")).cast("long"))
      .withColumn("mean_wlen", col("alpha_chars").cast("double") / col("wc"))
      .withColumn("n_stop", stopHits(ws(col("text"))).cast("long"))
      .withColumn("rule_wc", col("wc") >= 30 && col("wc") <= 100000)
      .withColumn("rule_wlen", col("mean_wlen") >= 3.0 && col("mean_wlen") <= 10.0)
      .withColumn("rule_alpha", col("alpha_chars").cast("double") / length(col("text")) > 0.6)
      .withColumn("rule_stop", col("n_stop") >= 2)

  /** Oracle mirror of [[gopherRuleFrame]] over the documents table,
    * CTE chain ending in r (no WITH prefix). */
  private[graft] val gopherRulesSql: String =
    s"""t AS (SELECT doc_id, text,
       |  len(string_split(text,' '))::BIGINT AS wc,
       |  length(regexp_replace(text,'[^a-z]','','g'))::BIGINT AS alpha_chars,
       |  len([w for w in string_split(text,' ') if w IN $StopwordsSql])::BIGINT AS n_stop
       |  FROM documents),
       |r AS (SELECT doc_id, wc,
       |  alpha_chars::DOUBLE / wc AS mean_wlen,
       |  (wc >= 30 AND wc <= 100000) AS rule_wc,
       |  (alpha_chars::DOUBLE / wc >= 3.0 AND alpha_chars::DOUBLE / wc <= 10.0) AS rule_wlen,
       |  (alpha_chars::DOUBLE / length(text) > 0.6) AS rule_alpha,
       |  (n_stop >= 2) AS rule_stop
       |  FROM t)""".stripMargin

  /** BPE training state (see text_bpe_train): from a documents
    * relation, the word-frequency dictionary in double-spaced char
    * form, and `rounds` iterations of (1-row merge frame, post-merge
    * dictionary frame) — every frame persisted and GraftCache-
    * registered. Shared by text_bpe_train (emits the merge table) and
    * text_bpe_apply (applies a slice-trained table to the corpus). */
  private[graft] def bpeTrain(
      docs: org.apache.spark.sql.DataFrame,
      rounds: Int): (Seq[org.apache.spark.sql.DataFrame], Seq[org.apache.spark.sql.DataFrame]) = {
    val words = docs
      .select(explode(ws(lower(col("text")))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w")
      .agg(count(lit(1)).as("cnt"))
    var w = GraftCache.register(
      words
        .select(
          concat(lit(" "), array_join(split(col("w"), ""), "  "), lit(" ")).as("s"),
          col("cnt"))
        .persist())
    // each round's argmax and dictionary are lineage-TRUNCATED, not
    // persisted: they stack on the previous round's cached frame, and
    // `rounds` nested cache levels reprint their initial plans per
    // action under AQE (GraftCache.truncate — the wd_modularity
    // pathology at maximum depth here). Both frames are tiny (1 row /
    // dictionary-sized).
    val frames = (1 to rounds).map { _ =>
      val m = GraftCache.truncate(
        w.select(explode(shingles(split(trim(col("s")), "  "), 2)).as("pair"), col("cnt"))
          .groupBy("pair")
          .agg(sum(col("cnt")).as("freq"))
          .orderBy(col("freq").desc, col("pair"))
          .limit(1))
      w = GraftCache.truncate(
        w.crossJoin(broadcast(m))
          .select(bpeApplyCol(col("s"), col("pair")).as("s"), col("cnt")))
      (m, w)
    }
    (frames.map(_._1), frames.map(_._2))
  }

  /** One BPE merge application on the double-spaced form: pattern
    * ' A  B ' → ' AB ' via plain replace() (L2R non-overlap — the
    * contract Spark and DuckDB share; see text_bpe_train). */
  private def bpeApplyCol(
      s: org.apache.spark.sql.Column,
      pair: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    call_function(
      "replace",
      s,
      concat(lit(" "), call_function("replace", pair, lit(" "), lit("  ")), lit(" ")),
      concat(lit(" "), call_function("replace", pair, lit(" "), lit("")), lit(" ")))

  /** Oracle CTE chain for BPE training: words (with `pred` restricting
    * the training slice) → w0 → tk/pc/m/w/nt per round. Ends after
    * nt$rounds; consumers append their own SELECT. */
  private def bpeCtes(pred: String, rounds: Int): String = {
    val rs = (1 to rounds).map { r =>
      val p = r - 1
      s"""tk$r AS (SELECT string_split(trim(s, ' '), '  ') AS t, cnt FROM w$p),
         |pc$r AS (SELECT g AS pair, SUM(cnt)::BIGINT AS freq FROM
         |         (SELECT [array_to_string(t[i:i+1],' ') for i in range(1, len(t))] AS bs, cnt
         |          FROM tk$r WHERE len(t) >= 2), UNNEST(bs) AS u(g) GROUP BY 1),
         |m$r AS (SELECT pair, freq FROM pc$r ORDER BY freq DESC, pair LIMIT 1),
         |w$r AS (SELECT replace(s, ' '||replace(pair,' ','  ')||' ', ' '||replace(pair,' ','')||' ') AS s, cnt
         |        FROM w$p, m$r),
         |nt$r AS (SELECT SUM(len(string_split(trim(s,' '),'  ')) * cnt)::BIGINT AS n_tokens FROM w$r)""".stripMargin
    }
    s"""words AS (SELECT w, COUNT(*)::BIGINT AS cnt FROM
       |  (SELECT doc_id, unnest(string_split(lower(text),' ')) AS w FROM documents)
       |  WHERE $pred AND regexp_matches(w, '^[a-z]+$$') GROUP BY w),
       |w0 AS (SELECT ' '||array_to_string(string_split(w,''),'  ')||' ' AS s, cnt FROM words),
       |${rs.mkString(",\n")}""".stripMargin
  }

  def queries: Seq[Q] = Seq(
    Q(
      "text_decontaminate",
      // Benchmark decontamination: flag training documents sharing any
      // 8-gram with the eval set (doc_id < 5 stands in for a held-out
      // benchmark). Catches VERBATIM INCLUSION inside a larger document
      // — which exact dedup misses by construction — so the query
      // injects both cases: doc 500000 embeds eval doc 2's text between
      // unrelated words, doc 500001 is a verbatim copy of eval doc 3.
      //
      // Scale posture: eval benchmarks are tiny next to a training
      // corpus, so the distinct eval-8-gram set is BROADCAST and the
      // train side stays a narrow explode — the only shuffle is the
      // final per-doc count. 8-gram explode of the corpus is bounded by
      // ~word count per doc (distinct set, ShingleK codegen).
      (s, dir) => {
        val docs = Tables(s, dir).documents.select("doc_id", "lang", "text")
        val embedded = docs
          .filter(col("doc_id") === 2)
          .select(
            lit(500000L).as("doc_id"),
            col("lang"),
            concat(lit("alpha beta gamma delta "), col("text"), lit(" epsilon zeta")).as("text"))
        val copy = docs
          .filter(col("doc_id") === 3)
          .select(lit(500001L).as("doc_id"), col("lang"), col("text"))
        val aug = docs.unionByName(embedded).unionByName(copy)
        val evalGrams = aug
          .filter(col("doc_id") < 5)
          .select(explode(shingleSet(col("text"), 8)).as("g"))
          .distinct()
        Fan
          .out(aug.filter(col("doc_id") >= 5))
          .select(col("doc_id"), explode(shingleSet(col("text"), 8)).as("g"))
          .join(broadcast(evalGrams), "g")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_hits"))
          .orderBy("doc_id")
      },
      Some("""WITH aug AS (SELECT doc_id, lang, text FROM documents
             |  UNION ALL SELECT 500000, lang, 'alpha beta gamma delta ' || text || ' epsilon zeta'
             |            FROM documents WHERE doc_id = 2
             |  UNION ALL SELECT 500001, lang, text FROM documents WHERE doc_id = 3),
             |w AS (SELECT doc_id, string_split(text,' ') AS ws FROM aug),
             |g AS (SELECT doc_id,
             |      list_distinct([array_to_string(ws[i:i+7],' ') for i in range(1, len(ws)-6)]) AS s
             |      FROM w WHERE len(ws) >= 8),
             |ev AS (SELECT DISTINCT gg AS g FROM g, UNNEST(s) AS t(gg) WHERE doc_id < 5),
             |tr AS (SELECT doc_id, gg AS g FROM g, UNNEST(s) AS t(gg) WHERE doc_id >= 5)
             |SELECT tr.doc_id, COUNT(*) AS n_hits FROM tr JOIN ev USING (g)
             |GROUP BY tr.doc_id ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "text_quality",
      (s, dir) => {
        val d = Fan.out(Tables(s, dir).documents)
        d.select(col("doc_id"), col("lang"), col("text"))
          .withColumn("n_words", size(ws(col("text"))).cast("long"))
          .withColumn(
            "alpha_ratio",
            (length(col("text")) - length(regexp_replace(col("text"), "[a-z]", "")))
              .cast("double") / length(col("text")))
          .withColumn(
            "stop_ratio",
            stopHits(ws(col("text"))).cast("double") / size(ws(col("text"))))
          .withColumn(
            "avg_word_len",
            length(regexp_replace(col("text"), " ", "")).cast("double") / size(ws(col("text"))))
          .withColumn(
            "quality",
            least(lit(1.0), col("n_words").cast("double") / 100.0) * 0.5 +
              col("alpha_ratio") * 0.3 + (lit(1.0) - col("stop_ratio")) * 0.2)
          .select("doc_id", "lang", "n_words", "alpha_ratio", "stop_ratio", "avg_word_len", "quality")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, lang,
             |len(string_split(text,' '))::BIGINT AS n_words,
             |(length(text)-length(regexp_replace(text,'[a-z]','','g')))::DOUBLE/length(text) AS alpha_ratio,
             |len([w for w in string_split(text,' ') if w IN $StopwordsSql])::DOUBLE/len(string_split(text,' ')) AS stop_ratio,
             |length(replace(text,' ',''))::DOUBLE/len(string_split(text,' ')) AS avg_word_len,
             |least(CAST(1.0 AS DOUBLE), len(string_split(text,' '))::DOUBLE/100.0)*0.5
             |  + ((length(text)-length(regexp_replace(text,'[a-z]','','g')))::DOUBLE/length(text))*0.3
             |  + (1.0 - len([w for w in string_split(text,' ') if w IN $StopwordsSql])::DOUBLE/len(string_split(text,' ')))*0.2 AS quality
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "text_tokens",
      (s, dir) =>
        Fan
          .out(Tables(s, dir).documents)
          .select(
            col("doc_id"),
            size(ws(col("text"))).cast("long").as("ws_tokens"),
            regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long").as("re_tokens"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, len(string_split(text,' '))::BIGINT AS ws_tokens,
             |len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS re_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "text_langid",
      (s, dir) =>
        Fan
          .out(Tables(s, dir).documents)
          .withColumn(
            "en_score",
            stopHits(ws(col("text"))).cast("double") / size(ws(col("text"))))
          .select(
            col("doc_id"),
            col("en_score"),
            when(col("en_score") >= 0.06, "en").otherwise("und").as("pred_lang"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
             |len([w for w in string_split(text,' ') if w IN $StopwordsSql])::DOUBLE/len(string_split(text,' ')) AS en_score,
             |CASE WHEN len([w for w in string_split(text,' ') if w IN $StopwordsSql])::DOUBLE/len(string_split(text,' ')) >= 0.06
             |     THEN 'en' ELSE 'und' END AS pred_lang
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "text_chunk_sliding",
      // Sliding-window chunking WITH OVERLAP — the RAG/embedding
      // chunker (64-token windows, stride 48, so consecutive chunks
      // share 16 tokens of context): per document, chunk i covers
      // words [i·48, i·48+64), the last chunk keeps its tail
      // remainder, and every document emits at least one chunk. The
      // whole reshape is one narrow sequence-explode + slice per doc —
      // embarrassingly parallel, no shuffle before the presentation
      // sort; chunk identity (doc_id, chunk_id) is the key a vector
      // store indexes. Emits count + boundary words per chunk so the
      // oracle pins the window arithmetic, not just row counts.
      (s, dir) =>
        Fan
          .out(Tables(s, dir).documents)
          .select(col("doc_id"), ws(col("text")).as("w"))
          .withColumn("nw", size(col("w")))
          // n_chunks = 1 + ceil(max(0, nw-64)/48) = 1 + (max(0,nw-64)+47) div 48
          .withColumn("nc", expr("1 + (greatest(nw - 64, 0) + 47) div 48"))
          .select(
            col("doc_id"),
            col("w"),
            col("nw"),
            explode(expr("sequence(0, nc - 1)")).as("chunk_id"))
          .withColumn("cw", expr("slice(w, chunk_id*48 + 1, 64)"))
          .select(
            col("doc_id"),
            col("chunk_id").cast("long").as("chunk_id"),
            size(col("cw")).cast("long").as("n_tokens"),
            element_at(col("cw"), 1).as("first_word"),
            element_at(col("cw"), -1).as("last_word"))
          .orderBy("doc_id", "chunk_id"),
      Some("""WITH d AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
             |n AS (SELECT doc_id, w, len(w) AS nw,
             |      1 + (greatest(nw - 64, 0) + 47) // 48 AS nc FROM d),
             |c AS (SELECT doc_id, w, i AS chunk_id, w[i*48 + 1 : i*48 + 64] AS cw
             |      FROM n, UNNEST(range(nc)) AS t(i))
             |SELECT doc_id, chunk_id::BIGINT AS chunk_id, len(cw)::BIGINT AS n_tokens,
             |cw[1] AS first_word, cw[len(cw)] AS last_word
             |FROM c ORDER BY doc_id, chunk_id""".stripMargin)
    ),
    Q(
      "text_langid_eval",
      // Classifier EVALUATION as data — the confusion matrix every
      // deployed filter is judged by: the langid prediction crossed
      // with the corpus' labeled lang column, counts plus within-truth
      // shares in exact ppm (the per-class recall diagonal). The same
      // table drives threshold tuning (move 0.06, watch the off-
      // diagonal mass move) — model evaluation expressed as one
      // aggregation, no driver-side scoring loop.
      //
      // Scale posture: one narrow scoring pass + a (langs × 2)-sized
      // count aggregation and a same-key totals join — evaluation
      // costs one scan regardless of corpus size.
      (s, dir) => {
        val scored = Fan
          .out(Tables(s, dir).documents)
          .withColumn(
            "en_score",
            stopHits(ws(col("text"))).cast("double") / size(ws(col("text"))))
          .select(
            col("lang"),
            when(col("en_score") >= 0.06, "en").otherwise("und").as("pred_lang"))
        val cm = scored.groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
        cm.join(cm.groupBy("lang").agg(sum(col("n")).as("n_lang")), "lang")
          .selectExpr("lang", "pred_lang", "n", "n * 1000000 div n_lang AS row_ppm")
          .orderBy("lang", "pred_lang")
      },
      Some(s"""WITH p AS (SELECT lang,
             |  CASE WHEN len([w for w in string_split(text,' ') if w IN $StopwordsSql])::DOUBLE/len(string_split(text,' ')) >= 0.06
             |       THEN 'en' ELSE 'und' END AS pred_lang
             |  FROM documents),
             |cm AS (SELECT lang, pred_lang, COUNT(*)::BIGINT AS n FROM p GROUP BY 1, 2),
             |tot AS (SELECT lang, SUM(n)::BIGINT AS n_lang FROM cm GROUP BY 1)
             |SELECT cm.lang, pred_lang, n, (n * 1000000) // n_lang AS row_ppm
             |FROM cm JOIN tot ON cm.lang = tot.lang
             |ORDER BY cm.lang, pred_lang""".stripMargin)
    ),
    Q(
      "text_split_assign",
      // deterministic train/val/test assignment: md5-derived bucket of
      // the doc id — stable across runs, machines, and engines (the
      // pipeline property that makes splits reproducible and leak-free)
      (s, dir) =>
        Tables(s, dir).documents
          .withColumn(
            "bucket",
            pmod(conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
              .cast("long"), lit(100L)))
          .select(
            col("doc_id"),
            col("bucket"),
            when(col("bucket") < 80, "train")
              .when(col("bucket") < 90, "val")
              .otherwise("test")
              .as("split"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |('0x'||substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket,
             |CASE WHEN ('0x'||substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 80 THEN 'train'
             |     WHEN ('0x'||substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 90 THEN 'val'
             |     ELSE 'test' END AS split
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "text_sample_stratified",
      // per-language stratified sample (deterministic via the same
      // md5-bucket trick: keep ~20% of each language) — rows-only is
      // unnecessary since the bucket arithmetic is portable
      (s, dir) =>
        Tables(s, dir).documents
          .withColumn(
            "bucket",
            pmod(conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
              .cast("long"), lit(100L)))
          .filter(col("bucket") < 20)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_sampled"))
          .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS n_sampled FROM documents
             |WHERE ('0x'||substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 20
             |GROUP BY lang ORDER BY lang""".stripMargin)
    ),
    Q(
      "text_corpus_stats",
      // per-language corpus report: doc counts, token volume, length
      // distribution. The ratio columns (mean tokens, long-doc share)
      // are emitted in exact integer MICRO-units — (sum*1e6) div count —
      // so the cross-engine hash has no float representation at all
      // (round-1 hash fail was the raw double divisions here).
      (s, dir) =>
        Fan
          .out(Tables(s, dir).documents)
          .withColumn("nw", size(ws(col("text"))).cast("long"))
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("nw")).as("total_tokens"),
            min(col("nw")).as("min_tokens"),
            max(col("nw")).as("max_tokens"),
            sum(when(col("nw") >= 100, 1L).otherwise(0L)).as("n_long"))
          .select(
            col("lang"),
            col("n_docs"),
            col("total_tokens"),
            expr("(total_tokens * CAST(1000000 AS BIGINT)) div n_docs").as("avg_tokens_micro"),
            col("min_tokens"),
            col("max_tokens"),
            col("n_long"),
            expr("(n_long * CAST(1000000 AS BIGINT)) div n_docs").as("pct_long_micro"))
          .orderBy("lang"),
      Some("""WITH t AS (SELECT lang, len(string_split(text,' '))::BIGINT AS nw FROM documents),
             |g AS (SELECT lang, COUNT(*) AS n_docs, SUM(nw)::BIGINT AS total_tokens,
             |      MIN(nw) AS min_tokens, MAX(nw) AS max_tokens,
             |      SUM(CASE WHEN nw >= 100 THEN 1 ELSE 0 END)::BIGINT AS n_long
             |      FROM t GROUP BY lang)
             |SELECT lang, n_docs, total_tokens,
             |(total_tokens * 1000000) // n_docs AS avg_tokens_micro,
             |min_tokens, max_tokens, n_long,
             |(n_long * 1000000) // n_docs AS pct_long_micro
             |FROM g ORDER BY lang""".stripMargin)
    ),
    Q(
      "text_hapax",
      // Vocabulary-richness report per (lang, source) stratum — the
      // Zipf-tail diagnostics a corpus mixer reads before weighting:
      // type/token ratio (lexical diversity), hapax legomena share
      // (types seen once — the Good-Turing mass that predicts how much
      // vocabulary is still unseen; boilerplate-heavy or templated
      // sources have a collapsed hapax share), and dis legomena. All
      // ratios in exact integer ppm ((x*1e6) div y), so the report
      // hash-verifies with no float anywhere.
      //
      // Scale posture: tokenize → ONE token-keyed count (map-side
      // combined — the classic word-count shuffle), then ONE
      // stratum-keyed rollup over the type table (types-sized, far
      // smaller than the corpus). No windows, no driver state; at
      // 100 TB this is exactly the two-stage wordcount that Spark's
      // shuffle exists for.
      (s, dir) => {
        val f = Fan.out(Tables(s, dir).documents)
          .select(col("lang"), col("source"), explode(ws(col("text"))).as("tok"))
          .groupBy("lang", "source", "tok")
          .agg(count(lit(1)).as("c"))
        f.groupBy("lang", "source")
          .agg(
            sum("c").as("n_tokens"),
            count(lit(1)).as("n_types"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
            sum(when(col("c") === 2, 1L).otherwise(0L)).as("n_dis"))
          .select(
            col("lang"),
            col("source"),
            col("n_tokens"),
            col("n_types"),
            col("n_hapax"),
            col("n_dis"),
            expr("(n_hapax * CAST(1000000 AS BIGINT)) div n_types").as("hapax_ppm"),
            expr("(n_types * CAST(1000000 AS BIGINT)) div n_tokens").as("ttr_ppm"))
          .orderBy("lang", "source")
      },
      Some("""WITH t AS (SELECT lang, source, unnest(string_split(text, ' ')) AS tok
             |          FROM documents),
             |f AS (SELECT lang, source, tok, COUNT(*)::BIGINT AS c FROM t GROUP BY 1, 2, 3),
             |g AS (SELECT lang, source, SUM(c)::BIGINT AS n_tokens, COUNT(*)::BIGINT AS n_types,
             |      SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
             |      SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS n_dis
             |      FROM f GROUP BY 1, 2)
             |SELECT lang, source, n_tokens, n_types, n_hapax, n_dis,
             |(n_hapax * 1000000) // n_types AS hapax_ppm,
             |(n_types * 1000000) // n_tokens AS ttr_ppm
             |FROM g ORDER BY lang, source""".stripMargin)
    ),
    Q(
      "text_ngram_freq",
      // corpus statistics: global top-20 word bigrams — explode +
      // count-shuffle + deterministic top-k (count desc, bigram asc)
      (s, dir) =>
        Fan
          .out(Tables(s, dir).documents)
          .select(explode(shingles(ws(col("text")), 2)).as("bigram"))
          .groupBy("bigram")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram"))
          .limit(20),
      Some("""WITH w AS (SELECT string_split(text,' ') AS ws FROM documents),
             |sh AS (SELECT [array_to_string(ws[i:i+1],' ') for i in range(1, len(ws))] AS s
             |       FROM w WHERE len(ws) >= 2),
             |tok AS (SELECT g AS bigram FROM sh, UNNEST(s) AS t(g))
             |SELECT bigram, COUNT(*) AS n FROM tok GROUP BY bigram
             |ORDER BY n DESC, bigram LIMIT 20""".stripMargin)
    ),
    Q(
      "text_bpe_train",
      // BPE tokenizer TRAINING (Sennrich et al. 2016) — the merge-table
      // learner every LLM data pipeline runs before anything is token-
      // counted: start from characters, repeatedly merge the most
      // frequent adjacent token pair. 5 merge rounds unrolled into ONE
      // DAG; each round is one pair-count aggregation (explode bigrams
      // → map-side-combined count), a 1-row argmax (freq DESC, pair ASC
      // — deterministic ties), and a narrow per-word apply. The merge
      // applies via plain replace() on a DOUBLE-SPACED token form
      // (' a  b  c '): the pattern ' A  B ' consumes one space of each
      // neighboring gap, so all non-overlapping occurrences merge in a
      // single left-to-right pass and overlap chains ('aaa') merge
      // greedily L2R — exactly reference BPE batch-apply, and
      // Spark/DuckDB replace() share the non-overlapping L2R contract,
      // so the learned table is hash-identical cross-engine.
      //
      // Scale posture: training runs over the word-frequency DICTIONARY
      // (the textbook BPE state), not word instances — one count
      // shuffle up front collapses the corpus to (word, cnt) types and
      // every round's state is dictionary-sized, with pair counts
      // SUM(cnt)-weighted so the learned table is identical to
      // instance-level training. Each round's frame is persisted (the
      // unrolled lineage would otherwise replay round r-1 twice per
      // round — the wd_pagerank lesson); per round the wide work is ONE
      // pair-count shuffle over dictionary rows, the chosen pair rides
      // a 1-row broadcast. A production run raises rounds, not widths —
      // the per-round cost is flat in corpus size once the dictionary
      // is built.
      (s, dir) => {
        val (ms, wsF) = bpeTrain(Fan.out(Tables(s, dir).documents), 5)
        ms.zip(wsF).zipWithIndex
          .map { case ((m, w), i) =>
            m.crossJoin(
              w.select(sum(size(split(trim(col("s")), "  ")) * col("cnt")).as("n_tokens")))
              .select(lit((i + 1).toLong).as("round"), col("pair"), col("freq"), col("n_tokens"))
          }
          .reduce(_.unionByName(_))
          .orderBy("round")
      },
      Some {
        val out = (1 to 5)
          .map(r =>
            s"SELECT $r::BIGINT AS round, pair, freq, (SELECT n_tokens FROM nt$r) AS n_tokens FROM m$r")
          .mkString("\nUNION ALL\n")
        s"""WITH ${bpeCtes("TRUE", 5)}
           |$out
           |ORDER BY round""".stripMargin
      }
    ),
    Q(
      "text_bpe_apply",
      // The tokenizer's PRODUCTION split: merges are trained on a
      // curated reference SLICE (doc_id < 250 — the pool must never
      // shape its own tokenizer) and applied to the whole corpus,
      // including documents the trainer never saw — BPE's open-
      // vocabulary property means unseen words still tokenize (down to
      // characters at worst), which the spec asserts on the held-out
      // half. Application is the train-time merge chain replayed in
      // learned order: 5 one-row broadcast joins and 5 narrow
      // replace()s per word, then one doc-keyed rollup — per-doc BPE
      // token counts next to whitespace word counts, the number every
      // token-budgeted pipeline actually bills by.
      //
      // Scale posture: training cost is dictionary-sized (see
      // text_bpe_train); application is embarrassingly parallel per
      // word instance with the merge table riding 1-row broadcasts —
      // the 100 TB pool is touched once, in one narrow pass.
      (s, dir) => {
        val docs = Fan.out(Tables(s, dir).documents)
        val (ms, _) = bpeTrain(docs.filter(col("doc_id") < 250), 5)
        val docWords = docs
          .select(col("doc_id"), explode(ws(lower(col("text")))).as("w"))
          .filter(col("w").rlike("^[a-z]+$"))
          .select(
            col("doc_id"),
            concat(lit(" "), array_join(split(col("w"), ""), "  "), lit(" ")).as("s"))
        val applied = ms.zipWithIndex
          .foldLeft(docWords) { case (df, (m, i)) =>
            df.crossJoin(broadcast(m.select(col("pair").as(s"p${i + 1}"))))
              .withColumn("s", bpeApplyCol(col("s"), col(s"p${i + 1}")))
          }
        val agg = applied
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_words"),
            sum(size(split(trim(col("s")), "  "))).as("n_tokens_bpe"))
        docs
          .select("doc_id")
          .join(agg, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            coalesce(col("n_words"), lit(0L)).as("n_words"),
            coalesce(col("n_tokens_bpe"), lit(0L)).as("n_tokens_bpe"))
          .orderBy("doc_id")
      },
      Some {
        val nested = (1 to 5).foldLeft("s") { (acc, r) =>
          s"replace($acc, ' '||replace((SELECT pair FROM m$r),' ','  ')||' ', " +
            s"' '||replace((SELECT pair FROM m$r),' ','')||' ')"
        }
        s"""WITH ${bpeCtes("doc_id < 250", 5)},
           |dw AS (SELECT doc_id, w FROM
           |  (SELECT doc_id, unnest(string_split(lower(text),' ')) AS w FROM documents)
           |  WHERE regexp_matches(w, '^[a-z]+$$')),
           |ds AS (SELECT doc_id, ' '||array_to_string(string_split(w,''),'  ')||' ' AS s FROM dw),
           |ap AS (SELECT doc_id, $nested AS s FROM ds),
           |agg AS (SELECT doc_id, COUNT(*)::BIGINT AS n_words,
           |        SUM(len(string_split(trim(s,' '),'  ')))::BIGINT AS n_tokens_bpe
           |        FROM ap GROUP BY 1)
           |SELECT d.doc_id, COALESCE(agg.n_words, 0) AS n_words,
           |COALESCE(agg.n_tokens_bpe, 0) AS n_tokens_bpe
           |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
           |ORDER BY d.doc_id""".stripMargin
      }
    ),
    Q(
      "text_fingerprint",
      (s, dir) => {
        // md5 once per shingle via explode + aggregation barrier, then
        // everything after the aggregate — sort-by-pos, sliding-window
        // min, distinct, sort — is ONE native codegen expression
        // (WinnowFingerprint), replacing the interpreted
        // transform/slice/array_min chain that was the worst bench
        // line. fp is consumed twice (size + digest); the native call
        // is cheap enough that CollapseProject's inline-per-consumer
        // no longer needs an exchange barrier.
        val d = Fan.out(Tables(s, dir).documents)
        d.withColumn("sh", shingles(ws(col("text")), 3))
          .filter(size(col("sh")) >= 4)
          .select(col("doc_id"), posexplode(col("sh")))
          .select(col("doc_id"), col("pos"), md5(col("col").cast("binary")).as("h"))
          .groupBy("doc_id")
          .agg(collect_list(struct(col("pos"), col("h"))).as("ph"))
          .withColumn("fp", winnowFp(col("ph"), 4))
          .select(
            col("doc_id"),
            size(col("fp")).cast("long").as("n_fp"),
            md5(concat_ws(",", col("fp")).cast("binary")).as("digest"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
             |sh AS (SELECT doc_id, [array_to_string(ws[i:i+2],' ') for i in range(1, len(ws)-1)] AS s
             |       FROM w WHERE len(ws) >= 3),
             |hs AS (SELECT doc_id, [md5(x) for x in s] AS h FROM sh WHERE len(s) >= 4),
             |mn AS (SELECT doc_id, list_sort(list_distinct([list_min(h[i:i+3]) for i in range(1, len(h)-2)])) AS fp FROM hs)
             |SELECT doc_id, len(fp)::BIGINT AS n_fp, md5(array_to_string(fp, ',')) AS digest
             |FROM mn ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "text_repetition",
      // Gopher-style repetition signals (Rae et al. 2021 §A1.1): the
      // count of the most frequent word / bigram / trigram plus the
      // distinct-gram count, per document — exact integers (consumers
      // derive the fractions, which keeps the cross-engine hash exact).
      // Per-doc-key shuffles only; scales linearly in corpus size.
      (s, dir) => {
        // persisted: fans out to 4 aggregation branches (n_words + the
        // three gram sizes) — without the cache each branch re-scans and
        // re-tokenizes the corpus
        val base = graft.GraftCache.register(
          Fan
            .out(Tables(s, dir).documents)
            .select(col("doc_id"), ws(col("text")).as("w"))
            .persist())
        def grams(k: Int) = {
          val g = if (k == 1) col("w") else shingles(col("w"), k)
          base
            .select(col("doc_id"), explode(g).as("g"))
            .groupBy("doc_id", "g")
            .agg(count(lit(1)).as("c"))
            .groupBy("doc_id")
            .agg(max(col("c")).as(s"top${k}_n"), count(lit(1)).as(s"uniq${k}_n"))
        }
        base
          .select(col("doc_id"), size(col("w")).cast("long").as("n_words"))
          .join(grams(1), Seq("doc_id"), "left_outer")
          .join(grams(2), Seq("doc_id"), "left_outer")
          .join(grams(3), Seq("doc_id"), "left_outer")
          .select(
            col("doc_id"),
            col("n_words"),
            coalesce(col("top1_n"), lit(0L)).as("top1_n"),
            coalesce(col("uniq1_n"), lit(0L)).as("uniq1_n"),
            coalesce(col("top2_n"), lit(0L)).as("top2_n"),
            coalesce(col("uniq2_n"), lit(0L)).as("uniq2_n"),
            coalesce(col("top3_n"), lit(0L)).as("top3_n"),
            coalesce(col("uniq3_n"), lit(0L)).as("uniq3_n"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
             |t1 AS (SELECT doc_id, g, COUNT(*) AS c FROM w, UNNEST(ws) AS t(g) GROUP BY 1,2),
             |a1 AS (SELECT doc_id, MAX(c) AS top1_n, COUNT(*) AS uniq1_n FROM t1 GROUP BY 1),
             |s2 AS (SELECT doc_id, [array_to_string(ws[i:i+1],' ') for i in range(1, len(ws))] AS s
             |       FROM w WHERE len(ws) >= 2),
             |t2 AS (SELECT doc_id, g, COUNT(*) AS c FROM s2, UNNEST(s) AS t(g) GROUP BY 1,2),
             |a2 AS (SELECT doc_id, MAX(c) AS top2_n, COUNT(*) AS uniq2_n FROM t2 GROUP BY 1),
             |s3 AS (SELECT doc_id, [array_to_string(ws[i:i+2],' ') for i in range(1, len(ws)-1)] AS s
             |       FROM w WHERE len(ws) >= 3),
             |t3 AS (SELECT doc_id, g, COUNT(*) AS c FROM s3, UNNEST(s) AS t(g) GROUP BY 1,2),
             |a3 AS (SELECT doc_id, MAX(c) AS top3_n, COUNT(*) AS uniq3_n FROM t3 GROUP BY 1)
             |SELECT w.doc_id, len(ws)::BIGINT AS n_words,
             |  coalesce(top1_n, 0)::BIGINT AS top1_n, coalesce(uniq1_n, 0)::BIGINT AS uniq1_n,
             |  coalesce(top2_n, 0)::BIGINT AS top2_n, coalesce(uniq2_n, 0)::BIGINT AS uniq2_n,
             |  coalesce(top3_n, 0)::BIGINT AS top3_n, coalesce(uniq3_n, 0)::BIGINT AS uniq3_n
             |FROM w LEFT JOIN a1 USING (doc_id) LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)
             |ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "text_rarity_score",
      // Corpus-level rarity scoring — the two-pass shape behind
      // perplexity-style quality filters (CCNet, Wenzek et al. 2020):
      // pass 1 aggregates a corpus-wide document-frequency table, pass 2
      // joins it back per document. Signals stay exact integers (sum /
      // min / max of df over the doc's distinct vocabulary); consumers
      // derive the fractions, which keeps the cross-engine hash exact.
      //
      // Scale posture: the df table is vocabulary-sized (Zipf-bounded,
      // orders of magnitude smaller than the corpus) but NOT guaranteed
      // broadcast-safe at 100 TB, so the join is left un-hinted — AQE
      // broadcasts it when it fits and falls back to a hash shuffle on
      // the word key when it doesn't. Both passes are partial-first
      // aggregations over one persisted tokenization.
      (s, dir) => {
        val docWords = graft.GraftCache.register(
          Fan
            .out(Tables(s, dir).documents)
            .select(col("doc_id"), explode(ws(col("text"))).as("g"))
            .distinct()
            .persist())
        val df = docWords.groupBy("g").agg(count(lit(1)).as("df"))
        docWords
          .join(df, "g")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_vocab"),
            sum(col("df")).as("sum_df"),
            min(col("df")).as("min_df"),
            max(col("df")).as("max_df"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
             |d AS (SELECT DISTINCT doc_id, g FROM w, UNNEST(ws) AS t(g)),
             |df AS (SELECT g, COUNT(*) AS df FROM d GROUP BY g)
             |SELECT doc_id, COUNT(*) AS n_vocab, SUM(df)::BIGINT AS sum_df,
             |MIN(df) AS min_df, MAX(df) AS max_df
             |FROM d JOIN df USING (g) GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "text_pii_scrub",
      // PII redaction — the pre-training scrub pass: count and replace
      // email/phone patterns. The corpus has no organic PII, so the
      // query injects a deterministic example into every 20th document
      // (both engines, same expression) to exercise the match paths.
      // Narrow per-row regex work, no shuffle.
      (s, dir) => {
        val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
        val phoneRe = "\\d{3}-\\d{3}-\\d{4}"
        Fan
          .out(Tables(s, dir).documents.select("doc_id", "text"))
          .withColumn(
            "t",
            when(
              pmod(col("doc_id"), lit(20)) === 0,
              concat(
                col("text"),
                lit(" contact user"),
                col("doc_id").cast("string"),
                lit("@example.org or call 555-123-4567")))
              .otherwise(col("text")))
          .withColumn(
            "redacted",
            regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"), phoneRe, "<PHONE>"))
          .select(
            col("doc_id"),
            regexp_count(col("t"), lit(emailRe)).cast("long").as("n_emails"),
            regexp_count(col("t"), lit(phoneRe)).cast("long").as("n_phones"),
            length(col("redacted")).cast("long").as("redacted_len"),
            md5(col("redacted").cast("binary")).as("redacted_md5"))
          .orderBy("doc_id")
      },
      Some("""WITH aug AS (SELECT doc_id,
             |  CASE WHEN doc_id % 20 = 0
             |       THEN text || ' contact user' || doc_id::VARCHAR || '@example.org or call 555-123-4567'
             |       ELSE text END AS t FROM documents),
             |r AS (SELECT doc_id, t,
             |      regexp_replace(regexp_replace(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
             |                     '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g') AS redacted FROM aug)
             |SELECT doc_id,
             |  len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))::BIGINT AS n_emails,
             |  len(regexp_extract_all(t, '\d{3}-\d{3}-\d{4}'))::BIGINT AS n_phones,
             |  length(redacted)::BIGINT AS redacted_len,
             |  md5(redacted) AS redacted_md5
             |FROM r ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "text_pack_chunks",
      // Sequence packing for LLM pretraining: concatenate all documents
      // in doc_id order and cut the token stream into fixed 64-token
      // chunks; each doc maps to the [first_chunk, last_chunk] window
      // it lands in. The core primitive is a GLOBAL exclusive prefix
      // sum of per-doc token counts — the textbook case where the
      // obvious plan (one Window over ORDER BY doc_id) serializes the
      // whole table through a single partition. This implements the
      // distributed two-phase scan instead:
      //   1. per-bucket (doc_id div 1000) local exclusive prefix sums —
      //      windows partitioned BY BUCKET, so they parallelize;
      //   2. bucket TOTALS (one row per bucket) get the global-window
      //      treatment — trivially small at any corpus size — and the
      //      resulting bucket offsets broadcast-join back.
      // start_tok = bucket_offset + local_prefix. At 100 TB the only
      // single-partition work is #buckets rows; everything else is
      // bucket-parallel. The oracle states the SEMANTICS with the naive
      // global window — tiny at sf, identical by associativity.
      (s, dir) => {
        val t = Fan
          .out(Tables(s, dir).documents)
          .select(col("doc_id"), size(ws(col("text"))).cast("long").as("n_tok"))
          .filter(col("n_tok") > 0)
          .withColumn("bucket", expr("doc_id div 1000"))
        val wLocal = Window
          .partitionBy("bucket")
          .orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val local = t.withColumn("loc", coalesce(sum(col("n_tok")).over(wLocal), lit(0L)))
        // unpartitioned window over ~#buckets rows only (per-row sums
        // above are bucket-partitioned) — deliberate, not a scale bug
        val wBucket = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
        val offsets = t
          .groupBy("bucket")
          .agg(sum(col("n_tok")).as("btot"))
          .withColumn("boff", coalesce(sum(col("btot")).over(wBucket), lit(0L)))
          .select("bucket", "boff")
        local
          .join(broadcast(offsets), "bucket")
          .withColumn("start_tok", col("boff") + col("loc"))
          .withColumn("first_chunk", expr("start_tok div 64"))
          .withColumn("last_chunk", expr("(start_tok + n_tok - 1) div 64"))
          .select(
            col("doc_id"),
            col("n_tok"),
            col("start_tok"),
            col("first_chunk"),
            col("last_chunk"),
            (col("last_chunk") - col("first_chunk") + 1).as("n_chunks"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, len(string_split(text,' '))::BIGINT AS n_tok FROM documents),
             |p AS (SELECT doc_id, n_tok,
             |      COALESCE(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_tok
             |      FROM t WHERE n_tok > 0)
             |SELECT doc_id, n_tok, start_tok,
             |start_tok//64 AS first_chunk, (start_tok+n_tok-1)//64 AS last_chunk,
             |((start_tok+n_tok-1)//64 - start_tok//64 + 1) AS n_chunks
             |FROM p ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "text_gopher_rules",
      // The Gopher quality rule-set (Rae et al. 2021, Appendix A) as an
      // auditable per-document report: each rule is its own boolean
      // column and `keep` is their conjunction, so a corpus builder can
      // see WHICH rule rejected a document (the practical difference
      // from a single opaque score like text_quality). Thresholds are
      // adapted to the synthetic corpus' 10-99-word range so every rule
      // actually fires on some documents. All ratio comparisons divide
      // exact integers in IEEE doubles — bit-identical cross-engine.
      //
      // Scale posture: pure narrow per-row work, no shuffle before the
      // presentation sort; the word split is computed once per rule
      // chain via a shared projection.
      (s, dir) =>
        gopherRuleFrame(Fan.out(Tables(s, dir).documents.select("doc_id", "text")))
          .withColumn(
            "keep",
            col("rule_wc") && col("rule_wlen") && col("rule_alpha") && col("rule_stop"))
          .select(
            "doc_id", "wc", "mean_wlen", "rule_wc", "rule_wlen", "rule_alpha", "rule_stop", "keep")
          .orderBy("doc_id"),
      Some(s"""WITH $gopherRulesSql
             |SELECT doc_id, wc, mean_wlen, rule_wc, rule_wlen, rule_alpha, rule_stop,
             |(rule_wc AND rule_wlen AND rule_alpha AND rule_stop) AS keep
             |FROM r ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "text_char_entropy",
      // Character-entropy gibberish screen — the information-theoretic
      // quality signal next to the rule-based ones: repeated-character
      // floods, base64 blobs, and keyboard mash have character
      // distributions far from natural text, and per-character entropy
      // separates them without any language model. Uses the repo's
      // integer bit-width surrogate (length(bin(x)) = floor(log2 x)+1,
      // the text_perplexity_bigram / text_bm25 idiom): ent_bits =
      // Σ_c n_c·(bits(N) − bits(n_c)) ≈ N·H(doc) in bits, exact BIGINT
      // in both engines, plus the per-character milli rate a filter
      // thresholds.
      //
      // Scale posture: one narrow char explode (rows = characters —
      // the same cost class as the shingle ops), a (doc, char)
      // map-side-combined count, a doc rollup. No pairwise anything.
      (s, dir) => {
        val d = Fan.out(Tables(s, dir).documents.select("doc_id", "text"))
        // (doc, char) histogram — persisted: feeds both the per-doc
        // totals and the entropy terms (one explode, not two)
        val h = GraftCache.register(
          d.select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
            .filter(length(col("ch")) > 0)
            .groupBy("doc_id", "ch")
            .agg(count(lit(1)).as("n"))
            .persist())
        val t = h.groupBy("doc_id")
          .agg(sum(col("n")).as("n_chars"), count(lit(1)).as("n_distinct"))
        h.join(t, "doc_id")
          .groupBy(col("doc_id"), col("n_chars"), col("n_distinct"))
          .agg(sum(expr("n * (length(bin(n_chars)) - length(bin(n)))")).as("ent_bits"))
          .withColumn("ent_milli_per_char", expr("ent_bits * 1000 div n_chars"))
          .orderBy("doc_id")
      },
      Some("""WITH c AS (SELECT doc_id, text[i] AS ch
             |       FROM documents, UNNEST(range(1, length(text)+1)) AS t(i)),
             |h AS (SELECT doc_id, ch, COUNT(*)::BIGINT AS n FROM c GROUP BY 1, 2),
             |tt AS (SELECT doc_id, SUM(n)::BIGINT AS n_chars, COUNT(*)::BIGINT AS n_distinct
             |       FROM h GROUP BY 1)
             |SELECT h.doc_id, n_chars, n_distinct,
             |SUM(n * (length(bin(n_chars)) - length(bin(n))))::BIGINT AS ent_bits,
             |((SUM(n * (length(bin(n_chars)) - length(bin(n)))) * 1000) // n_chars)::BIGINT
             |  AS ent_milli_per_char
             |FROM h JOIN tt USING (doc_id) GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "text_dedup_lines",
      // CCNet-style LINE-level dedup (Wenzek et al. 2020 drop duplicated
      // lines across the whole corpus before document scoring): documents
      // are segmented into fixed 10-word lines, a line occurring in more
      // than one document is dropped everywhere, and each document is
      // REASSEMBLED from its surviving lines in order — a transformation
      // pass, not just a signal. Injected fixtures prove both shapes: doc
      // 700000 copies the first 20 words (= first two lines) of doc 1
      // ahead of unique filler (partial overlap — only the shared lines
      // go), doc 700001 is a verbatim copy of doc 2 (every line goes).
      //
      // Scale posture: lines travel as md5 digests through the frequency
      // pass (constant-width shuffle key regardless of line length, the
      // same trick CCNet uses with SHA-1); the df table is line-keyed and
      // partial-first aggregated; reassembly is one per-doc shuffle whose
      // payload is the document itself. No pairwise work anywhere.
      (s, dir) => {
        val docs = Tables(s, dir).documents.select("doc_id", "text")
        val partial = docs
          .filter(col("doc_id") === 1)
          .select(
            lit(700000L).as("doc_id"),
            concat(
              array_join(slice(ws(col("text")), 1, 20), " "),
              lit(" unua dua tria kvara kvina sesa sepa oka naua deka")).as("text"))
        val copy = docs
          .filter(col("doc_id") === 2)
          .select(lit(700001L).as("doc_id"), col("text"))
        val aug = docs.unionByName(partial).unionByName(copy)
        val w = ws(col("text"))
        val segs = transform(
          sequence(lit(0), floor((size(w) - 1) / 10).cast("int")),
          i => array_join(slice(w, i * 10 + 1, lit(10)), " "))
        val lines = graft.GraftCache.register(
          Fan
            .out(aug)
            .select(col("doc_id"), posexplode(segs).as(Seq("idx", "line")))
            .withColumn("h", md5(col("line").cast("binary")))
            .persist())
        val freq = lines.groupBy("h").agg(countDistinct(col("doc_id")).as("nd"))
        lines
          .join(freq, "h")
          .withColumn("keep", col("nd") <= 1)
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_lines"),
            sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"),
            array_join(
              transform(
                filter(
                  array_sort(collect_list(struct(col("idx"), col("keep"), col("line")))),
                  x => x.getField("keep")),
                x => x.getField("line")),
              " ").as("text_dedup"))
          .orderBy("doc_id")
      },
      Some("""WITH aug AS (SELECT doc_id, text FROM documents
             |  UNION ALL SELECT 700000, array_to_string(string_split(text,' ')[1:20],' ')
             |    || ' unua dua tria kvara kvina sesa sepa oka naua deka' FROM documents WHERE doc_id = 1
             |  UNION ALL SELECT 700001, text FROM documents WHERE doc_id = 2),
             |w AS (SELECT doc_id, string_split(text,' ') AS ws FROM aug),
             |l AS (SELECT doc_id, i AS idx, array_to_string(ws[i*10+1:i*10+10],' ') AS line
             |      FROM w, UNNEST(range(0, (len(ws)-1)//10 + 1)) AS t(i)),
             |f AS (SELECT md5(line) AS h, COUNT(DISTINCT doc_id) AS nd FROM l GROUP BY 1),
             |j AS (SELECT l.doc_id, l.idx, l.line, f.nd <= 1 AS keep FROM l JOIN f ON md5(l.line) = f.h)
             |SELECT doc_id, COUNT(*)::BIGINT AS n_lines,
             |SUM(CASE WHEN keep THEN 0 ELSE 1 END)::BIGINT AS n_dropped,
             |COALESCE(string_agg(CASE WHEN keep THEN line END, ' ' ORDER BY idx), '') AS text_dedup
             |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "text_domain_balance",
      // Domain reweighting — the source-mix control every pretraining
      // corpus build runs after filtering (equal-contribution variant:
      // downsample every source to the smallest source's quality-passing
      // count). The sampling decision is a pure function of
      // (source, doc_id) via md5, so the kept set is reproducible across
      // runs, machines, and engines, and the per-source rate is an exact
      // integer in ppm — no float rate ever touches the data path.
      //
      // Scale posture: the rate table is one row per source (broadcast);
      // the quality gate + hash keep are narrow per-row work, so the only
      // shuffles are the two source-keyed count aggregations (both
      // map-side combined). At 100 TB the same plan holds with the rate
      // table still tiny.
      (s, dir) => {
        val d = Fan
          .out(Tables(s, dir).documents.select("doc_id", "source", "text"))
          .filter(size(ws(col("text"))) >= 40)
        val counts = d.groupBy("source").agg(count(lit(1)).as("cnt"))
        val tgt = counts.agg(min("cnt").as("tgt"))
        val rates = counts
          .crossJoin(broadcast(tgt))
          .select(col("source"), expr("(tgt * 1000000) div cnt").as("keep_ppm"))
        d.withColumn(
          "u",
          pmod(
            conv(
              substring(
                md5(concat(col("source"), lit(":"), col("doc_id").cast("string")).cast("binary")),
                1,
                12),
              16,
              10).cast("long"),
            lit(1000000L)))
          .join(broadcast(rates), "source")
          .filter(col("u") < col("keep_ppm"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_kept"), max("keep_ppm").as("keep_ppm"))
          .orderBy("source")
      },
      Some("""WITH q AS (SELECT doc_id, source FROM documents WHERE len(string_split(text,' ')) >= 40),
             |c AS (SELECT source, COUNT(*)::BIGINT AS cnt FROM q GROUP BY 1),
             |t AS (SELECT MIN(cnt) AS tgt FROM c),
             |r AS (SELECT source, ((t.tgt * 1000000) // c.cnt)::BIGINT AS keep_ppm FROM c CROSS JOIN t),
             |k AS (SELECT q.doc_id, q.source, r.keep_ppm FROM q JOIN r USING (source)
             |      WHERE ('0x'||substr(md5(q.source||':'||q.doc_id::VARCHAR),1,12))::BIGINT % 1000000 < r.keep_ppm)
             |SELECT source, COUNT(*)::BIGINT AS n_kept, MAX(keep_ppm)::BIGINT AS keep_ppm
             |FROM k GROUP BY source ORDER BY source""".stripMargin)
    ),
    Q(
      "text_keyword_search",
      // Keyword search over the corpus through the inverted-index shape:
      // tokenize -> postings (term, doc_id, tf) restricted to the query
      // terms -> per-doc relevance (distinct terms matched, then total
      // term frequency, then doc_id as the total tiebreak), top 20.
      // Integer-only scoring — no IDF floats in the hash.
      //
      // Scale posture: the query-term IN filter applies DURING the
      // explode's narrow stage, so only postings for the queried terms
      // ever reach the shuffle (at 100 TB a standing index would
      // materialize the same postings table partitioned by term; the
      // query-time plan is identical from the filter onward). The
      // per-doc aggregation is map-side combined; top-20 is a
      // TakeOrdered, never a global sort.
      (s, dir) => {
        // scoring + order shared with ann_hybrid_rrf's keyword branch
        // (TextFunctions.keywordScores — one definition of "relevance")
        keywordScores(Tables(s, dir).documents, Seq("spark", "window", "hash"))
          .withColumnRenamed("tf", "tf_total")
          .orderBy(col("n_terms").desc, col("tf_total").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""WITH ${keywordScoresSql("documents", Seq("spark", "window", "hash"))}
             |SELECT doc_id, n_terms, tf AS tf_total FROM kagg
             |ORDER BY n_terms DESC, tf_total DESC, doc_id LIMIT 20""".stripMargin)
    ),
    Q(
      "text_bm25",
      // BM25 ranking (Robertson & Walker) over the inverted-index shape
      // text_keyword_search uses, with INTEGER-QUANTIZED scoring — the
      // trick production indexes ship anyway (Lucene stores quantized
      // per-term impacts): idf is quantized to its bit width
      // (length(bin(N div df)) = floor(log2(N/df)) + 1 — exact integers
      // both engines), k1 = 1.2 / b = 0.75 live in milli-units, and the
      // tf-saturation fraction is one mirrored integer-division chain,
      // so the per-term impact and the summed document score are exact
      // BIGINTs — no log or float ever enters the hash.
      //
      // Scale posture: dl/avgdl come from one map-side-combined
      // aggregation pair (the global (N, total-tokens) row is ONE row,
      // broadcast); postings are filtered to the query terms INSIDE the
      // narrow explode (as text_keyword_search); df is term-keyed
      // (bounded by query size after the filter); the doc-keyed score
      // sum is map-side combined and the top-20 a TakeOrdered.
      (s, dir) => {
        val terms = Seq("spark", "window", "hash")
        val base = graft.GraftCache.register(
          Fan
            .out(Tables(s, dir).documents.select("doc_id", "text"))
            .select(col("doc_id"), ws(col("text")).as("w"))
            .persist())
        val dl = base.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
        val g = base
          .agg(count(lit(1)).as("n_docs"), sum(size(col("w")).cast("long")).as("tot"))
          .select(col("n_docs"), expr("(tot * 1000) div n_docs").as("avgdl_milli"))
        val tf = base
          .select(col("doc_id"), explode(col("w")).as("term"))
          .filter(col("term").isin(terms: _*))
          .groupBy("doc_id", "term")
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        tf.join(broadcast(df), "term")
          .join(dl, "doc_id")
          .crossJoin(broadcast(g))
          .withColumn("idf_q", length(bin(expr("n_docs div df"))).cast("long"))
          .withColumn("dl_ratio_milli", expr("(dl * 1000000) div avgdl_milli"))
          .withColumn("inner_milli", expr("250 + (750 * dl_ratio_milli) div 1000"))
          .withColumn("denom_micro", expr("tf * 1000000 + 1200 * inner_milli"))
          .withColumn("s_milli", expr("idf_q * ((tf * 2200000000) div denom_micro)"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_terms"), sum(col("s_milli")).as("score_milli"))
          .orderBy(col("score_milli").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
             |dl AS (SELECT doc_id, len(ws)::BIGINT AS dl FROM w),
             |g AS (SELECT COUNT(*)::BIGINT AS n_docs,
             |      ((SUM(dl) * 1000) // COUNT(*))::BIGINT AS avgdl_milli FROM dl),
             |tok AS (SELECT doc_id, t.g AS term FROM w, UNNEST(ws) AS t(g)
             |        WHERE t.g IN ('spark', 'window', 'hash')),
             |tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
             |df AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY 1),
             |sc AS (SELECT tf.doc_id,
             |       length(bin(g.n_docs // df.df))::BIGINT
             |         * ((tf.tf * 2200000000) //
             |            (tf.tf * 1000000
             |             + 1200 * (250 + (750 * ((dl.dl * 1000000) // g.avgdl_milli)) // 1000)))
             |         AS s_milli
             |       FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN g)
             |SELECT doc_id, COUNT(*)::BIGINT AS n_terms, SUM(s_milli)::BIGINT AS score_milli
             |FROM sc GROUP BY doc_id ORDER BY score_milli DESC, doc_id LIMIT 20""".stripMargin)
    ),
    Q(
      "text_dsir",
      // DSIR-shaped data selection (Xie et al. 2023, "Data Selection
      // for Language Models via Importance Resampling"): estimate a
      // target-domain and a raw-pool distribution over HASHED n-gram
      // features, score every raw document by how target-like its
      // features are, and gate on the score. Docs 0-49 stand in for the
      // target-domain sample; features are unigrams hashed to 128
      // buckets (md5-derived, portable); both distributions are
      // add-one-smoothed exact ppm integers. The paper's log-ratio
      // Σ log(p_tgt/p_raw) is replaced by the ppm DIFFERENCE
      // Σ (p_tgt - p_raw) so the score is an exact BIGINT (same sign
      // semantics: positive = more target-like than the pool; the
      // ranking differs only in weighting, and the plan — the part that
      // matters at scale — is identical).
      //
      // Scale posture: both distributions are 128-row broadcast tables
      // built by one map-side-combined aggregation each over the same
      // narrow tokenize; scoring is a broadcast join + one doc-keyed
      // map-side-combined sum. Linear in corpus size, no pairwise work.
      (s, dir) => {
        val bucketOf = (t: org.apache.spark.sql.Column) =>
          pmod(conv(substring(md5(t.cast("binary")), 1, 8), 16, 10).cast("long"), lit(128L))
        val tok = graft.GraftCache.register(
          Fan
            .out(Tables(s, dir).documents.select("doc_id", "text"))
            .select(col("doc_id"), explode(ws(col("text"))).as("term"))
            .select(col("doc_id"), bucketOf(col("term")).as("b"))
            .persist())
        val rawC = tok.groupBy("b").agg(count(lit(1)).as("rc"))
        val rawN = tok.agg(count(lit(1)).as("rn"))
        val tgtC = tok.filter(col("doc_id") < 50).groupBy("b").agg(count(lit(1)).as("tc"))
        val tgtN = tok.filter(col("doc_id") < 50).agg(count(lit(1)).as("tn"))
        // bucket table over the raw-side bucket universe (every token's
        // bucket is present there by construction); absent target
        // buckets smooth to (0+1)/(tn+128)
        val bs = rawC
          .join(tgtC, Seq("b"), "left_outer")
          .crossJoin(broadcast(rawN))
          .crossJoin(broadcast(tgtN))
          .select(
            col("b"),
            expr("((coalesce(tc, CAST(0 AS BIGINT)) + 1) * 1000000) div (tn + 128)").as("tgt_ppm"),
            expr("((rc + 1) * 1000000) div (rn + 128)").as("raw_ppm"))
        tok
          .filter(col("doc_id") >= 50)
          .join(broadcast(bs), "b")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_tok"),
            sum(col("tgt_ppm") - col("raw_ppm")).as("imp_score"))
          .withColumn("keep", col("imp_score") > 0)
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
             |tok AS (SELECT doc_id, ('0x'||substr(md5(t.g),1,8))::BIGINT % 128 AS b
             |        FROM w, UNNEST(ws) AS t(g)),
             |rc AS (SELECT b, COUNT(*)::BIGINT AS rc FROM tok GROUP BY 1),
             |rn AS (SELECT COUNT(*)::BIGINT AS rn FROM tok),
             |tc AS (SELECT b, COUNT(*)::BIGINT AS tc FROM tok WHERE doc_id < 50 GROUP BY 1),
             |tn AS (SELECT COUNT(*)::BIGINT AS tn FROM tok WHERE doc_id < 50),
             |bs AS (SELECT rc.b,
             |       ((COALESCE(tc.tc, 0) + 1) * 1000000) // (tn.tn + 128) AS tgt_ppm,
             |       ((rc.rc + 1) * 1000000) // (rn.rn + 128) AS raw_ppm
             |       FROM rc LEFT JOIN tc ON rc.b = tc.b CROSS JOIN rn CROSS JOIN tn)
             |SELECT doc_id, COUNT(*)::BIGINT AS n_tok,
             |SUM(tgt_ppm - raw_ppm)::BIGINT AS imp_score,
             |(SUM(tgt_ppm - raw_ppm) > 0) AS keep
             |FROM tok JOIN bs USING (b) WHERE doc_id >= 50
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "text_classifier_gate",
      // MODEL-BASED quality filtering — the classifier stage modern
      // pipelines run after rule filters (FineWeb-Edu's educational
      // scorer, CCNet's fastText quality head): a trained linear model
      // over cheap document features, applied as pure columnar math.
      // The weights are a FIXED broadcast artifact (trained offline —
      // here a lexical-diversity classifier: reward distinct
      // vocabulary, penalize stopword-heavy and long-but-repetitive
      // docs) and the sigmoid gate needs no float at all:
      // σ(score) > 0.5 ⟺ score > 0, so the entire inference is one
      // exact-BIGINT dot product per document and the decision
      // hash-verifies cross-engine.
      //
      // Scale posture: inference is embarrassingly parallel narrow
      // work inside the scan's codegen span — the model ships as
      // literals, there is no shuffle until the presentation sort.
      // This is what "run the classifier over 100 TB" should compile
      // to; anything routed through a Python UDF loses codegen AND
      // pays serialization per row.
      (s, dir) => {
        val d = Fan.out(Tables(s, dir).documents.select("doc_id", "lang", "text"))
        d.withColumn("nw", size(ws(col("text"))).cast("long"))
          .withColumn("stop", stopHits(ws(col("text"))).cast("long"))
          .withColumn("dw", size(array_distinct(ws(col("text")))).cast("long"))
          .withColumn(
            "score",
            lit(60L) * col("dw") - lit(50L) * col("stop") - lit(10L) * col("nw") - lit(600L))
          .select(
            col("doc_id"),
            col("lang"),
            col("nw"),
            col("dw"),
            col("score"),
            (col("score") > 0L).as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""WITH f AS (SELECT doc_id, lang,
             |  len(string_split(text,' '))::BIGINT AS nw,
             |  len([w for w in string_split(text,' ') if w IN $StopwordsSql])::BIGINT AS stop,
             |  len(list_distinct(string_split(text,' ')))::BIGINT AS dw
             |  FROM documents)
             |SELECT doc_id, lang, nw, dw,
             |60*dw - 50*stop - 10*nw - 600 AS score,
             |(60*dw - 50*stop - 10*nw - 600 > 0) AS keep
             |FROM f ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "text_perplexity_bigram",
      // CCNet-style language-model quality filter (Wenzek et al. 2020):
      // train an n-gram LM on a CURATED reference corpus (CCNet uses a
      // KenLM 5-gram over Wikipedia; docs 0-49 stand in here, the same
      // reference slice text_dsir uses), score every candidate document
      // by its average per-token surprisal under that model, and keep
      // the low-perplexity (reference-like) documents. The bigram model
      // is add-one smoothed: p(w2|w1) = (c2(w1 w2)+1)/(c1(w1)+V) with
      // c1 the PREFIX count (both counts from the same bigram relation,
      // so Σ_w2 c2 = c1 exactly) and V the training vocabulary.
      // Surprisal stays integer-exact via the text_bm25 bit-width
      // idiom: bits = length(bin((c1+V) div (c2+1))) ≈ log2(1/p), so
      // the per-doc score (milli-bits per bigram) is a BIGINT division
      // chain both engines compute identically — no log/float anywhere
      // in the hash. Like CCNet, documents are then binned into
      // head/middle/tail perplexity buckets (CCNet trains on head,
      // experiments on middle, drops tail); the cut points are fixed
      // constants chosen between the observed tertiles at sf0.01 and
      // sf0.1 so the column genuinely varies at gate and bench scales.
      //
      // Scale posture: the LM's size scales with the REFERENCE corpus
      // (fixed, curated — Wikipedia-sized), NOT with the 100 TB pool
      // being scored, so the model tables are BROADCAST — exactly how
      // a production deployment ships its KenLM binary to every
      // executor. Scoring is a narrow bigram explode + two broadcast
      // joins + one doc-keyed map-side-combined aggregation; linear in
      // corpus size, no shuffle wider than the per-doc rollup.
      (s, dir) => {
        val docs = graft.GraftCache.register(
          Fan
            .out(Tables(s, dir).documents.select("doc_id", "text"))
            .select(col("doc_id"), explode(shingles(ws(col("text")), 2)).as("g"))
            .select(col("doc_id"), col("g"), substring_index(col("g"), " ", 1).as("w1"))
            .persist())
        val train = docs.filter(col("doc_id") < 50)
        val c2 = train.groupBy("g").agg(count(lit(1)).as("c2"))
        val c1 = train.groupBy("w1").agg(count(lit(1)).as("c1"))
        // V counts distinct TOKENS of the training slice (standard
        // smoothing vocab), not distinct bigram prefixes
        val v = Tables(s, dir).documents
          .filter(col("doc_id") < 50)
          .select(explode(ws(col("text"))).as("w"))
          .agg(countDistinct(col("w")).as("v"))
        docs
          .filter(col("doc_id") >= 50)
          .join(broadcast(c2), Seq("g"), "left_outer")
          .join(broadcast(c1), Seq("w1"), "left_outer")
          .crossJoin(broadcast(v))
          .withColumn(
            "bits",
            expr("CAST(length(bin((coalesce(c1, CAST(0 AS BIGINT)) + v) div (coalesce(c2, CAST(0 AS BIGINT)) + 1))) AS BIGINT)"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).as("bits_sum"))
          .withColumn("ppx_milli", expr("bits_sum * 1000 div n_bigrams"))
          .withColumn(
            "bucket",
            when(col("ppx_milli") < 5480L, "head")
              .when(col("ppx_milli") < 5570L, "middle")
              .otherwise("tail"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
             |bg AS (SELECT doc_id, ws[i]||' '||ws[i+1] AS g, ws[i] AS w1
             |       FROM w, UNNEST(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2),
             |c2 AS (SELECT g, COUNT(*)::BIGINT AS c2 FROM bg WHERE doc_id < 50 GROUP BY 1),
             |c1 AS (SELECT w1, COUNT(*)::BIGINT AS c1 FROM bg WHERE doc_id < 50 GROUP BY 1),
             |v AS (SELECT COUNT(DISTINCT t.g)::BIGINT AS v
             |      FROM w, UNNEST(ws) AS t(g) WHERE doc_id < 50),
             |sc AS (SELECT bg.doc_id,
             |       length(bin((COALESCE(c1.c1, 0) + v.v) // (COALESCE(c2.c2, 0) + 1)))::BIGINT AS bits
             |       FROM bg LEFT JOIN c2 USING (g) LEFT JOIN c1 USING (w1) CROSS JOIN v
             |       WHERE bg.doc_id >= 50)
             |SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams, SUM(bits)::BIGINT AS bits_sum,
             |((SUM(bits) * 1000) // COUNT(*))::BIGINT AS ppx_milli,
             |CASE WHEN (SUM(bits) * 1000) // COUNT(*) < 5480 THEN 'head'
             |     WHEN (SUM(bits) * 1000) // COUNT(*) < 5570 THEN 'middle'
             |     ELSE 'tail' END AS bucket
             |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "text_ngram_novelty",
      // N-GRAM NOVELTY — the memorization/novelty audit dataset
      // analyses publish (what fraction of a candidate doc's 3-grams
      // never appear in the reference corpus): reference = the
      // doc_id < 250 slice's DISTINCT trigram set, candidates = the
      // rest; novelty_ppm = 1e6·n_novel div n_grams in exact integers.
      // High novelty = genuinely new text; near-zero = verbatim or
      // templated duplication the dedup stages should have caught —
      // this is the audit that finds what they missed.
      //
      // Scale posture: the reference gram set is corpus-derived, so it
      // is NEVER broadcast — the membership probe is a gram-keyed
      // left join (shuffle-hash hinted, the r8 rule), map-side-combined
      // per-doc counts on top. One explode per side, no pairwise work.
      (s, dir) => {
        val d = Fan.out(Tables(s, dir).documents.select("doc_id", "text"))
        val grams = (df: org.apache.spark.sql.DataFrame) =>
          df.select(col("doc_id"), explode(shingles(ws(col("text")), 3)).as("g"))
        val ref = grams(d.filter(col("doc_id") < 250)).select("g").distinct()
        grams(d.filter(col("doc_id") >= 250))
          .join(ref.withColumn("seen", lit(1L)).hint("shuffle_hash"), Seq("g"), "left")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_grams"),
            sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_novel"))
          .withColumn("novelty_ppm", expr("(n_novel * 1000000) div n_grams"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
             |g AS (SELECT doc_id, ws[i]||' '||ws[i+1]||' '||ws[i+2] AS g
             |      FROM w, UNNEST(range(1, len(ws)-1)) AS t(i) WHERE len(ws) >= 3),
             |ref AS (SELECT DISTINCT g FROM g WHERE doc_id < 250),
             |cand AS (SELECT g.doc_id, g.g, ref.g IS NOT NULL AS seen
             |         FROM g LEFT JOIN ref ON g.g = ref.g WHERE g.doc_id >= 250)
             |SELECT doc_id, COUNT(*)::BIGINT AS n_grams,
             |SUM(CASE WHEN NOT seen THEN 1 ELSE 0 END)::BIGINT AS n_novel,
             |((SUM(CASE WHEN NOT seen THEN 1 ELSE 0 END) * 1000000) // COUNT(*))::BIGINT AS novelty_ppm
             |FROM cand GROUP BY 1 ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "text_decontaminate_semantic",
      // SEMANTIC decontamination — the embedding-space complement of
      // text_decontaminate's n-gram overlap (the Llama/PaLM-style
      // "remove training docs too close to the eval set" sweep that
      // catches paraphrased leakage n-grams miss): the benchmark
      // sample (vec_id < 20 — the held-out slice) is broadcast
      // (structurally bounded: an eval set is small by definition, it
      // never scales with the corpus) and every corpus embedding takes
      // its max exact-integer cosine against it; contamination =
      // max ≥ 0.30. Emits the per-doc audit row (max similarity + the
      // flag), not just the filtered corpus — the evidence a data card
      // cites. Cosines are the established bit-exact idiom (integer
      // dot, one IEEE division), so MAX and the threshold cut are
      // stable cross-engine.
      //
      // Scale posture: one corpus scan against a broadcast eval set —
      // cost ∝ corpus × |benchmark|, map-side max, no shuffle wider
      // than the doc-keyed rollup. At 100 TB identical shape.
      (s, dir) => {
        import graft.functions.VectorFunctions.{quantize, normSqQ, dotQ, cosineFrom}
        val e = Fan
          .out(Tables(s, dir).embeddings)
          .withColumn("qv", quantize(col("embedding")))
          .withColumn("nsq", normSqQ(col("qv")))
        val bench = e
          .filter(col("vec_id") < 20)
          .select(col("qv").as("qe"), col("nsq").as("qn"))
        e.filter(col("vec_id") >= 20)
          .crossJoin(broadcast(bench))
          .withColumn("cosine", cosineFrom(dotQ(col("qe"), col("qv")), col("qn"), col("nsq")))
          .groupBy(col("vec_id").as("doc_id"))
          .agg(max(col("cosine")).as("max_cos"))
          .withColumn("contaminated", col("max_cos") >= 0.30)
          .orderBy("doc_id")
      },
      Some("""WITH n AS (SELECT vec_id,
             |      [CAST(round(CAST(x AS DOUBLE)*1000000) AS BIGINT) for x in embedding] AS qv FROM embeddings),
             |m AS (SELECT vec_id, qv,
             |      (SELECT SUM(qv[i]*qv[i]) FROM UNNEST(range(1, len(qv)+1)) AS t(i)) AS nsq FROM n),
             |b AS (SELECT qv AS qe, nsq AS qn FROM m WHERE vec_id < 20),
             |sc AS (SELECT m.vec_id AS doc_id,
             |  CAST((SELECT SUM(b.qe[i]*m.qv[i]) FROM UNNEST(range(1, len(b.qe)+1)) AS t(i)) AS DOUBLE)
             |    / (sqrt(CAST(b.qn AS DOUBLE))*sqrt(CAST(m.nsq AS DOUBLE))) AS cosine
             |  FROM m CROSS JOIN b WHERE m.vec_id >= 20)
             |SELECT doc_id, MAX(cosine) AS max_cos, MAX(cosine) >= 0.30 AS contaminated
             |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin)
    ),
    Q(
      "text_mixture_weights",
      // Pretraining MIXTURE WEIGHTS with temperature — the sampling
      // table every multi-source corpus build publishes next to its
      // data card (the α=0.5 "square-root temperature" of GPT-3 /
      // Llama data mixing: w_i ∝ tokens_i^0.5, flattening the source
      // distribution so giant crawls don't drown curated sources).
      // Everything is EXACT integer arithmetic: tokens_i^0.5 is a true
      // integer sqrt — floor(sqrt) from the IEEE double corrected by
      // ±1 against the exact square, the portable isqrt both engines
      // agree on bit-for-bit — and the published weight is ppm, the
      // expected repetition factor (epochs over the source under the
      // mixture for one total-corpus pass) exact milli.
      //
      // Scale posture: one map-side-combined per-source token count
      // (sources-sized result), a 1-row broadcast of the totals, then
      // per-source narrow arithmetic. The documents are scanned once;
      // at 100 TB the same plan holds with the mixture table still
      // tiny.
      (s, dir) => {
        val toks = Fan
          .out(Tables(s, dir).documents.select(col("source"), ws(col("text")).as("w")))
          .select(col("source"), size(col("w")).cast("long").as("nw"))
          .groupBy("source")
          .agg(sum("nw").as("tok"))
        val isq = toks
          .withColumn("r0", floor(sqrt(col("tok").cast("double"))).cast("long"))
          .withColumn(
            "isq",
            col("r0")
              + when((col("r0") + 1) * (col("r0") + 1) <= col("tok"), 1L).otherwise(0L)
              - when(col("r0") * col("r0") > col("tok"), 1L).otherwise(0L))
          .drop("r0")
        val tot = isq.agg(sum("isq").as("s_isq"), sum("tok").as("tt"))
        isq
          .crossJoin(broadcast(tot))
          .select(
            col("source"),
            col("tok").as("n_tokens"),
            col("isq").as("isqrt_tokens"),
            expr("(isq * 1000000) div s_isq").as("weight_ppm"),
            // weight_ppm·tt crosses BIGINT once total corpus tokens
            // pass ~9.2e12 (a 100 TB corpus is 1e13-1e14 tokens), so
            // the product runs in DECIMAL(38,0); BIGINT on the wire
            expr("""CAST((CAST((isq * 1000000) div s_isq AS DECIMAL(38,0)) * tt)
                   | div (CAST(tok AS DECIMAL(38,0)) * 1000) AS BIGINT)""".stripMargin)
              .as("epochs_milli"))
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT source, len(string_split(text,' '))::BIGINT AS nw FROM documents),
             |c AS (SELECT source, SUM(nw)::BIGINT AS tok FROM d GROUP BY 1),
             |r AS (SELECT source, tok, CAST(floor(sqrt(tok)) AS BIGINT) AS r0 FROM c),
             |i AS (SELECT source, tok,
             |      r0 + CASE WHEN (r0+1)*(r0+1) <= tok THEN 1 ELSE 0 END
             |         - CASE WHEN r0*r0 > tok THEN 1 ELSE 0 END AS isq FROM r),
             |t AS (SELECT SUM(isq) AS s_isq, SUM(tok) AS tt FROM i)
             |SELECT source, tok AS n_tokens, isq AS isqrt_tokens,
             |((isq * 1000000) // t.s_isq)::BIGINT AS weight_ppm,
             |((CAST((isq * 1000000) // t.s_isq AS HUGEINT) * t.tt)
             |  // (CAST(tok AS HUGEINT) * 1000))::BIGINT AS epochs_milli
             |FROM i, t ORDER BY source""".stripMargin)
    ),
    Q(
      "text_pmi_collocations",
      // Collocation extraction — the corpus-linguistics PMI table
      // (Church & Hanks 1990) every tokenizer/vocab review reads: the
      // top bigrams whose observed frequency most exceeds the
      // independence expectation. The PMI ratio p(ab)/(p(a)p(b)) =
      // n_ab·N²/(B·n_a·n_b) is computed EXACTLY as a ppm lift in
      // DECIMAL(38,0)/HUGEINT intermediates (N² crosses BIGINT at the
      // bench scale factor — the ann_ivf_pq 100× lesson applied at
      // design time), cast to BIGINT only on the wire. min-count 5
      // screens the unstable tail, ties break on the pair text.
      //
      // Scale posture: one shingle explode (rows = tokens), two
      // map-side-combined counts (bigram- and unigram-keyed), then a
      // vocabulary-sized join — the unigram side is broadcast (a
      // vocabulary is structurally small; at 100 TB it is still ≪ the
      // corpus). TakeOrdered for the global top-20, never a full sort.
      (s, dir) => {
        val w = ws(col("text"))
        val d = Fan.out(Tables(s, dir).documents.select("text"))
        val grams = GraftCache.register(
          d.select(explode(shingles(w, 2)).as("pair")).persist())
        val uniAll = GraftCache.register(
          d.select(explode(w).as("w1")).groupBy("w1").agg(count(lit(1)).as("n_w")).persist())
        val tot = grams
          .agg(count(lit(1)).as("bb"))
          .crossJoin(uniAll.agg(sum("n_w").as("nn")))
        // lossless broadcast bound: a word inside a ≥5-count bigram has
        // unigram count ≥5, so the rare tail (the bulk of a raw-token
        // vocabulary at 100 TB — typos, hashes, one-offs) never ships
        val uni = uniAll.filter(col("n_w") >= 5)
        val bi = grams
          .groupBy("pair")
          .agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= 5)
          .withColumn("w1", split(col("pair"), " ")(0))
          .withColumn("w2", split(col("pair"), " ")(1))
        bi.join(broadcast(uni), "w1")
          .join(broadcast(uni.select(col("w1").as("w2"), col("n_w").as("n_w2"))), "w2")
          .crossJoin(broadcast(tot))
          .select(
            col("pair"),
            col("n_ab"),
            col("n_w").as("n_a"),
            col("n_w2").as("n_b"),
            expr("""CAST((CAST(n_ab AS DECIMAL(38,0)) * nn * nn * 1000000)
                   | div (CAST(bb AS DECIMAL(38,0)) * n_w * n_w2) AS BIGINT)""".stripMargin)
              .as("lift_ppm"))
          .orderBy(col("lift_ppm").desc, col("pair"))
          .limit(20)
      },
      Some("""WITH w AS (SELECT string_split(text,' ') AS ws FROM documents),
             |bg AS (SELECT ws[i]||' '||ws[i+1] AS pair
             |       FROM w, UNNEST(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2),
             |uni AS (SELECT t.u AS w1, COUNT(*)::BIGINT AS n_w FROM w, UNNEST(ws) AS t(u) GROUP BY 1),
             |tot AS (SELECT (SELECT COUNT(*) FROM bg) AS bb, (SELECT SUM(n_w) FROM uni) AS nn),
             |bi AS (SELECT pair, COUNT(*)::BIGINT AS n_ab,
             |       string_split(pair,' ')[1] AS w1, string_split(pair,' ')[2] AS w2
             |       FROM bg GROUP BY 1 HAVING COUNT(*) >= 5)
             |SELECT bi.pair, bi.n_ab, a.n_w AS n_a, b.n_w AS n_b,
             |((CAST(bi.n_ab AS HUGEINT) * t.nn * t.nn * 1000000)
             |  // (CAST(t.bb AS HUGEINT) * a.n_w * b.n_w))::BIGINT AS lift_ppm
             |FROM bi JOIN uni a ON bi.w1 = a.w1 JOIN uni b ON bi.w2 = b.w1 CROSS JOIN tot t
             |ORDER BY lift_ppm DESC, pair LIMIT 20""".stripMargin)
    ),
    Q(
      "text_classifier_train",
      // DISTRIBUTED CLASSIFIER TRAINING — the stage that PRODUCES the
      // artifact text_classifier_gate consumes: logistic regression by
      // full-batch gradient descent, learned entirely in DataFrame
      // aggregations, in the distillation shape modern pipelines use
      // (FineWeb-Edu: an LLM judge labels a slice, a cheap linear
      // scorer is trained to imitate it corpus-wide). Here the teacher
      // label is a held-out property (n_chars ≥ 280 — "judge says
      // long-form"; the student never sees n_chars) and the student
      // must recover it from stopword-ratio / lexical-diversity /
      // word-count features — the eval arm pins that it DID (w_lenx
      // learns strongly positive, confusion counts ~99% accurate), so
      // the op demonstrably trains rather than just iterating.
      //
      // Scale posture: each of the 10 iterations is ONE map-side-
      // combined pass over the persisted feature frame (gradient = Σ
      // per-doc contributions, reduced to 4 longs; the model rides
      // back as broadcast literals), so an iteration over 100 TB costs
      // one cached-scan + a 4-long reduction — no corpus shuffle, no
      // driver-side rows.
      //
      // Exactness (why a LEARNED model can hash-verify cross-engine):
      //   - rational sigmoid σ(z) = 0.5 + 0.5·z/(1+|z|) — only
      //     +,*,/,abs, each IEEE-exact and bit-identical in any engine
      //     (libm exp() differs in final ulps across engines and would
      //     break the hash);
      //   - per-row gradient contributions QUANTIZE to integers
      //     (floor(g·1e6) as BIGINT) before summing, so the reduction
      //     is exact integer arithmetic and accumulation ORDER cannot
      //     leak into the model — the DECIMAL(38,4) money-sum trick,
      //     applied to learned state;
      //   - weight updates replay the identical left-associated double
      //     expression on both engines (w − lr·(g/1e6)/n).
      (s, dir) => {
        val lr = 8.0
        val iters = 10
        val d = Fan.out(Tables(s, dir).documents.select("n_chars", "text"))
        val f = GraftCache.register {
          val nw = greatest(size(ws(col("text"))), lit(1)).cast("double")
          d.withColumn("nw", nw)
            .withColumn("y", when(col("n_chars") >= 280L, 1.0).otherwise(0.0))
            .withColumn("stopr", stopHits(ws(col("text"))).cast("double") / col("nw"))
            .withColumn("dwr",
              size(array_distinct(ws(col("text")))).cast("double") / col("nw"))
            .withColumn("lenx", col("nw") / lit(100.0))
            .select("y", "stopr", "dwr", "lenx")
            .persist()
        }
        val n = f.count().toDouble
        var w = Array(0.0, 0.0, 0.0, 0.0) // bias, stopr, dwr, lenx
        def zOf(a: Array[Double]) =
          lit(a(0)) + lit(a(1)) * col("stopr") + lit(a(2)) * col("dwr") +
            lit(a(3)) * col("lenx")
        for (_ <- 1 to iters) {
          val z = zOf(w)
          val e = (lit(0.5) + (lit(0.5) * z) / (lit(1.0) + abs(z))) - col("y")
          def q(c: org.apache.spark.sql.Column) =
            sum(floor(c * lit(1000000.0)).cast("long"))
          val g = f.agg(q(e), q(e * col("stopr")), q(e * col("dwr")),
            q(e * col("lenx"))).collect()(0)
          w = Array.tabulate(4)(j => w(j) - lr * (g.getLong(j) / 1000000.0) / n)
        }
        val zf = zOf(w)
        val ev = f.agg(
          sum(when(zf > 0.0 && col("y") === 1.0, 1L).otherwise(0L)).as("tp"),
          sum(when(zf > 0.0 && col("y") === 0.0, 1L).otherwise(0L)).as("fp"),
          sum(when(!(zf > 0.0) && col("y") === 1.0, 1L).otherwise(0L)).as("fn"),
          sum(when(!(zf > 0.0) && col("y") === 0.0, 1L).otherwise(0L)).as("tn")
        ).collect()(0)
        // the teacher must be RECOVERED, not approximately memorized:
        // the learned gate separates with ≥90% accuracy or the op fails
        require((ev.getLong(0) + ev.getLong(3)).toDouble / n >= 0.9,
          s"distilled gate must separate the teacher label (tp=${ev.getLong(0)} " +
            s"fp=${ev.getLong(1)} fn=${ev.getLong(2)} tn=${ev.getLong(3)})")
        val rows = Seq(
          ("n", n), ("w0", w(0)), ("w1_stopr", w(1)), ("w2_dwr", w(2)),
          ("w3_lenx", w(3)),
          ("tp", ev.getLong(0).toDouble), ("fp", ev.getLong(1).toDouble),
          ("fn", ev.getLong(2).toDouble), ("tn", ev.getLong(3).toDouble))
        import s.implicits._
        rows.toDF("metric", "value").orderBy("metric")
      },
      Some {
        // the oracle unrolls the identical 10 GD iterations as CTEs:
        // up0 = zero weights, itK = the quantized gradient sums under
        // up(K-1)'s weights, upK = the double-exact update. Every CTE
        // is MATERIALIZED: upK references up(K-1) twice (through itK
        // and directly), so default inlining would re-expand the whole
        // chain 2^10 times
        val zE = "u.a0 + u.a1*f.stopr + u.a2*f.dwr + u.a3*f.lenx"
        def it(k: Int): String =
          s"""it$k AS MATERIALIZED (SELECT
             |    SUM(floor((e)*1000000.0)::BIGINT) AS g0,
             |    SUM(floor(((e)*stopr)*1000000.0)::BIGINT) AS g1,
             |    SUM(floor(((e)*dwr)*1000000.0)::BIGINT) AS g2,
             |    SUM(floor(((e)*lenx)*1000000.0)::BIGINT) AS g3
             |  FROM (SELECT f.y, f.stopr, f.dwr, f.lenx,
             |    (0.5 + (0.5*($zE))/(1.0 + abs($zE))) - f.y AS e
             |    FROM f, up${k - 1} u)),
             |up$k AS MATERIALIZED (SELECT u.n,
             |    u.a0 - 8.0*(i.g0/1000000.0)/u.n AS a0, u.a1 - 8.0*(i.g1/1000000.0)/u.n AS a1,
             |    u.a2 - 8.0*(i.g2/1000000.0)/u.n AS a2, u.a3 - 8.0*(i.g3/1000000.0)/u.n AS a3
             |  FROM up${k - 1} u, it$k i)""".stripMargin
        s"""WITH f0 AS (SELECT
           |    CASE WHEN n_chars >= 280 THEN 1.0 ELSE 0.0 END AS y,
           |    GREATEST(len(string_split(text,' ')), 1)::DOUBLE AS nw,
           |    len([w for w in string_split(text,' ') if w IN $StopwordsSql])::DOUBLE AS stop,
           |    len(list_distinct(string_split(text,' ')))::DOUBLE AS dw
           |  FROM documents),
           |f AS MATERIALIZED (SELECT y, stop / nw AS stopr, dw / nw AS dwr, nw / 100.0 AS lenx FROM f0),
           |up0 AS MATERIALIZED (SELECT (SELECT COUNT(*)::DOUBLE FROM f) AS n,
           |    0.0 AS a0, 0.0 AS a1, 0.0 AS a2, 0.0 AS a3),
           |${(1 to 10).map(it).mkString(",\n")},
           |ev AS (SELECT
           |    SUM(CASE WHEN z > 0.0 AND y = 1.0 THEN 1 ELSE 0 END)::BIGINT AS tp,
           |    SUM(CASE WHEN z > 0.0 AND y = 0.0 THEN 1 ELSE 0 END)::BIGINT AS fp,
           |    SUM(CASE WHEN NOT (z > 0.0) AND y = 1.0 THEN 1 ELSE 0 END)::BIGINT AS fn,
           |    SUM(CASE WHEN NOT (z > 0.0) AND y = 0.0 THEN 1 ELSE 0 END)::BIGINT AS tn
           |  FROM (SELECT f.y, $zE AS z FROM f, up10 u))
           |SELECT 'fn' AS metric, fn::DOUBLE AS value FROM ev
           |UNION ALL SELECT 'fp', fp::DOUBLE FROM ev
           |UNION ALL SELECT 'n', n FROM up10
           |UNION ALL SELECT 'tn', tn::DOUBLE FROM ev
           |UNION ALL SELECT 'tp', tp::DOUBLE FROM ev
           |UNION ALL SELECT 'w0', a0 FROM up10
           |UNION ALL SELECT 'w1_stopr', a1 FROM up10
           |UNION ALL SELECT 'w2_dwr', a2 FROM up10
           |UNION ALL SELECT 'w3_lenx', a3 FROM up10
           |ORDER BY metric""".stripMargin
      }
    )
  )
}
