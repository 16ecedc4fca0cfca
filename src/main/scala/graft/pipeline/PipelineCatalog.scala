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
  private[graft] val qualityGateSql =
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
    ),
    Q(
      "pipe_incremental_refresh",
      // Day-2 operations pipeline: a NEW CRAWL BATCH lands against a
      // 100 TB seen corpus and must be triaged, not recomputed —
      //   exact dedup vs seen (digest anti-join; production prefilters
      //   with the dedup_bloom_incremental filter so the join touches
      //   only bloom-positives) -> quality gate -> CONTAINMENT near-dup
      //   vs seen (df-capped shared-shingle candidates + exact
      //   intersect, the dedup_containment operator) -> triage report:
      //   exact re-crawls, quality drops, UPDATES of seen documents,
      //   genuinely new documents.
      // The batch is built deterministically from the corpus so every
      // category is populated: ids %5 re-crawled verbatim (exact), ids
      // %7 with three appended words (near-dup updates), ids %11
      // word-REVERSED (3-grams destroyed -> genuinely new).
      //
      // Scale posture: everything is keyed by digest or shingle —
      // seen-side work is one digest set + one capped shingle explode
      // (both reusable across daily batches as materialized state);
      // batch-side work scales with the batch, not the corpus. The
      // containment verify touches candidates only.
      (s, dir) => {
        val docs = Tables(s, dir).documents.select("doc_id", "text")
        val recrawl = docs
          .filter(pmod(col("doc_id"), lit(5)) === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
        val update = docs
          .filter(pmod(col("doc_id"), lit(5)) =!= 0 && pmod(col("doc_id"), lit(7)) === 0)
          .select(
            (col("doc_id") + 2000000L).as("doc_id"),
            concat(col("text"), lit(" version two revised")).as("text"))
        val fresh = docs
          .filter(pmod(col("doc_id"), lit(5)) =!= 0 && pmod(col("doc_id"), lit(7)) =!= 0 &&
            pmod(col("doc_id"), lit(11)) === 0)
          .select(
            (col("doc_id") + 2000000L).as("doc_id"),
            array_join(reverse(ws(col("text"))), " ").as("text"))
        val batch = recrawl.unionByName(update).unionByName(fresh)
        val seenKeys = docs.select(md5(col("text").cast("binary")).as("key")).distinct()
        val flagged = graft.GraftCache.register(
          batch
            .withColumn("key", md5(col("text").cast("binary")))
            .join(seenKeys.withColumn("seen", lit(1L)), Seq("key"), "left")
            .withColumn("is_exact", col("seen").isNotNull)
            .withColumn("quality_ok", size(ws(col("text"))) >= 30)
            .persist())
        val candDocs = flagged.filter(!col("is_exact") && col("quality_ok")).select("doc_id", "text")
        val bsh = candDocs
          .select(col("doc_id"), shingleSet(col("text"), 3).as("s"))
          .withColumn("na", size(col("s")).cast("long"))
          .filter(col("na") > 0)
        val ssh = graft.GraftCache.register(
          Fan
            .out(docs)
            .select(col("doc_id").as("sid"), shingleSet(col("text"), 3).as("ss"))
            .filter(size(col("ss")) > 0)
            .persist())
        val sex = ssh.select(col("sid"), explode(col("ss")).as("g"))
        // one seen-side DF pass serves BOTH the cap (df <= 50) and its
        // complement (the hot set the prefilter needs) — r18
        val gdf = graft.GraftCache.truncate(
          sex.groupBy("g").agg(count(lit(1)).as("df")))
        val keepG = gdf.filter(col("df") <= 50).select("g")
        val hotG = gdf.filter(col("df") > 50).select("g")
        val bex = bsh.select(col("doc_id"), explode(col("s")).as("g"))
        // count-based prefilter, LOSSLESS for the final predicate (the
        // dedup_containment bound, r18): a batch shingle missing from
        // keepG is either absent from EVERY seen doc (cannot intersect)
        // or df-capped (counted by nhot), so
        //   |s ∩ ss| <= shk + nhot  and containment >= 0.8 requires
        //   shk >= ceil(0.8*na) - nhot.
        // The expensive array-intersect verify then touches only pairs
        // that can still qualify, instead of every shared-shingle pair.
        val nhot = bex
          .join(hotG.hint("shuffle_hash"), "g")
          .groupBy("doc_id").agg(count(lit(1)).as("nhot"))
        val cand = bex
          .join(sex.join(keepG.hint("shuffle_merge"), "g"), "g")
          .groupBy("doc_id", "sid").agg(count(lit(1)).as("shk"))
          .join(bsh.select("doc_id", "na"), "doc_id")
          .join(nhot.hint("shuffle_hash"), Seq("doc_id"), "left")
          .filter(col("shk") >= expr("(4*na+4) div 5") - coalesce(col("nhot"), lit(0L)))
          .select("doc_id", "sid")
        val upd = cand
          .join(bsh.select("doc_id", "s", "na"), "doc_id")
          .join(ssh, "sid")
          .filter(size(array_intersect(col("s"), col("ss"))).cast("double") / col("na") >= 0.8)
          .select("doc_id")
          .distinct()
          .withColumn("is_update", lit(1L))
        flagged
          .join(broadcast(upd), Seq("doc_id"), "left")
          .agg(
            count(lit(1)).as("n_batch"),
            sum(when(col("is_exact"), 1L).otherwise(0L)).as("n_exact_dup"),
            sum(when(!col("is_exact") && !col("quality_ok"), 1L).otherwise(0L)).as("n_quality_drop"),
            sum(when(!col("is_exact") && col("quality_ok") && col("is_update").isNotNull, 1L)
              .otherwise(0L)).as("n_update"),
            sum(when(!col("is_exact") && col("quality_ok") && col("is_update").isNull, 1L)
              .otherwise(0L)).as("n_new"))
      },
      Some("""WITH docs AS (SELECT doc_id, text FROM documents),
             |batch AS (
             |  SELECT doc_id + 2000000 AS doc_id, text FROM docs WHERE doc_id % 5 = 0
             |  UNION ALL SELECT doc_id + 2000000, text || ' version two revised' FROM docs
             |    WHERE doc_id % 5 <> 0 AND doc_id % 7 = 0
             |  UNION ALL SELECT doc_id + 2000000, array_to_string(list_reverse(string_split(text,' ')),' ')
             |    FROM docs WHERE doc_id % 5 <> 0 AND doc_id % 7 <> 0 AND doc_id % 11 = 0),
             |sk AS (SELECT DISTINCT md5(text) AS key FROM docs),
             |fl AS (SELECT b.doc_id, b.text, (sk.key IS NOT NULL) AS is_exact,
             |       len(string_split(b.text,' ')) >= 30 AS quality_ok
             |       FROM batch b LEFT JOIN sk ON md5(b.text) = sk.key),
             |cd AS (SELECT doc_id, text FROM fl WHERE NOT is_exact AND quality_ok),
             |bsh AS (SELECT doc_id,
             |        list_distinct([array_to_string(ws[i:i+2],' ') for i in range(1, len(ws)-1)]) AS s
             |        FROM (SELECT doc_id, string_split(text,' ') AS ws FROM cd) WHERE len(ws) >= 3),
             |bsn AS (SELECT doc_id, s, len(s)::BIGINT AS na FROM bsh WHERE len(s) > 0),
             |ssh AS (SELECT doc_id AS sid,
             |        list_distinct([array_to_string(ws[i:i+2],' ') for i in range(1, len(ws)-1)]) AS ss
             |        FROM (SELECT doc_id, string_split(text,' ') AS ws FROM docs) WHERE len(ws) >= 3),
             |ssn AS (SELECT sid, ss FROM ssh WHERE len(ss) > 0),
             |sex AS (SELECT sid, gg AS g FROM ssn, UNNEST(ss) AS t(gg)),
             |keepg AS (SELECT g FROM sex GROUP BY g HAVING COUNT(*) <= 50),
             |sexk AS (SELECT sex.sid, sex.g FROM sex JOIN keepg USING (g)),
             |bex AS (SELECT doc_id, gg AS g FROM bsn, UNNEST(s) AS t(gg)),
             |cand AS (SELECT DISTINCT b.doc_id, s.sid FROM bex b JOIN sexk s USING (g)),
             |upd AS (SELECT DISTINCT c.doc_id FROM cand c
             |        JOIN bsn ON c.doc_id = bsn.doc_id JOIN ssn ON c.sid = ssn.sid
             |        WHERE len(list_intersect(bsn.s, ssn.ss))::DOUBLE / bsn.na >= 0.8)
             |SELECT COUNT(*)::BIGINT AS n_batch,
             |SUM(CASE WHEN is_exact THEN 1 ELSE 0 END)::BIGINT AS n_exact_dup,
             |SUM(CASE WHEN NOT is_exact AND NOT quality_ok THEN 1 ELSE 0 END)::BIGINT AS n_quality_drop,
             |SUM(CASE WHEN NOT is_exact AND quality_ok AND u.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_update,
             |SUM(CASE WHEN NOT is_exact AND quality_ok AND u.doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_new
             |FROM fl LEFT JOIN upd u ON fl.doc_id = u.doc_id""".stripMargin)
    ),
    Q(
      "pipe_data_card",
      // The corpus DATASHEET ("Datasheets for Datasets", Gebru et al.
      // 2021): the per-source one-pager every training-data release
      // ships — volume (docs, tokens, languages), duplication rate, and
      // quality-pass rate, all as exact integer ppm/milli so the card
      // itself is hash-verifiable. Reuses the production stages
      // verbatim (Pipeline.qualityFilter's exact-integer gate,
      // Pipeline.exactDropIds' digest keep-list), so the card reports
      // what the pipeline would actually do, not a parallel estimate.
      //
      // Scale posture: one digest-keyed shuffle (the exact-dup
      // keep-list), narrow quality signals, then a source-keyed rollup
      // of flags — the card costs one corpus pass plus a
      // sources-sized aggregate, and every column is map-side
      // combinable.
      (s, dir) => {
        val docs = Fan.out(
          Tables(s, dir).documents.select("doc_id", "source", "lang", "text"))
        val qIds = Pipeline.qualityFilter(docs).select(col("doc_id"), lit(1L).as("is_q"))
        val dupIds = Pipeline.exactDropIds(docs).select(col("doc_id"), lit(1L).as("is_dup"))
        docs
          .withColumn("nw", size(ws(col("text"))).cast("long"))
          .join(qIds, Seq("doc_id"), "left_outer")
          .join(dupIds, Seq("doc_id"), "left_outer")
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("nw")).as("n_tokens"),
            countDistinct(col("lang")).as("n_langs"),
            sum(coalesce(col("is_dup"), lit(0L))).as("n_dup"),
            sum(coalesce(col("is_q"), lit(0L))).as("n_quality"))
          .selectExpr(
            "source",
            "n_docs",
            "n_tokens",
            "n_langs",
            "n_dup * 1000000 div n_docs AS dup_ppm",
            "n_quality * 1000000 div n_docs AS quality_pass_ppm",
            "n_tokens * 1000 div n_docs AS mean_tokens_milli")
          .orderBy("source")
      },
      Some(s"""WITH d AS (SELECT doc_id, source, lang, text FROM documents),
             |qm AS (SELECT doc_id,
             |  len(string_split(text,' '))::BIGINT AS nw,
             |  length(text)::BIGINT AS len,
             |  (length(text)-length(regexp_replace(text,'[a-z]','','g')))::BIGINT AS alpha,
             |  len([w for w in string_split(text,' ') if w IN $StopwordsSql])::BIGINT AS stop
             |  FROM d),
             |q AS (SELECT doc_id FROM qm WHERE $qualityGateSql),
             |ex AS (SELECT doc_id FROM
             |       (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM d)
             |       WHERE doc_id <> keep_id),
             |fl AS (SELECT d.doc_id, d.source, d.lang, qm.nw,
             |       CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup,
             |       CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_q
             |       FROM d JOIN qm USING (doc_id)
             |       LEFT JOIN ex ON d.doc_id = ex.doc_id
             |       LEFT JOIN q ON d.doc_id = q.doc_id)
             |SELECT source, COUNT(*)::BIGINT AS n_docs, SUM(nw)::BIGINT AS n_tokens,
             |COUNT(DISTINCT lang)::BIGINT AS n_langs,
             |((SUM(is_dup) * 1000000) // COUNT(*))::BIGINT AS dup_ppm,
             |((SUM(is_q) * 1000000) // COUNT(*))::BIGINT AS quality_pass_ppm,
             |((SUM(nw) * 1000) // COUNT(*))::BIGINT AS mean_tokens_milli
             |FROM fl GROUP BY source ORDER BY source""".stripMargin)
    ),
    Q(
      "pipe_dedup_cascade",
      // Onion-dedup ATTRIBUTION — per-document, the FIRST stage of the
      // ordered cascade (exact digest → near-dup cluster → quality
      // gate) that would drop it, or `kept`. The data card reports
      // aggregate rates per source; this is the row-level provenance a
      // curation team audits ("why did doc X disappear?") and the
      // ordering matters: an exact duplicate that is ALSO low-quality
      // is attributed to the dedup stage that actually fires first, so
      // stage-level drop counts sum to the true pipeline loss instead
      // of double-counting. Every stage reuses the production
      // operators verbatim (Pipeline.exactDropIds / nearDupDropIds /
      // qualityFilter), so `kept` here IS Pipeline.curate's keep set —
      // spec-asserted.
      //
      // Scale posture: three id-list left joins onto the corpus — the
      // exact list shuffles on doc_id (can be a large fraction), the
      // near-dup list is broadcast (clusters are rare), the quality
      // flags ride the same scan; verdict is pure columnar CASE.
      (s, dir) => {
        val docs = Fan
          .out(Tables(s, dir).documents)
          .select("doc_id", "source", "lang", "text")
        val ex = Pipeline.exactDropIds(docs).select(col("doc_id"), lit(1L).as("is_ex"))
        val nd = Pipeline.nearDupDropIds(docs).select(col("doc_id"), lit(1L).as("is_nd"))
        val q = Pipeline.qualityFilter(docs).select(col("doc_id"), lit(1L).as("is_q"))
        docs
          .select("doc_id", "source")
          .join(ex, Seq("doc_id"), "left")
          .join(broadcast(nd), Seq("doc_id"), "left")
          .join(q, Seq("doc_id"), "left")
          .withColumn(
            "verdict",
            when(col("is_ex") === 1L, "exact_dup")
              .when(col("is_nd") === 1L, "near_dup")
              .when(col("is_q").isNull, "low_quality")
              .otherwise("kept"))
          .select("doc_id", "source", "verdict")
          .orderBy("doc_id")
      },
      Some("WITH " + DedupCatalog.minhashPairsCtesFrom("documents") +
        DedupCatalog.clusterAssignSqlTail +
        s""",
           |d AS (SELECT doc_id, source, text FROM documents),
           |qm AS (SELECT doc_id,
           |  len(string_split(text,' '))::BIGINT AS nw,
           |  length(text)::BIGINT AS len,
           |  (length(text)-length(regexp_replace(text,'[a-z]','','g')))::BIGINT AS alpha,
           |  len([w for w in string_split(text,' ') if w IN $StopwordsSql])::BIGINT AS stop
           |  FROM d),
           |q AS (SELECT doc_id FROM qm WHERE $qualityGateSql),
           |ex AS (SELECT doc_id FROM
           |       (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id FROM d)
           |       WHERE doc_id <> keep_id),
           |nd AS (SELECT x AS doc_id FROM r2 WHERE rep_id <> x)
           |SELECT d.doc_id, d.source,
           |  CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
           |       WHEN nd.doc_id IS NOT NULL THEN 'near_dup'
           |       WHEN q.doc_id IS NULL THEN 'low_quality'
           |       ELSE 'kept' END AS verdict
           |FROM d LEFT JOIN ex ON d.doc_id = ex.doc_id
           |LEFT JOIN nd ON d.doc_id = nd.doc_id
           |LEFT JOIN q ON d.doc_id = q.doc_id
           |ORDER BY d.doc_id""".stripMargin)
    ),
    Q(
      "pipe_drift_monitor",
      // Ingestion DRIFT detection — the data-quality alarm between a
      // reference batch (doc_id < 250) and the incoming one: word-count
      // distributions as 10 equal-width histograms over the REFERENCE's
      // [min,max] (new-batch outliers clamp into the edge buckets —
      // mass migrating to bucket 0/9 is itself the drift signal), and
      // the L1 distance between the two ppm profiles (2e6 × total
      // variation) as the alert number a monitor thresholds. All exact
      // integers, so the whole report hash-verifies.
      //
      // Scale posture: two map-side-combined histogram aggregations
      // (one per batch) against a broadcast 1-row min/max; the spine,
      // totals and L1 all ride structural-size broadcasts. One scan of
      // each batch, no shuffle wider than 10 buckets.
      (s, dir) => {
        val docs = Fan
          .out(Tables(s, dir).documents)
          .select(col("doc_id"), size(ws(col("text"))).cast("long").as("nw"))
        val ref = docs.filter(col("doc_id") < 250)
        val neu = docs.filter(col("doc_id") >= 250)
        val stats = ref.agg(min(col("nw")).as("mn"), max(col("nw")).as("mx"))
        def counted(df: org.apache.spark.sql.DataFrame, out: String) = df
          .crossJoin(broadcast(stats))
          .select(
            greatest(
              lit(0L),
              least(lit(9L), expr("(nw - mn) * 10 div (mx - mn + 1)"))).as("bucket"))
          .groupBy("bucket")
          .agg(count(lit(1)).as(out))
        val spine = s.range(10).select(col("id").as("bucket"))
        val joined = spine
          .join(counted(ref, "n_ref"), Seq("bucket"), "left")
          .join(counted(neu, "n_new"), Seq("bucket"), "left")
          .select(
            col("bucket"),
            coalesce(col("n_ref"), lit(0L)).as("n_ref"),
            coalesce(col("n_new"), lit(0L)).as("n_new"))
        val tot = joined.agg(sum(col("n_ref")).as("t_ref"), sum(col("n_new")).as("t_new"))
        val ppm = joined
          .crossJoin(broadcast(tot))
          .selectExpr(
            "bucket",
            "n_ref",
            "n_new",
            "n_ref * 1000000 div greatest(t_ref, 1) AS ref_ppm",
            "n_new * 1000000 div greatest(t_new, 1) AS new_ppm")
        val l1 = ppm.agg(sum(abs(col("ref_ppm") - col("new_ppm"))).as("l1_ppm"))
        ppm.crossJoin(broadcast(l1)).orderBy("bucket")
      },
      Some("""WITH d AS (SELECT doc_id, len(string_split(text,' '))::BIGINT AS nw FROM documents),
             |ref AS (SELECT * FROM d WHERE doc_id < 250),
             |neu AS (SELECT * FROM d WHERE doc_id >= 250),
             |st AS (SELECT MIN(nw) AS mn, MAX(nw) AS mx FROM ref),
             |rb AS (SELECT greatest(0, least(9, ((nw - mn) * 10) // (mx - mn + 1))) AS bucket
             |       FROM ref, st),
             |nb AS (SELECT greatest(0, least(9, ((nw - mn) * 10) // (mx - mn + 1))) AS bucket
             |       FROM neu, st),
             |rc AS (SELECT bucket, COUNT(*)::BIGINT AS n_ref FROM rb GROUP BY 1),
             |nc AS (SELECT bucket, COUNT(*)::BIGINT AS n_new FROM nb GROUP BY 1),
             |sp AS (SELECT b AS bucket FROM UNNEST(range(10)) AS t(b)),
             |j AS (SELECT sp.bucket, COALESCE(n_ref, 0) AS n_ref, COALESCE(n_new, 0) AS n_new
             |      FROM sp LEFT JOIN rc ON sp.bucket = rc.bucket
             |      LEFT JOIN nc ON sp.bucket = nc.bucket),
             |tt AS (SELECT SUM(n_ref)::BIGINT AS t_ref, SUM(n_new)::BIGINT AS t_new FROM j),
             |pp AS (SELECT bucket, n_ref, n_new,
             |       (n_ref * 1000000) // greatest(t_ref, 1) AS ref_ppm,
             |       (n_new * 1000000) // greatest(t_new, 1) AS new_ppm FROM j, tt),
             |l1 AS (SELECT SUM(abs(ref_ppm - new_ppm))::BIGINT AS l1_ppm FROM pp)
             |SELECT bucket, n_ref, n_new, ref_ppm, new_ppm, l1_ppm FROM pp, l1
             |ORDER BY bucket""".stripMargin)
    ),
    Q(
      "pipe_rule_ablation",
      // The quality-rule TUNING table (the per-rule ablation every
      // filter-threshold review starts from): for each Gopher rule,
      // how many documents fail it at all (n_fail), how many it is the
      // SOLE veto for (n_sole_veto — the documents you would regain by
      // dropping just this rule), and the corpus keep rate WITHOUT it
      // (keep_without_ppm — the marginal effect of the rule given all
      // the others). A rule with high n_fail but near-zero sole vetoes
      // is redundant; one with high sole vetoes carries real filtering
      // weight and deserves threshold scrutiny. Reuses
      // TextCatalog.gopherRuleFrame VERBATIM, so the ablation can
      // never drift from the rule set it ablates.
      //
      // Scale posture: one narrow rule pass, a constant 4x explode
      // (rules, not data), one map-side-combined rollup to 4 rows.
      (s, dir) => {
        val rules = Seq("rule_wc", "rule_wlen", "rule_alpha", "rule_stop")
        val r = graft.text.TextCatalog.gopherRuleFrame(
          Fan.out(Tables(s, dir).documents.select("doc_id", "text")))
        r.select(explode(array(rules.map { rn =>
            struct(
              lit(rn).as("rule"),
              col(rn).as("ok"),
              rules.filterNot(_ == rn).map(col).reduce(_ && _).as("others_ok"))
          }: _*)).as("x"))
          .select(col("x.rule").as("rule"), col("x.ok").as("ok"), col("x.others_ok").as("others_ok"))
          .groupBy("rule")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(!col("ok"), 1L).otherwise(0L)).as("n_fail"),
            sum(when(!col("ok") && col("others_ok"), 1L).otherwise(0L)).as("n_sole_veto"),
            sum(when(col("others_ok"), 1L).otherwise(0L)).as("n_keep_without"))
          .withColumn("keep_without_ppm", expr("n_keep_without * 1000000 div n_docs"))
          .select("rule", "n_docs", "n_fail", "n_sole_veto", "keep_without_ppm")
          .orderBy("rule")
      },
      Some(s"""WITH ${graft.text.TextCatalog.gopherRulesSql},
             |x AS (SELECT 'rule_wc' AS rule, rule_wc AS ok,
             |             (rule_wlen AND rule_alpha AND rule_stop) AS others_ok FROM r
             |      UNION ALL SELECT 'rule_wlen', rule_wlen,
             |             (rule_wc AND rule_alpha AND rule_stop) FROM r
             |      UNION ALL SELECT 'rule_alpha', rule_alpha,
             |             (rule_wc AND rule_wlen AND rule_stop) FROM r
             |      UNION ALL SELECT 'rule_stop', rule_stop,
             |             (rule_wc AND rule_wlen AND rule_alpha) FROM r)
             |SELECT rule, COUNT(*)::BIGINT AS n_docs,
             |SUM(CASE WHEN NOT ok THEN 1 ELSE 0 END)::BIGINT AS n_fail,
             |SUM(CASE WHEN NOT ok AND others_ok THEN 1 ELSE 0 END)::BIGINT AS n_sole_veto,
             |((SUM(CASE WHEN others_ok THEN 1 ELSE 0 END) * 1000000) // COUNT(*))::BIGINT
             |  AS keep_without_ppm
             |FROM x GROUP BY rule ORDER BY rule""".stripMargin)
    ),
    Q(
      "pipe_token_budget",
      // Quality-ranked selection under a TOKEN BUDGET — the final cut
      // every pretraining run makes ("we can afford 2T tokens; take the
      // best documents until the budget is spent"): rank by a quality
      // score, keep the ranked prefix whose running token total fits
      // the budget (here 20% of the corpus). The running total is a
      // DISTRIBUTED prefix sum — NOT one global window (a
      // single-partition running sum is the classic driver-shaped
      // bottleneck at 100 TB): documents land in ~100 score buckets, a
      // buckets-sized frame (structurally ≤ 101 rows, broadcast) carries
      // each bucket's tokens-above prefix, and the per-row running sum
      // windows only WITHIN a bucket. The cut is exact: cum ≤ budget,
      // ties broken by doc_id, identical in the oracle's plain global
      // window formulation.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val scored = Fan
          .out(Tables(s, dir).documents.select("doc_id", "source", "text"))
          .withColumn("nw", size(ws(col("text"))).cast("long"))
          .withColumn("stop", stopHits(ws(col("text"))).cast("long"))
          .withColumn("score_ppm", expr("stop * 1000000 div nw"))
          .select("doc_id", "source", "nw", "score_ppm")
        val bkt = scored.withColumn("bucket", expr("score_ppm div 10000"))
        val btot = bkt.groupBy("bucket").agg(sum("nw").as("btok"))
        // prefix over the BUCKETS frame only — ≤101 rows by construction,
        // so the unpartitioned window is a constant-size reduction, not a
        // data-sized serial scan
        val bpre = btot.withColumn(
          "pre",
          coalesce(
            sum("btok").over(
              Window
                .orderBy(col("bucket").desc)
                .rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
        val budget = scored.agg(expr("sum(nw) div 5").as("budget"))
        val w = Window
          .partitionBy("bucket")
          .orderBy(col("score_ppm").desc, col("doc_id"))
        bkt
          .join(broadcast(bpre), "bucket")
          .withColumn("cum_tokens", col("pre") + sum("nw").over(w))
          .crossJoin(broadcast(budget))
          .filter(col("cum_tokens") <= col("budget"))
          .select("doc_id", "source", "nw", "score_ppm", "cum_tokens")
          .orderBy(col("score_ppm").desc, col("doc_id"))
      },
      Some(s"""WITH d AS (SELECT doc_id, source,
             |       len(string_split(text,' '))::BIGINT AS nw,
             |       len([w for w in string_split(text,' ') if w IN $StopwordsSql])::BIGINT AS stop
             |       FROM documents),
             |s AS (SELECT doc_id, source, nw, (stop * 1000000 // nw)::BIGINT AS score_ppm FROM d),
             |b AS (SELECT (SUM(nw) // 5)::BIGINT AS budget FROM s),
             |c AS (SELECT *, SUM(nw) OVER (ORDER BY score_ppm DESC, doc_id
             |      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens FROM s)
             |SELECT doc_id, source, nw, score_ppm, cum_tokens FROM c, b
             |WHERE cum_tokens <= budget ORDER BY score_ppm DESC, doc_id""".stripMargin)
    ),
    Q(
      "pipe_wap_curation",
      // The curation pipeline LANDING through write-audit-publish —
      // how a training-data team actually ships a daily intake against
      // a production corpus table: yesterday's admitted docs are the
      // base snapshot; today's batch runs the SHARED Gopher gate
      // (TextCatalog.gopherRuleFrame — one rule definition across the
      // report, the ablation, and this intake) and lands on a BRANCH,
      // invisible to trainers reading main; the AUDIT stage then
      // checks the staged data itself (quality floor re-verified, no
      // doc_id collision against the base — both loud requires, the
      // WAP contract that bad intakes never reach main); only then
      // does the fast-forward publish make the batch visible, as
      // mode=append so incremental consumers (pipe_incremental_refresh
      // style) keep working across the intake boundary. The oracle
      // reproduces the final admitted corpus relationally — a leaked
      // reject, a lost admit, or a publish that merged the wrong
      // branch state breaks the hash.
      (s, dir) => {
        import graft.sources.SnapshotTable
        val table = graft.Stage.dir("graft_wapcur_", dir).getPath
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(table))
        val docs = Tables(s, dir).documents.select("doc_id", "text", "source")
        def admitted(m: Int) =
          graft.text.TextCatalog.gopherRuleFrame(Fan.out(docs.filter(col("doc_id") % 3 === m)))
            .filter(col("rule_wc") && col("rule_wlen") && col("rule_alpha") && col("rule_stop"))
            .select("doc_id", "source", "wc")
        SnapshotTable.commit(admitted(0), table, append = false)
        SnapshotTable.createBranch(table, "intake")
        val bp = SnapshotTable.branchPath(table, "intake")
        SnapshotTable.commit(admitted(1), bp, append = true)
        // AUDIT: verify the staged table, not the pipeline's intent
        val staged = SnapshotTable.read(s, bp)
        require(staged.filter(col("wc") < 30).isEmpty,
          "audit failed: below-floor document staged on intake branch")
        require(staged.groupBy("doc_id").count().filter(col("count") > 1).isEmpty,
          "audit failed: duplicate doc_id staged on intake branch")
        SnapshotTable.publishBranch(table, "intake")
        SnapshotTable.read(s, table)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("wc").as("total_words"))
          .orderBy("source")
      },
      Some(s"""WITH t AS (SELECT doc_id, text, source,
             |  len(string_split(text,' '))::BIGINT AS wc,
             |  length(regexp_replace(text,'[^a-z]','','g'))::BIGINT AS alpha_chars,
             |  len([w for w in string_split(text,' ') if w IN $StopwordsSql])::BIGINT AS n_stop
             |  FROM documents WHERE doc_id % 3 IN (0, 1)),
             |k AS (SELECT source, wc FROM t
             |  WHERE wc >= 30 AND wc <= 100000
             |    AND alpha_chars::DOUBLE / wc >= 3.0 AND alpha_chars::DOUBLE / wc <= 10.0
             |    AND alpha_chars::DOUBLE / length(text) > 0.6
             |    AND n_stop >= 2)
             |SELECT source, COUNT(*)::BIGINT AS n_docs, SUM(wc)::BIGINT AS total_words
             |FROM k GROUP BY 1 ORDER BY 1""".stripMargin)
    ),
    Q(
      "pipe_provenance_audit",
      // PROVENANCE-GROUPED curation audit — the composition the new
      // `_file` metadata column exists for: the corpus lives in a
      // snapshot table clustered by source (one data file per source
      // value — the SPJ/commit invariant), the Gopher gate runs over a
      // V2 read that projects `_file`, and the keep-rate report groups
      // by the FILE, not the source column — "which data files are
      // producing the rejected documents", answered without a
      // synthetic id or a lineage system. The fixture then REQUIREs
      // the provenance law itself: grouped through `_file`, every
      // group carries exactly one source (min == max), i.e. the
      // cluster invariant is VISIBLE through the metadata column; the
      // oracle recomputes the same report relationally by source, so a
      // reader that misattributed a single row to the wrong file
      // breaks the hash. At 100 TB this is the daily curation
      // triage: keep-rate per upstream shard, zero extra I/O (the
      // path is a planning-time constant), rules shared VERBATIM with
      // text_gopher_rules/pipe_rule_ablation via gopherRuleFrame.
      (s, dir) => {
        val table = graft.Stage.dir("graft_provaud_", dir).getPath
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(table))
        graft.sources.SnapshotTable.commit(
          Tables(s, dir).documents.select("doc_id", "source", "text"),
          table, append = false, clusterBy = Some("source"))
        val df = s.read.format(graft.sources.SnapshotV2Provider.format)
          .option("path", table).load()
          .select(col("doc_id"), col("source"), col("text"), col("_file"))
        val gated = graft.text.TextCatalog.gopherRuleFrame(df)
          .withColumn("keep",
            col("rule_wc") && col("rule_wlen") && col("rule_alpha") && col("rule_stop"))
        val per = gated.groupBy("_file").agg(
          min(col("source")).as("source"),
          max(col("source")).as("source_hi"),
          count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
        require(per.filter(col("source") =!= col("source_hi")).isEmpty,
          "provenance law violated: a data file of a source-clustered table " +
            "must hold exactly one source")
        per.select("source", "n_docs", "n_keep").orderBy("source")
      },
      Some(s"""WITH ${graft.text.TextCatalog.gopherRulesSql},
             |g AS (SELECT d.source,
             |        (r.rule_wc AND r.rule_wlen AND r.rule_alpha AND r.rule_stop) AS keep
             |      FROM r JOIN documents d ON r.doc_id = d.doc_id)
             |SELECT source, COUNT(*)::BIGINT AS n_docs,
             |SUM(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_keep
             |FROM g GROUP BY 1 ORDER BY 1""".stripMargin)
    )
  )
}
