package graft.tools

import graft.{GraftCache, GraftSession, SparkEntry}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SURVEY §5 scale-stress for the round-5 document/vector operators
  * (the dedup/ANN family got this in round 3, ingestion in round 4):
  * replicate the sf0.1 documents and embeddings tables 10× with
  * PERTURBED copies — each replica appends a replica tag to the text
  * (so exact digests and phash samples differ; duplication density
  * stays proportional, not quadratic) and offsets vec_ids (queries
  * stay the fixed vec_id<10 sample) — then time each op at 1× vs 10×.
  *
  *   sbt "runMain graft.tools.DocStress"        # both scales
  *   sbt "runMain graft.tools.DocStress 10x"    # stress scale only
  *
  * Same hygiene as IngestStress: the replicated input is built in a
  * scratch dir and atomically renamed so an interrupted build can't be
  * silently benched, and the base dir honors SPARK_GRAFT_SF_DIR.
  */
object DocStress {

  private val Ops = Seq(
    "dedup_exact", // the single-shuffle baseline for comparison
    "dedup_url",
    "dedup_bloom_incremental",
    "mm_phash_dedup",
    "ann_recall_report",
    // round-5 wave 2/3 document ops (documents-only inputs, so they
    // run unchanged against the replicated stress dir)
    "text_dedup_lines",
    "text_domain_balance",
    "dedup_cdc_chunks",
    "dedup_containment",
    "pipe_incremental_refresh",
    // round-6: inverted-index keyword search (documents-only input)
    "text_keyword_search",
    // round-6 wave 2: documents/embeddings-only ops
    "ann_hybrid_rrf",
    "rel_surrogate_key",
    "dedup_cross_source",
    "mm_audio_energy",
    "src_binaryfile", // 10x = 50k small files: listing + stage cost is the measurement
    "stream_curation_gate",
    // round-8: the composed IVF-PQ index — per run it builds the whole
    // index (centroids, residuals, codebooks, codes) over the replicated
    // embeddings and then queries it, so the 10x row measures index
    // BUILD scaling, the production-relevant axis
    "ann_ivf_pq",
    // round-10 wave: documents/embeddings-only ops — text_bm25 and
    // text_perplexity_bigram scale the inverted-index / LM-scoring
    // shapes, ann_index_persist measures index build+write+reopen+serve
    // (the serving round trip), mm_silence_trim the decoder-seam scan
    "text_bm25",
    "text_perplexity_bigram",
    "text_dsir",
    "ann_index_persist",
    "ann_cell_stats",
    "mm_silence_trim",
    // round-11 wave: the incremental index probe (the seen index stays
    // replica-0-sized while the batch replicates — the realistic day-2
    // shape), the cascade attribution, dictionary-sized BPE training +
    // slice-trained application, the 3-geometry LSH tuning curve, and
    // the PQ-shortlist exact re-rank
    "dedup_lsh_incremental",
    "pipe_dedup_cascade",
    "text_bpe_train",
    "text_bpe_apply",
    "dedup_lsh_tuning",
    "ann_rerank_exact",
    // round-14 wave: the graph index — per run it builds the whole kNN
    // graph over the replicated embeddings and beam-searches it, so
    // the 10x row measures the quadratic BUILD stage's scaling (the
    // axis the sample-bound caps at 100 TB)
    "ann_hnsw")

  /** The r7 verdict's 100x arm: the dedup flagships whose candidate-
    * generation machinery (LSH banding, PPJoin prefix filter, shared-
    * shingle df cap) is the 100 TB load-bearing part — measured on a
    * curve, not a point, so super-linear candidate blowup is visible. */
  private val Flagship = Seq(
    "dedup_exact", // single-shuffle baseline: the linear reference line
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "pipe_end_to_end")

  /** The widest adversarial near-dup family this harness has measured:
    * the 100x arm replicates every base doc into a k-member family, so
    * this IS the flood width the candidate caps were proven against
    * (NOTES_r8: 24.7M output pairs, candidate mass bounded). The
    * admitted worst case of the ngram prefix filter is
    * C(ShingleDfCap, 2) pairs per shared shingle — Round12Spec pins
    * ShingleDfCap <= this width, so a future cap raise past the
    * largest measured flood fails a spec instead of silently admitting
    * an unmeasured quadratic regime. */
  private[graft] val MaxMeasuredFamilyWidth = 100

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(label: String)(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"DOC_STRESS $label%-34s $dt%8.2f s")
    dt
  }

  /** Constant-plan k-times replication (crossJoin against range(k),
    * like GraphStress — NOT a k-leaf union tree): replica i appends
    * " r<i>" to the text (replica 0 untouched) and offsets doc_ids /
    * vec_ids by i*10^6, so exact digests and shingle tails differ and
    * duplication density stays proportional, never quadratic. */
  private def buildScaled(
      spark: org.apache.spark.sql.SparkSession,
      base: String,
      k: Int,
      name: String): String = {
    val tmp = System.getProperty("java.io.tmpdir")
    val out = new java.io.File(s"$tmp/$name")
    if (!new java.io.File(out, "documents.parquet").exists()) {
      val scratch = new java.io.File(s"$tmp/${name}_building")
      if (scratch.exists()) org.apache.commons.io.FileUtils.deleteDirectory(scratch)
      if (out.exists()) org.apache.commons.io.FileUtils.deleteDirectory(out)
      val reps = spark.range(k).select(col("id").as("rep"))
      val d = spark.read.parquet(s"$base/documents.parquet").crossJoin(reps)
      val text = when(col("rep") === 0, col("text"))
        .otherwise(concat(col("text"), lit(" r"), col("rep")))
      d.select(
        (col("doc_id") + col("rep") * 1000000L).as("doc_id"),
        text.as("text"),
        col("lang"),
        col("source"),
        length(text).cast("long").as("n_chars"))
        .write.mode("overwrite").parquet(s"$scratch/documents.parquet")
      spark.read.parquet(s"$base/embeddings.parquet")
        .crossJoin(reps)
        .select(
          (col("vec_id") + col("rep") * 1000000L).as("vec_id"),
          transform(col("embedding"), x => x + col("rep").cast("float") / lit(1000f)).as("embedding"),
          col("label"))
        .write.mode("overwrite").parquet(s"$scratch/embeddings.parquet")
      if (!scratch.renameTo(out)) sys.error(s"rename $scratch -> $out failed")
    }
    out.getAbsolutePath
  }

  /** The LSH candidate-mass curve at a scale: pairs generated inside
    * capped band buckets (Σ bw·(bw−1)/2 over bw ≤ cap) + the dropped
    * hot-bucket mass — the same arithmetic dedup_lsh_cap_report oracles
    * over the SAME bandsFrom plan the operator runs. */
  private def lshCandidateMass(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): (Long, Long, Long) = {
    import graft.dedup.DedupCatalog
    val cap = DedupCatalog.MaxBucketWidth
    val row = DedupCatalog
      .bandsFrom(DedupCatalog.shingleDfFrom(graft.Tables(spark, dir).documents))
      .groupBy("lang", "band", "bucket")
      .agg(count(lit(1)).as("bw"))
      .select(
        sum(when(col("bw") <= cap, expr("bw * (bw - 1) div 2")).otherwise(0L)).as("cand"),
        sum(when(col("bw") > cap, 1L).otherwise(0L)).as("hot"),
        sum(when(col("bw") > cap, col("bw")).otherwise(0L)).as("dropped"))
      .head()
    (row.getLong(0), row.getLong(1), row.getLong(2))
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = System.getProperty("java.io.tmpdir")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val stress = new java.io.File(s"$tmp/graft_stress_docs")
    if (!new java.io.File(stress, "documents.parquet").exists()) {
      val scratch = new java.io.File(s"$tmp/graft_stress_docs_building")
      if (scratch.exists()) org.apache.commons.io.FileUtils.deleteDirectory(scratch)
      if (stress.exists()) org.apache.commons.io.FileUtils.deleteDirectory(stress)
      val d = spark.read.parquet(s"$base/documents.parquet")
      (0 until 10)
        .map(i =>
          d.select(
            (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
            (if (i == 0) col("text") else concat(col("text"), lit(s" r$i"))).as("text"),
            col("lang"),
            col("source"),
            length(if (i == 0) col("text") else concat(col("text"), lit(s" r$i"))).cast("long").as("n_chars")))
        .reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$scratch/documents.parquet")
      val e = spark.read.parquet(s"$base/embeddings.parquet")
      (0 until 10)
        .map(i =>
          e.select(
            (col("vec_id") + lit(i * 1000000L)).as("vec_id"),
            (if (i == 0) col("embedding")
             else transform(col("embedding"), x => x + lit(i.toFloat / 1000f))).as("embedding"),
            col("label")))
        .reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$scratch/embeddings.parquet")
      if (!scratch.renameTo(stress)) sys.error(s"rename $scratch -> $stress failed")
    }

    def runAll(dir: String, tag: String): Unit =
      Ops.foreach { op =>
        time(s"${op}_$tag") { force(SparkEntry.queries(op)(spark, dir)) }
        GraftCache.clear()
      }

    force(SparkEntry.entry(spark)) // JIT/classloading warmup

    if (args.contains("100x")) {
      // flagship curve: 1x -> 10x -> 100x (500k docs), with the LSH
      // candidate mass recorded per scale alongside wall time
      var d100: String = null
      time("build_100x_dir") {
        d100 = buildScaled(spark, base, MaxMeasuredFamilyWidth, "graft_stress_docs100")
      }
      // extra args select specific ops and/or scales for resumed runs —
      // any registered documents/embeddings query can ride the 100x dir,
      // not just the dedup flagships
      val picked = args.filter(a => Flagship.contains(a) || Ops.contains(a)).toSet
      val ops = if (picked.isEmpty) Flagship else (Flagship ++ Ops).distinct.filter(picked)
      val tags = args.filter(Set("1x", "10x", "100x")).toSet
      // full curve (no op picked) runs all scales; a resumed run with
      // picked ops runs only the explicitly listed scale tags
      val dirs = Seq((base, "1x"), (stress.getAbsolutePath, "10x"), (d100, "100x"))
        .filter { case (_, t) => picked.isEmpty || tags(t) }
      for ((dir, tag) <- dirs) {
        if (picked.isEmpty) {
          val (cand, hot, dropped) = lshCandidateMass(spark, dir)
          println(s"DOC_STRESS lsh_cand_mass_$tag pairs=$cand hot_buckets=$hot dropped_rows=$dropped")
          GraftCache.clear()
        }
        ops.foreach { op =>
          time(s"${op}_$tag") { force(SparkEntry.queries(op)(spark, dir)) }
          GraftCache.clear()
        }
      }
    } else {
      if (!args.contains("10x")) runAll(base, "1x")
      runAll(stress.getAbsolutePath, "10x")
    }
    spark.stop()
  }
}
