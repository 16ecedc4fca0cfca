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
    "stream_curation_gate")

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(label: String)(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"DOC_STRESS $label%-34s $dt%8.2f s")
    dt
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

    if (!args.contains("10x")) runAll(base, "1x")
    runAll(stress.getAbsolutePath, "10x")
    spark.stop()
  }
}
