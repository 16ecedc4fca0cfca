package graft.multimodal

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 multimodal columns — opaque binary payloads with typed
  * metadata. The container has no image/audio codecs, so DECODING is a
  * clearly-marked deterministic stub (see StubDecoder); everything
  * Spark-side — the binary column, metadata extraction, frame-sample
  * plan shape, partitioning — is real and tested.
  *
  * Blobs are synthesized from the documents table (text bytes as the
  * payload) so results are deterministic and reproducible at every
  * scale factor. rows-only: DuckDB-portable binary semantics are not
  * worth pinning; MultimodalSpec asserts shape + determinism.
  */
object MultimodalCatalog extends QueryModule {

  def queries: Seq[Q] = Seq(
    Q(
      "mm_metadata",
      (s, dir) =>
        Tables(s, dir).documents
          .withColumn("blob", col("text").cast("binary"))
          .select(
            col("doc_id"),
            length(col("blob")).cast("long").as("blob_len"),
            hex(substring(col("blob"), 1, 4)).as("magic_hex"),
            md5(col("blob")).as("checksum"),
            // "parsed header" fields — deterministic fake dimensions
            (pmod(col("doc_id"), lit(64)) * 16 + 16).cast("int").as("width"),
            (pmod(col("doc_id"), lit(48)) * 16 + 16).cast("int").as("height"),
            (crc32(col("blob")) % 256).cast("int").as("brightness"))
          .orderBy("doc_id"),
      None
    ),
    Q(
      "mm_framesample",
      (s, dir) => {
        // Deterministic frame sampling: split each blob into 4 equal
        // strides, emit (frame_idx, byte_offset, frame digest). The plan
        // is narrow (posexplode of a per-row sequence) — no shuffle.
        val d = Tables(s, dir).documents
          .withColumn("blob", col("text").cast("binary"))
          .withColumn("stride", greatest(expr("length(blob) div 4"), lit(1)))
        d.select(
          col("doc_id"),
          col("blob"),
          col("stride"),
          posexplode(sequence(lit(0), lit(3))))
          .withColumn("byte_offset", col("pos") * col("stride"))
          .select(
            col("doc_id"),
            col("pos").as("frame_idx"),
            col("byte_offset").cast("long").as("byte_offset"),
            md5(expr("substring(blob, byte_offset + 1, stride)")).as("frame_md5"))
          .orderBy("doc_id", "frame_idx")
      },
      None
    )
  )
}
