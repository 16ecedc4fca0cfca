package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoders}

/** The decode seam for multimodal payloads.
  *
  * In production this is where a codec runs per partition (the Scala
  * analog of mapInPandas): batch the blobs, hand them to a native
  * decoder, emit features. The container ships no codecs, so decode()
  * is a DETERMINISTIC FAKE — it derives pseudo-features from the bytes
  * themselves. The mapPartitions plumbing (typed encoders, per-partition
  * batching, output schema) is the real, tested part.
  */
object StubDecoder {

  final case class Blob(doc_id: Long, bytes: Array[Byte])
  final case class Decoded(doc_id: Long, n_bytes: Int, mean_byte: Double, edge_score: Double)

  /** STUB: stands in for a real image/audio decoder. Deterministic in
    * the input bytes; replace with a codec call per partition. */
  def decodeOne(b: Blob): Decoded = {
    val n = b.bytes.length
    val mean = if (n == 0) 0.0 else b.bytes.map(_ & 0xff).sum.toDouble / n
    val edges =
      if (n < 2) 0.0
      else b.bytes.sliding(2).count(p => math.abs((p(0) & 0xff) - (p(1) & 0xff)) > 16).toDouble / (n - 1)
    Decoded(b.doc_id, n, mean, edges)
  }

  def decode(blobs: Dataset[Blob]): Dataset[Decoded] = {
    implicit val enc = Encoders.product[Decoded]
    blobs.mapPartitions(_.map(decodeOne))
  }
}
