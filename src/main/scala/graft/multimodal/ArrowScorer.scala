package graft.multimodal

import org.apache.arrow.vector.{BigIntVector, Float4Vector, VectorLoader, VectorSchemaRoot}
import org.apache.arrow.vector.complex.ListVector
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** The MODEL side of the Arrow inference seam
  * ([[Bridge.mapArrowBatches]]): a deterministic integer scorer that
  * consumes and produces REAL Arrow IPC record batches — the exact wire
  * a CLIP/quality-classifier sidecar (Python worker, ONNX runtime,
  * Triton) would speak, so the plan shape this pins (columnar batch
  * hand-off, batch size, schema mapping, zero per-row JVM chatter) is
  * the production scoring shape with only the weights faked. The
  * "model" is exact integer arithmetic — score = Σ_i ⌊v_i·10⁶⌋·w_i with
  * w_i = (i mod 13) − 6 — so the DuckDB oracle reproduces it bit-for-bit
  * (the float-exactness recipe: quantize BEFORE summing, never sum
  * floats).
  *
  * Reference seam: wd2duckdb consumes parsed values in-process
  * (value.rs:60-350); a 100 TB multimodal pipeline cannot — model
  * scoring lives behind a columnar IPC boundary, which is what this
  * stands in for. */
object ArrowScorer extends Serializable {

  val inSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  val outSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("score", LongType, nullable = false)))

  /** Exact integer score of one vector (0-based element index). */
  def scoreOf(v: Float, i: Int): Long =
    math.floor(v.toDouble * 1000000.0).toLong * ((i % 13) - 6)

  /** Batch-in, batch-out — one output IPC batch per input batch. */
  def score(batches: Iterator[Array[Byte]]): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private val alloc = Bridge.arrowAllocator("graft-arrow-scorer")
      private val inRoot = VectorSchemaRoot.create(Bridge.arrowSchema(inSchema), alloc)
      private val outRoot = VectorSchemaRoot.create(Bridge.arrowSchema(outSchema), alloc)
      private val loader = new VectorLoader(inRoot)
      private var closed = false

      override def hasNext: Boolean = {
        val h = batches.hasNext
        if (!h && !closed) { // deterministic release at exhaustion
          closed = true
          inRoot.close(); outRoot.close(); alloc.close()
        }
        h
      }

      override def next(): Array[Byte] = {
        val b = Bridge.arrowLoadBatch(batches.next(), alloc)
        try loader.load(b) finally b.close()
        val n = inRoot.getRowCount
        val ids = inRoot.getVector("vec_id").asInstanceOf[BigIntVector]
        val emb = inRoot.getVector("embedding").asInstanceOf[ListVector]
        val data = emb.getDataVector.asInstanceOf[Float4Vector]
        val outIds = outRoot.getVector("vec_id").asInstanceOf[BigIntVector]
        val outScores = outRoot.getVector("score").asInstanceOf[BigIntVector]
        outRoot.allocateNew()
        var r = 0
        while (r < n) {
          var s = 0L
          val from = emb.getElementStartIndex(r)
          val to = emb.getElementEndIndex(r)
          var j = from
          while (j < to) {
            if (!data.isNull(j)) s += scoreOf(data.get(j), j - from)
            j += 1
          }
          outIds.setSafe(r, ids.get(r))
          outScores.setSafe(r, s)
          r += 1
        }
        outRoot.setRowCount(n)
        Bridge.arrowWriteBatch(outRoot)
      }
    }
}
