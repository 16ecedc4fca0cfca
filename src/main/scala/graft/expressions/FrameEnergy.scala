package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native framed-energy kernel: payload -> array<long> of per-frame
  * energies Σ(sample − center)², frames of stride max(len/frames, 1),
  * trailing sub-frame dropped — exactly mm_audio_energy's loudness
  * contour (MultimodalCatalog), which the reference family computes
  * per-sample over decoded PCM.
  *
  * Replaces the interpreted higher-order chain
  * `aggregate(sequence(off+1, off+stride), 0L, (acc,i) ->
  *  acc + (ascii(substring(text, i, 1)) - 64)^2)` — Spark evaluates
  * lambda bodies per element on the interpreted path (per sample: a
  * lambda frame, a 1-char UTF8String slice, an ascii() eval); this is
  * one flat loop over the payload bytes with zero per-sample
  * allocation. Samples are the UTF-8 BYTES of the payload (the 8-bit
  * PCM reading); for the pure-ASCII corpus bytes == character codes,
  * so it is bit-identical to the HOF form and the DuckDB unicode()
  * oracle (equivalence spec-asserted on the real corpus, and the
  * codegen path is asserted resident like the other graft kernels).
  */
case class FrameEnergy(child: Expression, frames: Int, center: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_frame_energy"

  override def nullSafeEval(input: Any): Any =
    FrameEnergy.compute(input.asInstanceOf[UTF8String], frames, center)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.expressions.FrameEnergy.compute($c, $frames, $center);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FrameEnergy {

  def compute(text: UTF8String, frames: Int, center: Int): ArrayData = {
    val b = text.getBytes
    val n = b.length
    val stride = math.max(n / frames, 1)
    // frames k with k*stride < n: all `frames` when n >= frames, else n
    val k = math.min(frames.toLong, (n + stride - 1L) / stride).toInt
    val out = new Array[Long](math.max(k, 0))
    var f = 0
    while (f < out.length) {
      val off = f * stride
      var acc = 0L
      var i = off
      val end = off + stride
      while (i < end) {
        val d = (b(i) & 0xff).toLong - center
        acc += d * d
        i += 1
      }
      out(f) = acc
      f += 1
    }
    new GenericArrayData(out)
  }
}
