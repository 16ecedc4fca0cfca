package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word k-grams: array<string> of words -> array<string> of
  * space-joined k-grams (positional when distinct=false; first-occurrence
  * set when distinct=true — matching DuckDB list_distinct order).
  *
  * Replaces the interpreted when/transform/sequence/slice/concat_ws
  * chain (TextFunctions.shinglesInterpreted): the shingle build sits on
  * EVERY dedup/fingerprint path (MinHash, n-gram Jaccard, winnowing)
  * and was their dominant narrow-stage cost — per element the HOF chain
  * allocates a lambda frame, a slice copy, and a concat builder, where
  * this is one flat loop per document. Codegen-resident via the static
  * call (the DotQ pattern).
  *
  * Mirrors the oracle SQL exactly:
  *   [array_to_string(ws[i:i+k-1],' ') for i in range(1, len(ws)-k+2)]
  * (+ list_distinct when distinct) — both produce nothing for docs
  * shorter than k words.
  */
case class ShingleK(child: Expression, k: Int, distinct: Boolean) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingle"

  override def nullSafeEval(input: Any): Any =
    ShingleK.compute(input.asInstanceOf[ArrayData], k, distinct)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.expressions.ShingleK.compute($c, $k, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleK {

  private val Sep = UTF8String.fromString(" ")

  def compute(arr: ArrayData, k: Int, distinct: Boolean): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val words = new Array[UTF8String](n)
    var i = 0
    while (i < n) { words(i) = arr.getUTF8String(i); i += 1 }
    val out = new java.util.ArrayList[AnyRef](n - k + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    val parts = new Array[UTF8String](k)
    i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { parts(j) = words(i + j); j += 1 }
      val sgl = UTF8String.concatWs(Sep, parts: _*)
      if (seen == null || seen.add(sgl)) out.add(sgl)
      i += 1
    }
    new GenericArrayData(out.toArray())
  }
}
