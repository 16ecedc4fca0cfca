package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint: given the collect_list'd
  * array<struct<pos:int, h:string>> of per-shingle hashes, produce the
  * sorted-distinct sliding-window-w minima — the document fingerprint
  * (Schleimer et al. winnowing, minus the per-window position tie-break,
  * matching the oracle's list_sort(list_distinct([list_min(h[i:i+w-1])])) ).
  *
  * Replaces a 4-deep interpreted higher-order-function chain
  * (array_sort(collect_list(struct)) rebuild + transform/sequence/
  * slice/array_min sliding windows) that was the worst bench line at
  * 20.9 s/sf0.1: every element bounced through HigherOrderFunction
  * lambda boxing. Here the whole pipeline after the aggregate is ONE
  * flat loop over the array — evaluated via a static call that stays
  * inside the WholeStageCodegen span (the DotQ pattern,
  * expressions/DotQ.scala).
  *
  * Ordering note: UTF8String binary comparison over lowercase-hex md5
  * digests is identical to DuckDB's default varchar collation on the
  * same strings, so min/sort results are engine-portable.
  */
case class WinnowFingerprint(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == IntegerType && b.dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<struct<int,string>>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(input.asInstanceOf[ArrayData], w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.expressions.WinnowFingerprint.compute($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprint {

  /** One pass: order hashes by pos, slide a w-window min, collect the
    * distinct minima sorted. O(n log n) for the pos sort + O(n·w)
    * comparisons; n = shingles per document. */
  def compute(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val pos = new Array[Int](n)
    val hs = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      pos(i) = row.getInt(0)
      hs(i) = row.getUTF8String(1)
      i += 1
    }
    // sort hashes by claim position (positions are distinct)
    val order = (0 until n).toArray.sortBy(pos)
    val sortedH = order.map(hs)
    val out = new java.util.TreeSet[UTF8String]()
    i = 0
    while (i <= n - w) {
      var m = sortedH(i)
      var j = 1
      while (j < w) {
        if (sortedH(i + j).compareTo(m) < 0) m = sortedH(i + j)
        j += 1
      }
      out.add(m)
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())).asInstanceOf[Array[Any]])
  }
}
