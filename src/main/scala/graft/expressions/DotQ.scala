package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native exact dot product over 1e-6-quantized vectors (array<bigint>)
  * — the codegen'd hot-loop replacement for the interpreted
  * zip_with/aggregate pair in VectorFunctions.dotQ. Participates in
  * whole-stage codegen via doGenCode: the pairwise scoring loops in
  * dedup_embedding / ann_* stay inside a single generated function
  * instead of boxing through HigherOrderFunction lambdas per element.
  *
  * Semantics identical to dotQ (same oracle mirror). A null element in
  * either array nulls the result (matching the interpreted fold);
  * length mismatch truncates to the shorter side.
  */
case class DotQ(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dotq"

  /** A null ELEMENT nulls the whole dot (matching the interpreted
    * zip_with/aggregate mirror, where null * y -> null poisons the
    * fold) — graft_dotq is a registered SQL function, so misuse with
    * null-bearing arrays must not silently sum to a wrong value. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("sum")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  $s += $a.getLong($i) * $b.getLong($i);
           |}
           |${ev.value} = $s;
           |""".stripMargin
      })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
