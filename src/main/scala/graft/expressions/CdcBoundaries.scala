package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined-chunking boundary finder: text -> array<int>
  * of 1-based split positions i (2 <= i <= len-7) where the hash of the
  * 8-char window starting at i hits 0 mod `mod`.
  *
  * Bit-for-bit the oracle's condition
  *   ('0x'||substr(md5(text[i:i+7]),1,8))::BIGINT % mod = 0
  * (the first 4 md5 bytes read as an unsigned 32-bit int): the digest
  * runs over the UTF-8 bytes of the CHARACTER substring, exactly like
  * Spark's md5(cast(substring(text,i,8) as binary)) and DuckDB's
  * md5(text[i:i+7]).
  *
  * Replaces dedup_cdc_chunks' interpreted HOF chain
  * (filter(transform(sequence(...), i -> CASE WHEN pmod(conv(substring(
  * md5(...)...)))) — per position that chain allocated a lambda frame,
  * a substring Column eval, a hex string, and a decimal conv; this is
  * one flat loop with one MessageDigest reused across positions. The
  * DocStress 10x run showed the per-position hash IS the operator's
  * cost (3.9x wall for 10x chars), so this loop is exactly what the
  * scaladoc promised to graduate to codegen at scale.
  */
case class CdcBoundaries(child: Expression, window: Int, mod: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_cdc_boundaries"

  override def nullSafeEval(input: Any): Any =
    CdcBoundaries.compute(input.asInstanceOf[UTF8String], window, mod)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.expressions.CdcBoundaries.compute($c, $window, $mod);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcBoundaries {

  def compute(text: UTF8String, window: Int, mod: Int): ArrayData = {
    val n = text.numChars()
    // positions 2..n-window+1 (position 1 is never a boundary: the first
    // chunk always starts there), matching sequence(2, length-window+1)
    val last = n - window + 1
    if (last < 2) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val out = new java.util.ArrayList[AnyRef]()
    var i = 2
    while (i <= last) {
      // character-based window, hashed over its UTF-8 bytes — identical
      // to md5(cast(substring(text, i, window) as binary))
      val bytes = text.substringSQL(i, window).getBytes
      md.reset()
      val d = md.digest(bytes)
      // first 4 digest bytes as an unsigned 32-bit int == the oracle's
      // ('0x' || first 8 hex chars)::BIGINT
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      if (h % mod == 0) out.add(Integer.valueOf(i))
      i += 1
    }
    new GenericArrayData(out.toArray())
  }
}
