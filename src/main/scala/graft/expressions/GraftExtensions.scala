package graft.expressions

import graft.wikidata.IdCodec
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.Bridge

/** The engine's SQL surface: native + codec functions, injectable two
  * ways —
  *   - spark.sql.extensions=graft.expressions.GraftExtensions (config),
  *   - GraftExtensions.register(spark) at runtime (idempotent; used by
  *     the catalogs so any session works).
  *
  * graft_dotq(a, b)        native codegen dot product (DotQ)
  * graft_id_to_u32(id)     Wikidata id string -> dense u32 (IdCodec)
  * graft_qid_from_uri(u)   entity URI / "1" -> Qid or null
  * graft_time_micros(y,m,d,h,mi,s)  proleptic epoch micros, BC-capable
  * graft_frame_energy(payload)  native framed-energy kernel (FrameEnergy)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
  }
}

object GraftExtensions {

  private def fromColumnFn(name: String, arity: Int)(
      f: Seq[Column] => Column): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (
      FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      (exprs: Seq[Expression]) => {
        require(exprs.length == arity, s"$name expects $arity arguments")
        Bridge.expressionEager(f(exprs.map(Bridge.column)))
      })

  private[graft] val descriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("graft_dotq"),
      new ExpressionInfo(classOf[DotQ].getName, "graft_dotq"),
      (exprs: Seq[Expression]) => DotQ(exprs(0), exprs(1))),
    (
      FunctionIdentifier("graft_cdc_boundaries"),
      new ExpressionInfo(classOf[CdcBoundaries].getName, "graft_cdc_boundaries"),
      (exprs: Seq[Expression]) => CdcBoundaries(exprs.head, window = 8, mod = 64)),
    (
      FunctionIdentifier("graft_frame_energy"),
      new ExpressionInfo(classOf[FrameEnergy].getName, "graft_frame_energy"),
      (exprs: Seq[Expression]) => FrameEnergy(exprs.head, frames = 8, center = 64)),
    fromColumnFn("graft_id_to_u32", 1)(cols => IdCodec.idToU32(cols.head)),
    fromColumnFn("graft_qid_from_uri", 1)(cols => IdCodec.qidFromUri(cols.head)),
    // proleptic-Gregorian epoch micros from civil parts — BIGINT-exact,
    // BC-capable where the TIMESTAMP type is not (TimeEpoch)
    fromColumnFn("graft_time_micros", 6)(cols =>
      graft.wikidata.TimeEpoch.micros(cols(0), cols(1), cols(2), cols(3), cols(4), cols(5)))
  )

  /** Idempotent runtime registration for sessions not built with the
    * extensions config. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(ident)) {
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
      }
    }
}
