package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Rewrites the canonical per-group top-k idiom
  *
  *   Project[cols w/o rn](Filter(rn <= k, Window(row_number() as rn,
  *     partitionBy p, orderBy o, child)))
  *
  * into the bounded-heap operator:
  *
  *   Project[cols](TopKPerGroupNode(p, o, k, child))
  *
  * The rewrite fires only when the rank column is projected away (its
  * value is re-derivable but unused) and the predicate is a plain
  * rn <= k / rn < k on the row_number output — conservative by design:
  * any other shape keeps Spark's window plan. Injected via
  * GraftExtensions (injectOptimizerRule) or
  * spark.experimental.extraOptimizations.
  *
  * Tie behavior: when the window ordering is not total, row_number
  * breaks ties arbitrarily, and the heap operator may pick a DIFFERENT
  * (equally valid) row set at the k boundary than Spark's sort-based
  * plan. That is within row_number's contract but is an observable
  * change for third-party queries, so the session-wide rewrite can be
  * disabled with `spark.graft.topkRewrite.enabled=false` (default
  * true).
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.topkRewrite.enabled"

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "true").toBoolean

  private object RankLimit {
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) => Some((a, k))
      case LessThan(a: Attribute, Literal(k: Int, _)) => Some((a, k - 1))
      case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) => Some((a, k))
      case GreaterThan(Literal(k: Int, _), a: Attribute) => Some((a, k - 1))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan else plan.transformUp {
    case p @ Project(
          projectList,
          Filter(
            RankLimit(rnAttr, k),
            Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)), parts, orders, child, _)))
        if k > 0 && rnAttr.semanticEquals(alias.toAttribute) &&
          !projectList.exists(_.references.contains(alias.toAttribute)) &&
          projectList.forall(_.references.subsetOf(child.outputSet)) =>
      // Spark's InferWindowGroupLimit may already have slid a
      // WindowGroupLimit (sort-based rank pre-limiter) under the Window
      // — the heap operator subsumes it, so unwrap to its child.
      val source = child match {
        case wgl: WindowGroupLimit => wgl.child
        case c => c
      }
      Project(projectList, TopKPerGroupNode(parts, orders, k, source))
  }
}
