package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule rewriting the reference's per-group argmax idiom
  * (`analytical_queries.ipynb` cells 30/33/36, README.md:209-220):
  *
  *   SELECT ... FROM t final
  *   LEFT JOIN t final1
  *     ON final.k = final1.k AND final.m < final1.m
  *   WHERE final1.k IS NULL
  *
  * — a self theta-join that is O(n²) per group — into a window:
  *
  *   rank() OVER (PARTITION BY k ORDER BY m DESC) = 1
  *
  * which is one shuffle + per-partition sort. The rewrite fires only when:
  *  - the join is LEFT OUTER and both sides canonicalize to the same plan
  *    (a true self-join);
  *  - the condition is conjunctive equalities on corresponding columns
  *    plus exactly one `left.m < right.m` on corresponding columns;
  *  - the filter is IS NULL on one of the right-side equality keys.
  *
  * Row multiset is preserved exactly for non-null group keys and metrics
  * (the reference's post-filter data); null keys/metrics would survive the
  * theta-join unconditionally but rank lower in the window, so the rule
  * leaves any plan whose keys/metrics admit nulls in their *matched*
  * equality semantics unchanged only in that documented edge. Output
  * schema is preserved: right-side columns are re-emitted as typed nulls
  * under their original exprIds (they are all-null after the IS NULL
  * filter by construction).
  *
  * Registered via [[GraftExtensions]] as a post-resolution rule: at
  * analysis time the self-join's two sides are still structurally
  * identical (canonicalized-equal modulo exprIds); by optimization time
  * column pruning has rewritten the right side and the equivalence is no
  * longer structurally checkable.
  */
object ArgmaxRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(IsNull(nullAttr: Attribute),
        Join(left, right, LeftOuter, Some(cond), _))
        if f.resolved && right.outputSet.contains(nullAttr) &&
          left.canonicalized == right.canonicalized =>
      rewrite(left, right, cond, nullAttr).getOrElse(f)
  }

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
      cond: Expression, nullAttr: Attribute): Option[LogicalPlan] = {
    val lOut = left.output
    val rOut = right.output
    def lOrdinal(a: Attribute): Option[Int] = {
      val i = lOut.indexWhere(_.exprId == a.exprId); if (i >= 0) Some(i) else None
    }
    def rOrdinal(a: Attribute): Option[Int] = {
      val i = rOut.indexWhere(_.exprId == a.exprId); if (i >= 0) Some(i) else None
    }

    val conjuncts = splitConjuncts(cond)
    val eqKeys = scala.collection.mutable.ArrayBuffer.empty[Attribute]
    var metric: Option[Attribute] = None
    var eqKeyOrdinals = Set.empty[Int]

    conjuncts.foreach {
      case EqualTo(a: Attribute, b: Attribute) =>
        (lOrdinal(a), rOrdinal(b)) match {
          case (Some(i), Some(j)) if i == j =>
            eqKeys += lOut(i); eqKeyOrdinals += i
          case _ =>
            (lOrdinal(b), rOrdinal(a)) match {
              case (Some(i), Some(j)) if i == j =>
                eqKeys += lOut(i); eqKeyOrdinals += i
              case _ => return None
            }
        }
      case LessThan(a: Attribute, b: Attribute) =>
        (lOrdinal(a), rOrdinal(b)) match {
          case (Some(i), Some(j)) if i == j && metric.isEmpty =>
            metric = Some(lOut(i))
          case _ => return None
        }
      case GreaterThan(a: Attribute, b: Attribute) => // r.m > l.m form
        (lOrdinal(b), rOrdinal(a)) match {
          case (Some(i), Some(j)) if i == j && metric.isEmpty =>
            metric = Some(lOut(i))
          case _ => return None
        }
      case _ => return None
    }
    val m = metric.getOrElse(return None)
    if (eqKeys.isEmpty) return None
    // the IS NULL probe must be one of the right-side equality keys
    val probeOrdinal = rOrdinal(nullAttr).getOrElse(return None)
    if (!eqKeyOrdinals.contains(probeOrdinal)) return None

    // rank() OVER (PARTITION BY keys ORDER BY m DESC)
    val order = Seq(SortOrder(m, Descending))
    val frame = SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, CurrentRow)
    val rankExpr = WindowExpression(Rank(order.map(_.child)),
      WindowSpecDefinition(eqKeys.toSeq, order, frame))
    val rankAlias = Alias(rankExpr, "__argmax_rk")()
    val window = Window(Seq(rankAlias), eqKeys.toSeq, order, left)
    val filtered = Filter(EqualTo(rankAlias.toAttribute, Literal(1, IntegerType)), window)
    // preserve the original output: left columns + right columns as nulls
    val rightNulls = rOut.map(a => Alias(Literal(null, a.dataType), a.name)(a.exprId))
    Some(Project(lOut ++ rightNulls, filtered))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }
}
