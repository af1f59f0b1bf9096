package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

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
  * Row multiset is preserved exactly — including NULLs. In the original,
  * a row with a NULL group key or NULL metric matches no peer (the join
  * condition evaluates to NULL), survives the left join unmatched, and
  * passes the IS NULL filter; a naive rank()-window rewrite would drop
  * such rows (NULL keys partition together, NULL metrics sort last). The
  * rewrite therefore filters on
  *
  *   (any key IS NULL) OR metric IS NULL OR metric = max(metric) OVER w
  *
  * where max() skips NULLs — for non-null keys and metrics this is the
  * per-group argmax with ties, and the escape disjuncts reproduce the
  * theta-join's keep-NULLs behavior bit-for-bit. Output schema is
  * preserved: right-side columns are re-emitted as typed nulls under
  * their original exprIds (they are all-null after the IS NULL filter by
  * construction — a kept row matched no peer).
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

    // max(m) OVER (PARTITION BY keys) — whole-partition frame, no sort
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing)
    val maxExpr = WindowExpression(
      aggregate.AggregateExpression(aggregate.Max(m), aggregate.Complete, isDistinct = false),
      WindowSpecDefinition(eqKeys.toSeq, Nil, frame))
    val maxAlias = Alias(maxExpr, "__argmax_max")()
    val window = Window(Seq(maxAlias), eqKeys.toSeq, Nil, left)
    // keep: NULL key or NULL metric (theta-join never matches those rows)
    // or per-group maximum (ties included — rank()=1 semantics)
    val keep = (eqKeys.map(IsNull(_): Expression) :+ IsNull(m))
      .foldRight(EqualTo(m, maxAlias.toAttribute): Expression)(Or)
    val filtered = Filter(keep, window)
    // preserve the original output: left columns + right columns as nulls
    val rightNulls = rOut.map(a => Alias(Literal(null, a.dataType), a.name)(a.exprId))
    Some(Project(lOut ++ rightNulls, filtered))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }
}
