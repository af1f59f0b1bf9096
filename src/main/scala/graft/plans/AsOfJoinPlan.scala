package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator custom Catalyst surface for the backward as-of join —
  * the (c) rung of the build charter's preference ladder: a logical node,
  * a planner strategy, and a dedicated physical operator, registered via
  * [[GraftExtensions]] (or self-registered through
  * `DatasetBridge.ensureStrategy`).
  *
  * Semantically identical to the composed window formulation
  * ([[graft.operators.AsOfJoin.backward]], which stays the default and is
  * DuckDB-oracle-matched); the exec expresses the same mechanics
  * natively: co-partition both sides on the keys, sort each partition by
  * (keys, ts) — right side additionally by the payload for the
  * deterministic greatest-tuple tie-break — then ONE streaming merge pass
  * per partition with O(1) carried state (the latest right row), instead
  * of the union + window's combined sort of both inputs.
  *
  * Measured at sf0.1 events (20k matches): composed 0.26 s vs exec
  * 0.46 s warm p50 — the window path wins at this scale because sort +
  * window are whole-stage-codegen'd while this merge loop is interpreted
  * (per-row UnsafeProjection calls). The exec's edge is asymptotic, not
  * constant-factor: O(1) carried state vs the window's
  * last(ignoreNulls) scan, and no union-then-sort of both inputs. q46
  * keeps it under the DuckDB ASOF oracle; q42 stays on the composed
  * form. */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, payload) =>
      AsOfJoinExec(lk, rk, lts, rts, payload, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Per-partition merge as-of join. EnsureRequirements supplies the
  * exchanges (ClusteredDistribution on the keys for BOTH children → one
  * co-partitioned shuffle each) and the sorts (requiredChildOrdering), so
  * the operator itself is a narrow zip of sorted partitions. */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute, payload: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTs +: payload)).map(SortOrder(_, Ascending)))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyAttrs = leftKeys
    val rKeyAttrs = rightKeys
    val lTsA = leftTs
    val rTsA = rightTs
    val payloadAttrs = payload
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (keys, ts) projections drive the merge order; key-only projections
      // validate the candidate's group; payload is carried pre-projected.
      val lFullProj = UnsafeProjection.create(lKeyAttrs :+ lTsA, lOut)
      val rFullProj = UnsafeProjection.create(rKeyAttrs :+ rTsA, rOut)
      val lKeyProj = UnsafeProjection.create(lKeyAttrs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyAttrs, rOut)
      val payloadProj = UnsafeProjection.create(payloadAttrs, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val fullOrd = RowOrdering.createNaturalAscendingOrdering((lKeyAttrs :+ lTsA).map(_.dataType))
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyAttrs.map(_.dataType))
      val nullPayload = new GenericInternalRow(payloadAttrs.size)
      val joined = new JoinedRow
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var candKey: UnsafeRow = null
      var candPayload: UnsafeRow = null
      lIter.map { lRow =>
        val lFull = lFullProj(lRow)
        // consume every right row at-or-before (keys, ts); sort order
        // guarantees the last one consumed in the left row's key group is
        // the match (greatest ts, then greatest payload tuple on ties)
        while (rHead != null && fullOrd.compare(rFullProj(rHead), lFull) <= 0) {
          candKey = rKeyProj(rHead).copy()
          candPayload = payloadProj(rHead).copy()
          rHead = if (rIter.hasNext) rIter.next() else null
        }
        val matched = candKey != null && keyOrd.compare(candKey, lKeyProj(lRow)) == 0
        resultProj(joined(lRow, if (matched) candPayload else nullPayload))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
