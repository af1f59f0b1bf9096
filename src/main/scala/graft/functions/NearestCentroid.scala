package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Nearest-centroid argmin over a per-cell centroid family — the
  * assignment step of the two-level Lloyd fit (q115's fine level).
  *
  * The pure-Column formulation builds `array_min(CASE ccid WHEN ...
  * array(struct(sq_dist(qv, c), fid), ...))` with one literal struct per
  * centroid: at gen30 scale that is k1·k2 ≈ 484 sq_dist sub-expressions
  * in ONE projection — the generated `processNext()` blows janino's
  * method limits, whole-stage codegen FAILS, and Spark silently falls
  * back to interpreted evaluation for the hottest map of the fit
  * (observed in the g30 scale session logs). This expression carries the
  * whole centroid table as one plan reference and evaluates the argmin
  * in a tight loop behind a static call — constant-size generated code
  * at any k.
  *
  * Exactness contract (mirrors the Column form bit-for-bit):
  *  - distances are the same integer arithmetic as [[SqDistExpr]];
  *  - the winner is the lexicographic struct-min on (dist, fid): the
  *    loop iterates fids in ascending order keeping STRICT minima, which
  *    is exactly array_min's smallest-(dist, fid) element;
  *  - a ccid with no centroid family → null (the CASE's no-match arm);
  *    null qv → null; a length-mismatched centroid → null (the old
  *    sq_dist-null struct would have poisoned array_min's comparison —
  *    impossible on fixed-dim corpora, nulled explicitly here). */
object NearestCentroidUtil {
  /** cents: fid-ascending (fid, centroid) per cell. Returns
    * struct(dist, fid) or null. */
  def nearest(ccid: Int, qv: ArrayData,
      cents: Map[Int, Array[(Int, Array[Long])]]): InternalRow = {
    val family = cents.getOrElse(ccid, null)
    if (family == null) return null
    var bestDist = Long.MaxValue
    var bestFid = -1
    var found = false
    var j = 0
    while (j < family.length) {
      val (fid, cv) = family(j)
      val n = qv.numElements()
      if (n != cv.length) return null
      var acc = 0L
      var i = 0
      while (i < n) {
        if (qv.isNullAt(i)) return null
        val d = qv.getInt(i).toLong - cv(i)
        acc += d * d
        i += 1
      }
      if (!found || acc < bestDist) { bestDist = acc; bestFid = fid; found = true }
      j += 1
    }
    if (!found) null
    else new GenericInternalRow(Array[Any](bestDist, bestFid))
  }
}

/** Catalyst expression: struct(dist, fid) of the nearest centroid in the
  * row's own cell, codegen'd as one static call per row. */
case class NearestCentroidExpr(left: Expression, right: Expression,
    cents: Map[Int, Array[(Int, Array[Long])]]) extends BinaryExpression {
  // left = ccid (int), right = qv (array<int>)
  override def dataType: DataType = StructType(Seq(
    StructField("dist", LongType), StructField("fid", IntegerType)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (IntegerType, ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid needs (int ccid, array<int> qv), got $l and $r")
  }

  override protected def nullSafeEval(ccid: Any, qv: Any): Any =
    NearestCentroidUtil.nearest(ccid.asInstanceOf[Int],
      qv.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "scala.collection.immutable.Map")
    nullSafeCodeGen(ctx, ev, (c, q) => {
      val row = ctx.freshName("nearestRow")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $row =
         |  graft.functions.NearestCentroidUtil.nearest($c, $q,
         |    (scala.collection.immutable.Map) $centsRef);
         |if ($row == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $row;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidExpr =
    copy(left = newLeft, right = newRight)
}

object NearestCentroidFn {
  /** nearestCentroid(ccid, qv): struct(dist, fid) of the per-cell argmin
    * (fid-ascending tie-break, identical to array_min over
    * struct(dist, fid) literals). */
  def nearestCentroid(ccid: Column, qv: Column,
      cents: Map[Int, Array[(Int, Array[Long])]]): Column =
    ColumnBridge.column(NearestCentroidExpr(
      ColumnBridge.expression(ccid), ColumnBridge.expression(qv), cents))
}
