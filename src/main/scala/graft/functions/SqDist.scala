package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Single-pass codegen squared L2 distance from an int-array column to a
  * constant centroid — the inner loop of the integer Lloyd fits
  * (q99/q115): every corpus row evaluates one of these per CANDIDATE
  * CENTROID per iteration, so the flat fit runs n·k·dim element steps per
  * pass. The higher-order formulation (`aggregate(zip_with(qv, lit(cv),
  * (a,b) => (a-b)*(a-b)))`) evaluates interpreted with per-element
  * boxing — measured as the dominant term of q115's small-corpus leg
  * (the k1=1 flat path: 83 s at 20k vecs, almost all of it the fit).
  * Same pattern as [[DotProductExpr]]: a tight static Java loop inside
  * WholeStageCodegen.
  *
  * Exactness: all arithmetic is integer (long accumulator; |a-b| <= 254
  * for int8-quantized components, so squares and dim-length sums are
  * overflow-free by construction) — bit-exactness vs the HOF form is
  * trivial, every intermediate is the same integer. Null/length
  * semantics mirror zip_with padding: null array → null; length mismatch
  * with the centroid → null; null element → null.
  */
object SqDistUtil {
  def sqDist(a: ArrayData, cv: Array[Long]): java.lang.Long = {
    val n = a.numElements()
    if (n != cv.length) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val d = a.getInt(i).toLong - cv(i)
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

/** Catalyst expression: squared L2 distance from an array<int> column to
  * a constant long centroid, codegen'd as one static call per row. */
case class SqDistExpr(child: Expression, centroid: Array[Long]) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_dist"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq_dist needs an array<int> input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    SqDistUtil.sqDist(input.asInstanceOf[ArrayData], centroid)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cvRef = ctx.addReferenceObj("centroid", centroid, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val boxed = ctx.freshName("sqDistResult")
      s"""
         |java.lang.Long $boxed = graft.functions.SqDistUtil.sqDist($a, $cvRef);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SqDistExpr =
    copy(child = newChild)
}

object SqDistFn {
  /** sqDist(qv, centroid): codegen Σ (qv_i − c_i)² as a long. */
  def sqDist(qv: Column, centroid: Array[Long]): Column =
    ColumnBridge.column(SqDistExpr(ColumnBridge.expression(qv), centroid))
}
