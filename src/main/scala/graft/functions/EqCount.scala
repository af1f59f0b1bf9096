package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen count of equal components between two long arrays — the
  * MinHash signature-agreement loop ([[graft.operators.Dedup.minhashLsh]]
  * estimates Jaccard as eqCount/k per CANDIDATE PAIR). Replaces the
  * interpreted `aggregate(zip_with(a, b, (x,y) => if(x==y) 1 else 0))`
  * fold with a static loop, same [[DotProductExpr]] rationale.
  *
  * Exactness: integer equality and an int counter — identical to the HOF
  * form on the only inputs minhashLsh produces (two non-null fixed-k
  * signatures with no null elements). Off that domain the semantics are
  * INTENTIONALLY STRICTER than the HOF fold, which zip_with-pads a length
  * mismatch and counts nulls as disagreement: here null array → null,
  * length mismatch → null, null element → null — a malformed signature
  * pair surfaces as a null estimate instead of a silently-low count
  * (ADVICE r6: the old scaladoc overstated parity with the HOF form). */
object EqCountUtil {
  def eqCount(a: ArrayData, b: ArrayData): java.lang.Integer = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var c = 0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    java.lang.Integer.valueOf(c)
  }
}

/** Catalyst expression: number of positions where two array<long>
  * columns agree, codegen'd as one static call per row. */
case class EqCountExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "eq_count"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"eq_count needs two array<bigint> inputs, got $l and $r")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    EqCountUtil.eqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("eqCountResult")
      s"""
         |java.lang.Integer $boxed = graft.functions.EqCountUtil.eqCount($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.intValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EqCountExpr =
    copy(left = newLeft, right = newRight)
}

object EqCountFn {
  /** eqCount(a, b): positions where the two long arrays agree. */
  def eqCount(a: Column, b: Column): Column =
    ColumnBridge.column(EqCountExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
