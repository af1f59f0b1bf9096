package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Single-pass codegen dot product over two float/double array columns.
  *
  * The pure-`functions` formulation (`aggregate(zip_with(a, b, _*_), 0.0,
  * _+_)`) is built on Spark's higher-order functions, which do NOT
  * participate in whole-stage codegen — each element evaluates through an
  * interpreted lambda with per-element boxing. That interpretation sits in
  * the hottest loops of the vector family: one dot per CANDIDATE PAIR in
  * the cosine verifiers (q38/q40/q113/q115/q117), and nPlanes dots per ROW
  * in every sign-LSH bucketing. This expression is the same arithmetic as
  * a tight Java loop behind a static call (the [[CharCountsExpr]] /
  * [[TransliterateExpr]] pattern), so it inlines into WholeStageCodegen.
  *
  * Bit-exactness contract (what lets [[VectorFunctions.dot]] swap
  * implementations without touching a single oracle): the fold order and
  * operations are IDENTICAL to the higher-order form — left-to-right,
  * `acc += (double) a_i * (double) b_i` — float→double casts are exact and
  * IEEE multiply/add are correctly rounded, so both implementations (and
  * DuckDB's `list_dot_product` over the same values) produce the same
  * bits. Null/length semantics also mirror the old form: null array →
  * null; length mismatch → null (zip_with pads with null); null element →
  * null (a null product nullifies the running aggregate sum).
  */
object DotProductUtil {
  /** Static entry shared by interpreted eval and generated code.
    * Returns a boxed Double or null (see semantics above). */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** Catalyst expression: double dot product of two float/double arrays,
  * codegen'd as one static call per row. */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_product needs two array<float|double> inputs, got $l and $r")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dotResult")
      s"""
         |java.lang.Double $boxed = graft.functions.DotProductUtil.dot(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductFn {
  /** dotProduct(a, b): codegen double dot product (see semantics above). */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
