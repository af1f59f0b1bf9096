package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Single-pass codegen a<b pair combinations of a (pre-sorted) item array
  * — the replacement for [[graft.operators.CoOccur.pairsViaGroups]]'
  * Column form
  * `flatten(transform(items, (x, i) -> transform(slice(items, i + 2,
  * size(items) - i - 1), y -> struct(x, y))))`, which is CodegenFallback:
  * `transform`/`slice`/`flatten` evaluate INTERPRETED with a closure
  * dispatch and a `slice` allocation per outer element plus a full
  * intermediate array-of-arrays before `flatten`. That interpreted cost
  * is exactly why the per-key explosion form LOST its round-1 A/B against
  * the self-join (3.6 s vs 1.95 s at sf0.1) despite emitting S(S−1)/2
  * rows outright instead of the join's S² candidates — the same
  * expression class whose removal bought 9–25x on shingles (round 13)
  * and 42x on quantize (round 12).
  *
  * EXACTNESS vs the HOF form, argued structurally: both emit, for a
  * sorted input array `items`, the structs (items(i), items(j)) for every
  * 0 <= i < j < n in the same (i asc, j asc) order — the outer transform
  * index i pairs items(i) with the slice starting at 1-based position
  * i+2, i.e. items(i+1..n-1). No comparison happens here (the caller's
  * sort_array supplies the a<b invariant), so the expression is
  * element-type-generic: values are copied by reference from the input
  * ArrayData into the output structs. Null input array -> null (the HOF
  * chain is null-propagating); input elements are never null on the
  * collect_list path (it drops nulls), and the fields inherit the input's
  * containsNull. CoOccurSpec pins frame equality of the three forms
  * (join / HOF groups / expr groups) on lineitem at sf0.001. */
object PairCombosUtil {
  def combos(items: ArrayData, et: DataType): ArrayData = {
    val n = items.numElements()
    if (n < 2) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = items.get(i, et)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](a, items.get(j, et)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Catalyst expression: all a<b index combinations of an array as
  * struct(item_a, item_b) rows, one static call per input row inside
  * WholeStageCodegen; constant-size generated code at any array length. */
case class PairCombosExpr(child: Expression) extends UnaryExpression {

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  private def elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item_a", elemType, elemNullable),
    StructField("item_b", elemType, elemNullable))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pair_combos"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_combos needs an array input, got $other")
  }

  override protected def nullSafeEval(items: Any): Any =
    PairCombosUtil.combos(items.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val etRef = ctx.addReferenceObj("elemType", elemType,
      "org.apache.spark.sql.types.DataType")
    nullSafeCodeGen(ctx, ev, items => {
      s"""
         |${ev.value} = graft.functions.PairCombosUtil.combos($items,
         |  (org.apache.spark.sql.types.DataType) $etRef);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PairCombosExpr =
    copy(child = newChild)
}

object PairCombosFn {
  /** pairCombos(items): array<struct<item_a, item_b>> of all i<j index
    * combinations, identical to the flatten/transform/slice HOF form. */
  def pairCombos(items: Column): Column =
    ColumnBridge.column(PairCombosExpr(ColumnBridge.expression(items)))
}
