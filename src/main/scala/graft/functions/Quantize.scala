package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Single-pass codegen int8 quantization of a float-vector column —
  * scale derivation and per-component rounding FUSED into one tight
  * loop, replacing `V.quantize(v, V.quantScale(v))`, whose two
  * higher-order functions (`aggregate` for the max-abs scale,
  * `transform` for the rounding) are CodegenFallback: they evaluate
  * INTERPRETED, with a closure dispatch + boxing per element and a
  * BigDecimal allocation per element inside the builtin `round`. The
  * round-12 fit decomposition priced that at ~21 s for 2M×64 floats —
  * the whole fit floor of q115 at the g100 decade for what should be a
  * scan-speed map (BENCH_SCALE_r12_q115stages).
  *
  * EXACTNESS vs the Column form, term by term:
  *  - scale: max of |x| as double (nulls skipped, exactly `aggregate`'s
  *    fold with `greatest(acc, abs(x))`), clamped to >= 1e-30, / 127.0 —
  *    identical double arithmetic. (NaN components would diverge —
  *    `greatest` propagates NaN as largest, a primitive compare skips
  *    it; embeddings carry no NaN and the spec corpus proves the
  *    envelope.)
  *  - rounding: Spark's `round(d)` on DoubleType is HALF_UP on the
  *    SHORTEST-DECIMAL representation (scala BigDecimal(d)). Fast path:
  *    floor(|d| + 0.5) with the sign restored. The shortest-decimal
  *    value differs from the binary double by < 1 ulp (~3e-14 at
  *    |d| <= 127), so the two roundings can only disagree when d sits
  *    within that distance of a .5 boundary — we widen the guard band
  *    to 1e-9 and defer to the exact BigDecimal inside it, making the
  *    fast path provably equivalent everywhere else (FunctionLaws
  *    drives 10^6 randomized + adversarial-tie checks against the
  *    BigDecimal reference).
  *  - null semantics: null array → null; null element → null element,
  *    skipped in the scale max (what aggregate+transform do).
  *
  * VectorQueriesSpec additionally asserts frame-level equality of both
  * quantization paths on the fixture corpus. */
object QuantizeUtil {
  private val HalfUp = java.math.RoundingMode.HALF_UP

  /** Spark `Round(d, 0)` semantics with a primitive fast path; see the
    * equivalence argument above. */
  def roundHalfUp(d: Double): Long = {
    val shifted = math.abs(d) + 0.5
    if (math.abs(shifted - math.rint(shifted)) < 1e-9)
      java.math.BigDecimal.valueOf(d).setScale(0, HalfUp).longValue()
    else
      Math.copySign(math.floor(shifted), d).toLong
  }

  def quantize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var maxAbs = 0.0
    var hasNull = false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) hasNull = true
      else {
        val d = math.abs(a.getFloat(i).toDouble)
        if (d > maxAbs) maxAbs = d
      }
      i += 1
    }
    val scale = math.max(maxAbs, 1e-30) / 127.0
    if (!hasNull) {
      val out = new Array[Int](n)
      i = 0
      while (i < n) {
        out(i) = roundHalfUp(a.getFloat(i).toDouble / scale).toInt
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) =
          if (a.isNullAt(i)) null
          else java.lang.Integer.valueOf(
            roundHalfUp(a.getFloat(i).toDouble / scale).toInt)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Catalyst expression: int8-quantize an array<float> column with its
  * own max-abs scale, one static call per row inside WholeStageCodegen. */
case class QuantizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, containsNull) => ArrayType(IntegerType, containsNull)
    case _ => ArrayType(IntegerType, containsNull = false)
  }
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "quantize_vec"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_vec needs an array<float> input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    QuantizeUtil.quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.QuantizeUtil.quantize($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeExpr =
    copy(child = newChild)
}

object QuantizeFn {
  /** quantizeVec(v): fused scale + int8 quantization, bit-identical to
    * `VectorFunctions.quantize(v, VectorFunctions.quantScale(v))`. */
  def quantizeVec(v: Column): Column =
    ColumnBridge.column(QuantizeExpr(ColumnBridge.expression(v)))
}
