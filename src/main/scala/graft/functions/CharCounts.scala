package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-character histogram over a fixed alphabet.
  *
  * The pure-`functions` formulation of a character histogram needs one
  * `length(replace(...))` pair PER ALPHABET CHARACTER — 27 string scans
  * per row for q94's alphabet. This expression computes all counts in ONE
  * scan of the string and stays inside WholeStageCodegen (static call,
  * same pattern as [[TransliterateExpr]]), so the per-row cost at 100 TB
  * is |text| instead of 27·|text|. Characters outside the alphabet are
  * ignored; the output array is index-aligned with the alphabet string,
  * which keeps every downstream formula (entropy, distinct counts) an
  * ordinary array fold with engine-portable arithmetic.
  */
object CharCountsUtil {
  /** Per-alphabet lookup tables, built once per JVM (the alphabet is a
    * plan-time constant — rebuilding a 128-slot table per ROW would cost
    * as much as scanning a short document). */
  private val tables = new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
  private def table(alphabet: String): Array[Int] =
    tables.computeIfAbsent(alphabet, a => {
      val idx = new Array[Int](128)
      java.util.Arrays.fill(idx, -1)
      var i = 0
      while (i < a.length) { idx(a.charAt(i)) = i; i += 1 }
      idx
    })

  /** Static entry point shared by interpreted eval and generated code.
    * Only ASCII alphabets are supported (the histogram index is a
    * 128-slot table); q94's alphabet is a-z plus space. Iterates the
    * UTF8String's raw bytes — no UTF-16 decode/copy: UTF-8 continuation
    * and multi-byte lead bytes are all >= 0x80 (negative as signed
    * bytes), so they can never collide with an ASCII alphabet slot. */
  def counts(s: UTF8String, alphabet: String): ArrayData = {
    val idx = table(alphabet)
    val out = new Array[Int](alphabet.length)
    val n = s.numBytes
    var j = 0
    while (j < n) {
      val b = s.getByte(j)
      if (b >= 0 && idx(b) >= 0) out(idx(b)) += 1
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Catalyst expression: array<int> of per-alphabet-char counts, one
  * string pass, codegen'd as a direct static call. */
case class CharCountsExpr(child: Expression, alphabet: String) extends UnaryExpression {
  require(alphabet.nonEmpty && alphabet.forall(_ < 128),
    "CharCountsExpr supports non-empty ASCII alphabets only")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "char_counts"

  override protected def nullSafeEval(input: Any): Any =
    CharCountsUtil.counts(input.asInstanceOf[UTF8String], alphabet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val alphaRef = ctx.addReferenceObj("alphabet", alphabet, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.CharCountsUtil.counts($c, $alphaRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): CharCountsExpr =
    copy(child = newChild)
}

object CharCountsFn {
  /** charCounts(col, alphabet): index-aligned per-char counts. */
  def charCounts(c: Column, alphabet: String): Column =
    ColumnBridge.column(CharCountsExpr(ColumnBridge.expression(c), alphabet))
}
