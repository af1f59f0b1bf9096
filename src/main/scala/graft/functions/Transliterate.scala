package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode→ASCII transliteration ("Šrámek"→"Sramek", "Møller"→"Moller").
  *
  * The reference normalizes author names with a transliteration library
  * before building author ids (`dags/scripts/raw_to_tables.py:104-105`);
  * Spark has no builtin for this, so it is the repo's custom-`Expression`
  * exemplar: NFD decomposition + combining-mark strip, plus explicit
  * mappings for the Latin letters NFD cannot decompose (ø ł æ ß đ þ ð œ).
  */
object Translit {
  /** Static entry point shared by interpreted eval and generated code. */
  def ascii(s: UTF8String): UTF8String = {
    val norm = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(norm.length)
    var i = 0
    while (i < norm.length) {
      val ch = norm.charAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) {
        ch match {
          case 'ø' => sb.append('o');   case 'Ø' => sb.append('O')
          case 'ł' => sb.append('l');   case 'Ł' => sb.append('L')
          case 'đ' => sb.append('d');   case 'Đ' => sb.append('D')
          case 'ð' => sb.append('d');   case 'Ð' => sb.append('D')
          case 'þ' => sb.append("th");  case 'Þ' => sb.append("Th")
          case 'æ' => sb.append("ae");  case 'Æ' => sb.append("AE")
          case 'œ' => sb.append("oe");  case 'Œ' => sb.append("OE")
          case 'ß' => sb.append("ss")
          case c   => sb.append(c)
        }
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Catalyst expression wrapper: codegen emits a direct static call, so the
  * function stays inside WholeStageCodegen (no UDF serialization, no row
  * boxing). */
case class TransliterateExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "transliterate"

  override protected def nullSafeEval(input: Any): Any =
    Translit.ascii(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Translit.ascii($c)")

  override protected def withNewChildInternal(newChild: Expression): TransliterateExpr =
    copy(child = newChild)
}

object TransliterateFn {
  /** transliterate(col): ASCII-fold a string column. */
  def transliterate(c: Column): Column =
    ColumnBridge.column(TransliterateExpr(ColumnBridge.expression(c)))
}
