package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{CharCountsExpr, TransliterateExpr}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst pieces into any session, including pure-SQL ones:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   spark.sql("SELECT transliterate(last_name) FROM author")
  *
  * or via config (works with spark-submit, no code change):
  *   --conf spark.sql.extensions=graft.plans.GraftExtensions
  *
  * Currently injected: the `transliterate` scalar function (the reference's
  * unidecode step, SURVEY §2.8 C1) and the `char_counts(text, alphabet)`
  * one-pass histogram, both as native expressions — codegen'd, so SQL
  * users get the same WholeStageCodegen path as the DataFrame API. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPostHocResolutionRule(_ => ArgmaxRewriteRule)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectFunction((
      new FunctionIdentifier("transliterate"),
      new ExpressionInfo(classOf[TransliterateExpr].getName, "transliterate"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "transliterate takes exactly one argument")
        TransliterateExpr(children.head)
      }))
    // char_counts(text, 'alphabet'): one-pass per-char histogram; the
    // alphabet must be a foldable string literal (it compiles into the
    // generated code as a constant lookup table).
    e.injectFunction((
      new FunctionIdentifier("char_counts"),
      new ExpressionInfo(classOf[CharCountsExpr].getName, "char_counts"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "char_counts takes (text, alphabet literal)")
        val alphabet = children(1) match {
          case Literal(s: UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"char_counts alphabet must be a string literal, got $other")
        }
        CharCountsExpr(children.head, alphabet)
      }))
  }
}
