package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.TransliterateExpr

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
  * unidecode step, SURVEY §2.8 C1) as a native expression — codegen'd, so
  * SQL users get the same WholeStageCodegen path as the DataFrame API. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPostHocResolutionRule(_ => ArgmaxRewriteRule)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectFunction((
      new FunctionIdentifier("transliterate"),
      new ExpressionInfo(classOf[TransliterateExpr].getName, "transliterate"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "transliterate takes exactly one argument")
        TransliterateExpr(children.head)
      }))
  }
}
