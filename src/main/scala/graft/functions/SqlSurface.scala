package graft.functions

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Pure-SQL surface for the function library: installs each Column-API
  * function as a Spark SQL UDF (`CREATE OR REPLACE TEMPORARY FUNCTION
  * ... RETURN <expr>`, SQL-function support new in Spark 4) so a
  * SQL-only user — the reference's native audience — can call
  * `graft_lang_id(text)` etc. from `spark.sql` with no Scala.
  *
  * Where possible the function BODIES are rendered from the same Column
  * expression tree the DataFrame API uses (analyzed `.sql`), so the two
  * surfaces cannot drift apart; the handful of lambda-based functions
  * (resolved `LambdaFunction.sql` does not re-parse) carry hand-written
  * arrow-syntax bodies that SqlSurfaceSpec pins value-equal to the
  * Column API. SQL UDFs inline into the calling plan at analysis time —
  * the installed functions keep whole-stage codegen, unlike
  * `spark.udf.register` closures which box every row. */
object SqlSurface {

  /** (sql name, typed params, body): `Right(builder)` renders the body
    * from the Column-API expression tree; `Left(sql)` is a hand-written
    * body for functions whose trees contain lambdas (resolved
    * `LambdaFunction.sql` does not round-trip through the parser) —
    * those are pinned to the Column API by SqlSurfaceSpec instead. */
  private def defs: Seq[(String, Seq[(String, String)],
      Either[String, Seq[Column] => Column])] = Seq(
    ("graft_tokens", Seq("text" -> "STRING"), Right(cs => T.tokens(cs.head))),
    ("graft_n_tokens", Seq("text" -> "STRING"), Right(cs => T.nTokens(cs.head))),
    ("graft_lang_id", Seq("text" -> "STRING"), Left(langIdSql())),
    ("graft_punct_ratio", Seq("text" -> "STRING"), Right(cs => T.punctRatio(cs.head))),
    ("graft_stopword_ratio", Seq("text" -> "STRING"), Left(
      s"round(${stopwordHitsSql(T.langProfiles("en"))} / " +
        "CAST(size(split(text, ' ', -1)) AS DOUBLE), 4)")),
    ("graft_content_fp", Seq("text" -> "STRING"),
      Right(cs => T.contentFingerprint(cs.head))),
    ("graft_rolling_fp", Seq("text" -> "STRING"), Left(
      s"""aggregate(split(text, ' ', -1), 0L,
         |(acc, t) -> pmod(acc * 31L + pmod(xxhash64(t), ${T.FingerprintMod}L),
         |${T.FingerprintMod}L))""".stripMargin)),
    ("graft_dup_token_frac", Seq("text" -> "STRING"),
      Right(cs => T.dupTokenFrac(cs.head))),
    ("graft_scrub_pii", Seq("text" -> "STRING"), Right(cs => T.scrubPii(cs.head))),
    ("graft_hash_bucket", Seq("id" -> "BIGINT"),
      Right(cs => T.hashBucket(cs.head, 1000))),
    ("graft_hash_uniform", Seq("id" -> "BIGINT"), Right(cs => T.hashUniform(cs.head))),
    ("graft_split_label", Seq("id" -> "BIGINT"), Right(cs => T.splitLabel(cs.head))),
    ("graft_vec_dot", Seq("a" -> "ARRAY<FLOAT>", "b" -> "ARRAY<FLOAT>"),
      Left(dotSql("a", "b"))),
    ("graft_vec_cosine", Seq("a" -> "ARRAY<FLOAT>", "b" -> "ARRAY<FLOAT>"),
      Left(s"${dotSql("a", "b")} / (sqrt(${dotSql("a", "a")}) * sqrt(${dotSql("b", "b")}))")))

  /** SQL twin of [[VectorFunctions.dot]] (double-precision fold). */
  private def dotSql(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      s"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  /** SQL twin of [[TextFunctions.stopwordHits]] over the `text` param. */
  private def stopwordHitsSql(words: Seq[String]): String =
    s"size(filter(split(text, ' ', -1), t -> t IN (${
      words.map(w => s"'$w'").mkString(", ")})))"

  /** SQL twin of [[TextFunctions.langId]]: the same ascending-name
    * IF-fold over `langProfiles` (word lists and tie-break shared with
    * the Column API — only the fold syntax is hand-written). */
  private def langIdSql(minHits: Int = 2): String = {
    val structs = T.langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      s"named_struct('hits', ${stopwordHitsSql(words)}, 'lang', '$lang')"
    }
    val best = structs.reduce((a, b) => s"IF(($b).hits > ($a).hits, $b, $a)")
    s"CASE WHEN ($best).hits >= $minHits THEN ($best).lang ELSE 'und' END"
  }

  /** Installs every function into the session's temp-function registry.
    * Returns the installed names (for discoverability / tests).
    *
    * Body rendering: the Column tree is ANALYZED against an empty
    * relation typed like the parameter list (unresolved trees don't
    * render valid SQL), then the resolved expression's `.sql` becomes
    * the `RETURN` body, with parameter names as its attributes. */
  def install(spark: SparkSession): Seq[String] = defs.map {
    case (name, params, bodyDef) =>
      val body = bodyDef match {
        case Left(sql) => sql
        case Right(build) =>
          val schema = StructType(params.map { case (n, t) =>
            StructField(n, DataType.fromDDL(t)) })
          val empty = spark.createDataFrame(
            java.util.Collections.emptyList[Row](), schema)
          val analyzed = empty
            .select(build(params.map(p => col(p._1))).as("__body"))
            .queryExecution.analyzed
          analyzed.expressions.collectFirst { case a: Alias => a.child }
            .getOrElse(sys.error(s"$name: no body expression")).sql
      }
      val sig = params.map { case (n, t) => s"$n $t" }.mkString(", ")
      spark.sql(s"CREATE OR REPLACE TEMPORARY FUNCTION $name($sig) RETURN $body")
      name
  }
}
