package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** The SQL-UDF surface must agree with the Column API exactly — the
  * bodies are rendered from the same expression trees, so any
  * divergence means `.expr.sql` failed to round-trip a construct. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("installed SQL functions equal their Column-API originals on the corpus") {
    val names = SqlSurface.install(spark)
    assert(names.size == 14)
    graft.core.Tables.documents(spark, d).createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |concat_ws('|', graft_tokens(text)) AS toks,
        |graft_n_tokens(text) AS nt, graft_lang_id(text) AS lang,
        |round(graft_punct_ratio(text), 6) AS pr,
        |round(graft_stopword_ratio(text), 6) AS sr,
        |graft_content_fp(text) AS fp, graft_rolling_fp(text) AS rfp,
        |round(graft_dup_token_frac(text), 6) AS dtf,
        |graft_scrub_pii(text) AS scrubbed,
        |graft_hash_bucket(doc_id) AS hb,
        |round(graft_hash_uniform(doc_id), 9) AS hu,
        |graft_split_label(doc_id) AS lbl
        |FROM docs_sql""".stripMargin)
      .as[(Long, String, Int, String, Double, Double, String, Long, Double, String, Int, Double, String)]
      .collect().sortBy(_._1)
    val viaApi = graft.core.Tables.documents(spark, d)
      .select(col("doc_id"), concat_ws("|", T.tokens(col("text"))), T.nTokens(col("text")),
        T.langId(col("text")), round(T.punctRatio(col("text")), 6),
        round(T.stopwordRatio(col("text")), 6),
        T.contentFingerprint(col("text")), T.rollingFingerprint(col("text")),
        round(T.dupTokenFrac(col("text")), 6), T.scrubPii(col("text")),
        T.hashBucket(col("doc_id"), 1000), round(T.hashUniform(col("doc_id")), 9),
        T.splitLabel(col("doc_id")))
      .as[(Long, String, Int, String, Double, Double, String, Long, Double, String, Int, Double, String)]
      .collect().sortBy(_._1)
    assert(viaSql.length == viaApi.length && viaSql.length > 0)
    viaSql.zip(viaApi).foreach { case (s, a) => assert(s == a, s"doc ${a._1}") }
  }

  test("vector SQL functions agree with the Column API") {
    graft.core.Tables.embeddings(spark, d).createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      """SELECT a.vec_id, round(graft_vec_dot(a.embedding, b.embedding), 5) AS dp,
        |round(graft_vec_cosine(a.embedding, b.embedding), 5) AS cs
        |FROM emb_sql a JOIN emb_sql b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 20""".stripMargin)
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    val e = graft.core.Tables.embeddings(spark, d)
    val viaApi = e.as("a").join(e.as("b"),
        col("b.vec_id") === col("a.vec_id") + 1)
      .filter(col("a.vec_id") < 20)
      .select(col("a.vec_id"),
        round(V.dot(col("a.embedding"), col("b.embedding")), 5),
        round(V.cosine(col("a.embedding"), col("b.embedding")), 5))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(viaSql.toSeq == viaApi.toSeq && viaSql.nonEmpty)
  }

  test("SQL surface functions inline: no ScalaUDF in the plan") {
    graft.core.Tables.documents(spark, d).createOrReplaceTempView("docs_sql2")
    val plan = spark.sql(
      "SELECT graft_lang_id(text) FROM docs_sql2").queryExecution.executedPlan
    assert(!plan.toString.contains("ScalaUDF"),
      "SQL UDFs must inline as expressions, not box rows through closures")
  }
}
