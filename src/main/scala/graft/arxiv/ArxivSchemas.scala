package graft.arxiv

import org.apache.spark.sql.types._

/** Explicit schemas for the reference's data model — no inference at the
  * bronze boundary (the reference's pandas re-reads silently turned
  * `n_cites` into VARCHAR, `dags/scripts/sql_queries.py:24`; we pin types).
  * Layout follows the Postgres DDL (`dags/scripts/sql_queries.py:16-90`). */
object ArxivSchemas {

  /** Raw JSONL scan schema — the 6 fields the reference keeps of 14
    * (`dags/scripts/raw_to_tables.py:34-44`). Schema-on-read makes the JSON
    * parser skip the heavy fields (abstract etc.) at scan time. */
  val raw: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("doi", StringType),
    StructField("categories", StringType),
    StructField("update_date", StringType),
    StructField("authors_parsed", ArrayType(ArrayType(StringType)))))

  val article: StructType = StructType(Seq(
    StructField("article_id", StringType, nullable = false),
    StructField("title", StringType),
    StructField("doi", StringType),
    StructField("n_authors", IntegerType),
    StructField("journal_issn", StringType),
    StructField("type", StringType),
    StructField("n_cites", IntegerType), // INT here; VARCHAR bug fixed
    StructField("year", IntegerType)))

  val author: StructType = StructType(Seq(
    StructField("author_id", StringType, nullable = false),
    StructField("last_name", StringType),
    StructField("first_name", StringType),
    StructField("middle_name", StringType),
    StructField("gender", StringType),
    StructField("total_pubs", IntegerType),
    StructField("total_cites", IntegerType),
    StructField("avg_cites", DoubleType),
    StructField("med_coauthors", DoubleType),
    StructField("n_unique_coauthors", IntegerType),
    StructField("hindex", IntegerType),
    StructField("rank_total_pubs", IntegerType),
    StructField("rank_total_cites", IntegerType),
    StructField("rank_avg_cites", IntegerType),
    StructField("rank_hindex", IntegerType)))

  val authorship: StructType = StructType(Seq(
    StructField("article_id", StringType, nullable = false),
    StructField("author_id", StringType, nullable = false)))

  val category: StructType = StructType(Seq(
    StructField("category_id", StringType, nullable = false),
    StructField("superdom", StringType),
    StructField("subdom", StringType)))

  val articleCategory: StructType = StructType(Seq(
    StructField("article_id", StringType, nullable = false),
    StructField("category_id", StringType, nullable = false)))

  val journal: StructType = StructType(Seq(
    StructField("journal_issn", StringType, nullable = false),
    StructField("journal_title", StringType),
    StructField("snip_latest", DoubleType)))
}
