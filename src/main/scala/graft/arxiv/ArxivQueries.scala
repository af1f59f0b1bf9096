package graft.arxiv

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GroupOps

/** The reference's four DWH queries (README.md:183-286) as DataFrame
  * builders. The `LEFT JOIN final1 … WHERE final1.x IS NULL` theta-join
  * argmax idiom is rewritten to one window per group (GroupOps
  * .argmaxPerGroup) — same row set incl. ties, one shuffle instead of a
  * self-join. The `LIMIT 0.01 * count / 100` scalar-subquery limit becomes
  * GroupOps.topPercent (TakeOrderedAndProject).
  *
  * Every `ORDER BY rank LIMIT k` carries a pinned tiebreak
  * (author_id[, year]) in BOTH the builders and the [[ArxivSql]] twins:
  * Postgres leaves tie order at the LIMIT boundary unspecified, so the
  * truncated row set is one of several it could return — pinning makes
  * runs reproducible and the SQL/DataFrame pair row-identical. */
object ArxivQueries {

  private val TopPct = 0.01 // "top 0.01%"

  /** The computed top-k: `round(0.01 * count(author) / 100)` — the
    * reference's scalar-subquery LIMIT (README.md:188), with Postgres
    * numeric-LIMIT rounding. `kOverride` lets tests pin k directly. */
  private def topK(author: DataFrame, kOverride: Option[Int]): Int =
    kOverride.getOrElse(math.round(TopPct / 100.0 * author.count()).toInt)

  /** Q1 (README.md:185-188): top 0.01% authors by publication count. */
  def q1TopAuthorsByPubs(author: DataFrame, k: Option[Int] = None): DataFrame =
    author.select(col("author_id"), col("rank_total_pubs").as("rank"),
        col("total_pubs").as("publications"))
      .orderBy("rank", "author_id").limit(topK(author, k))

  /** Q2 (README.md:196-220): for the Q1 authors, their modal journal and
    * its share of their publications (integer percent, 'NN%'). The
    * trailing limit replicates the reference's outer
    * `LIMIT 0.01*count/100` (README.md:218-220). */
  def q2TopJournalShare(author: DataFrame, authorship: DataFrame,
      article: DataFrame, journal: DataFrame, k: Option[Int] = None): DataFrame = {
    val kk = topK(author, k)
    val top = q1TopAuthorsByPubs(author, Some(kk))
    val perJournal = top
      .join(authorship, Seq("author_id"))
      .join(article.select("article_id", "journal_issn"), Seq("article_id"))
      .join(journal.select("journal_issn", "journal_title"), Seq("journal_issn"))
      .groupBy("author_id", "rank", "publications", "journal_title")
      .agg(count(col("journal_title")).as("number"))
    // Postgres mode() tie-break = smallest title among the most frequent
    val w = Window.partitionBy("author_id")
      .orderBy(col("number").desc, col("journal_title"))
    perJournal.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("author_id"), col("rank"), col("publications"),
        col("journal_title").as("top_journal"),
        concat(floor(col("number") * lit(100) / col("publications"))
          .cast("int").cast("string"), lit("%"))
          .as("percentage_of_all_publications"))
      .orderBy("rank", "author_id")
      .limit(kk)
  }

  /** Q3 (README.md:233-250): most productive year per top author — argmax
    * over per-year avg_cites with Postgres integer division. Ties kept by
    * the argmax (as in the reference's theta-join), then the trailing
    * LIMIT truncates to exactly k rows as Postgres does
    * (README.md:248-252). */
  def q3MostProductiveYear(author: DataFrame, authorship: DataFrame,
      article: DataFrame, k: Option[Int] = None): DataFrame = {
    val kk = topK(author, k)
    val top = author.select(col("author_id"), col("rank_total_pubs").as("rank"))
      .orderBy("rank", "author_id").limit(kk)
    val perYear = top
      .join(authorship, Seq("author_id"))
      .join(article.select("article_id", "year", "n_cites"), Seq("article_id"))
      .groupBy("author_id", "rank", "year")
      .agg(count("year").as("pub"),
        // sum(...)::int / count(...) — Postgres integer division truncates
        floor(sum(col("n_cites")).cast("long") / count("year")).cast("long")
          .as("avg_cites"))
    GroupOps.argmaxPerGroup(perYear, Seq("author_id"), col("avg_cites"))
      .select(col("author_id"), col("rank"),
        col("year").as("most_influential_year"),
        col("pub").as("count_of_pub"), col("avg_cites"))
      .orderBy("rank", "author_id", "most_influential_year")
      .limit(kk)
  }

  /** Q4 (README.md:262-283): "most influential year" — argmax over
    * sum(hindex) per year (the reference sums the per-author constants
    * over the year group; replicated exactly), trailing LIMIT as q3. */
  def q4MostInfluentialYear(author: DataFrame, authorship: DataFrame,
      article: DataFrame, k: Option[Int] = None): DataFrame = {
    val kk = topK(author, k)
    val top = author.select(col("author_id"), col("rank_total_pubs").as("rank"),
        col("total_pubs").as("publications"), col("hindex"), col("avg_cites"))
      .orderBy("rank", "author_id").limit(kk)
    val perYear = top
      .join(authorship, Seq("author_id"))
      .join(article.select("article_id", "year"), Seq("article_id"))
      .groupBy("author_id", "rank", "year")
      .agg(sum("hindex").cast("double").as("hindex_sum"),
        sum("publications").cast("double").as("pub"),
        sum("avg_cites").as("avg_cites_sum"))
    GroupOps.argmaxPerGroup(perYear, Seq("author_id"), col("hindex_sum"))
      .select(col("author_id"), col("rank"), col("hindex_sum").as("hindex"),
        col("pub"), col("avg_cites_sum").as("avg_cites"), col("year"))
      .orderBy("rank", "author_id", "year")
      .limit(kk)
  }
}
