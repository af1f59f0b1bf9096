package graft.arxiv

/** The reference's DWH queries (README.md §5.1) as Spark-SQL strings over
  * the temp views registered by [[ArxivPipeline.registerViews]] — the
  * `spark.sql` twin of [[ArxivQueries]]'s DataFrame builders (the
  * reference's interactive surface, SURVEY §3 E3).
  *
  * Differences from the literal Postgres text, with rationale:
  *  - `LIMIT 0.01 * (SELECT COUNT(*) …) / 100` — Spark SQL has no
  *    expression LIMIT; the caller passes the computed k (same driver-side
  *    count the reference's planner effectively ran). The reference puts
  *    this limit BOTH on the top-author subquery AND trailing q2/q3/q4
  *    (README.md:218-220,248-252,283) — both are kept: under argmax ties
  *    the trailing LIMIT truncates to exactly k rows, as Postgres does.
  *  - `mode() WITHIN GROUP (ORDER BY x)` (q2) — no Spark equivalent;
  *    expressed as the count + row_number argmax with the same
  *    smallest-tied-value semantics.
  *  - the repeated `final`/`final1` subquery is written once as a CTE;
  *    q3/q4 keep the reference's literal theta-join + IS NULL argmax
  *    shape — with [[graft.plans.GraftExtensions]] installed,
  *    [[graft.plans.ArgmaxRewriteRule]] rewrites it to a window at plan
  *    time, so the legacy SQL runs at window speed unchanged. */
object ArxivSql {

  def q1(k: Int): String =
    s"""SELECT author_id, rank_total_pubs AS rank, total_pubs AS publications
       |FROM author
       |ORDER BY rank_total_pubs, author_id
       |LIMIT $k""".stripMargin

  def q2(k: Int): String =
    s"""WITH top AS (${q1(k)}),
       |per_journal AS (
       |  SELECT t.author_id, t.rank, t.publications, j.journal_title,
       |         count(j.journal_title) AS number
       |  FROM top t
       |  JOIN authorship au ON t.author_id = au.author_id
       |  JOIN article ar ON au.article_id = ar.article_id
       |  JOIN journal j ON ar.journal_issn = j.journal_issn
       |  GROUP BY t.author_id, t.rank, t.publications, j.journal_title),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY author_id
       |            ORDER BY number DESC, journal_title) AS rk
       |  FROM per_journal)
       |SELECT author_id, rank, publications, journal_title AS top_journal,
       |       concat(CAST(CAST(floor(number * 100 / publications) AS INT)
       |         AS STRING), '%') AS percentage_of_all_publications
       |FROM ranked WHERE rk = 1
       |ORDER BY rank, author_id
       |LIMIT $k""".stripMargin

  /** Literal reference shape (theta-join argmax) — exercised through the
    * ArgmaxRewriteRule when GraftExtensions is installed. */
  def q3(k: Int): String =
    s"""WITH top AS (
       |  SELECT author_id, rank_total_pubs AS rank FROM author
       |  ORDER BY rank_total_pubs, author_id LIMIT $k),
       |per_year AS (
       |  SELECT t.author_id, t.rank, count(ar.year) AS pub, ar.year,
       |         CAST(floor(CAST(sum(ar.n_cites) AS BIGINT) / count(ar.year))
       |           AS BIGINT) AS avg_cites
       |  FROM top t
       |  JOIN authorship au ON t.author_id = au.author_id
       |  JOIN article ar ON au.article_id = ar.article_id
       |  GROUP BY t.author_id, t.rank, ar.year)
       |SELECT f.author_id, f.rank, f.year AS most_influential_year,
       |       f.pub AS count_of_pub, f.avg_cites
       |FROM per_year f
       |LEFT JOIN per_year f1
       |  ON f.author_id = f1.author_id AND f.avg_cites < f1.avg_cites
       |WHERE f1.author_id IS NULL
       |ORDER BY f.rank, f.author_id, f.year
       |LIMIT $k""".stripMargin

  /** Q4 (README.md:262-283): "most influential year" — per-year argmax of
    * sum(hindex) over the top authors' articles; same literal theta-join
    * shape as q3 (the per-year aggregates sum the per-author CONSTANTS
    * over the year group — the reference's own semantics, replicated). */
  def q4(k: Int): String =
    s"""WITH top AS (
       |  SELECT author_id, rank_total_pubs AS rank, total_pubs AS publications,
       |         hindex, avg_cites
       |  FROM author
       |  ORDER BY rank_total_pubs, author_id LIMIT $k),
       |per_year AS (
       |  SELECT t.author_id, t.rank,
       |         CAST(sum(t.hindex) AS DOUBLE) AS hindex,
       |         CAST(sum(t.publications) AS DOUBLE) AS pub,
       |         sum(t.avg_cites) AS avg_cites, ar.year
       |  FROM top t
       |  JOIN authorship au ON t.author_id = au.author_id
       |  JOIN article ar ON au.article_id = ar.article_id
       |  GROUP BY t.author_id, t.rank, ar.year)
       |SELECT f.author_id, f.rank, f.hindex, f.pub, f.avg_cites, f.year
       |FROM per_year f
       |LEFT JOIN per_year f1
       |  ON f.author_id = f1.author_id AND f.hindex < f1.hindex
       |WHERE f1.author_id IS NULL
       |ORDER BY f.rank, f.author_id, f.year
       |LIMIT $k""".stripMargin
}
