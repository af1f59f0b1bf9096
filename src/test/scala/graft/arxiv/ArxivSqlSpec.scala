package graft.arxiv

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface twin test: the reference-shaped SQL (incl. the literal
  * theta-join argmax in q3) over registered temp views must return the
  * same rows as the DataFrame builders, on a 60-author synthetic corpus
  * big enough that top-0.01%-style limits and per-year argmaxes are
  * non-trivial. Runs in a GraftExtensions session so q3's theta-join
  * exercises the ArgmaxRewriteRule path end-to-end. */
class ArxivSqlSpec extends AnyFunSuite {

  test("spark.sql DWH queries match the DataFrame builders") {
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[4]")
        .appName("graft-arxiv-sql-spec")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      import spark.implicits._

      val rnd = new scala.util.Random(11)
      val nAuthors = 60
      val journals = (1 to 5).map(j => (s"issn-$j", s"Journal $j", j * 0.5))
        .toDF("journal_issn", "journal_title", "snip_latest")
      val articles = (1 to 300).map { a =>
        (s"art$a", s"Title number $a", s"10.1/$a", 1 + rnd.nextInt(4),
          s"issn-${1 + rnd.nextInt(5)}", "journal-article",
          rnd.nextInt(200), 2015 + rnd.nextInt(8))
      }.toDF("article_id", "title", "doi", "n_authors", "journal_issn",
        "type", "n_cites", "year")
      val authorship = (1 to 300).flatMap { a =>
        val k = 1 + rnd.nextInt(3)
        rnd.shuffle((1 to nAuthors).toList).take(k).map(u => (s"art$a", s"author$u"))
      }.toDF("article_id", "author_id")
      // author table with the stats the queries consume
      val names = (1 to nAuthors).map(u =>
        (s"author$u", s"Last$u", s"First$u", "")).toDF(
        "author_id", "last_name", "first_name", "middle_name")
      val genders = Seq.empty[(String, String)].toDF("first_name", "gender")
      val author = Augment.authorReady(names, authorship, articles, genders)

      articles.createOrReplaceTempView("article")
      author.createOrReplaceTempView("author")
      authorship.createOrReplaceTempView("authorship")
      journals.createOrReplaceTempView("journal")

      val kTop = 5

      def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
        df.collect().toSeq.map(r =>
          (0 until r.length).map(i => String.valueOf(r.get(i))))

      // q1: SQL vs direct DataFrame
      val q1Sql = rows(spark.sql(ArxivSql.q1(kTop)))
      val q1Df = rows(author
        .selectExpr("author_id", "rank_total_pubs AS rank", "total_pubs AS publications")
        .orderBy("rank", "author_id").limit(kTop)) // pinned tiebreak, as in ArxivSql/ArxivQueries
      assert(q1Sql == q1Df && q1Sql.nonEmpty)

      // q2: SQL vs DataFrame builder (same k injected both sides)
      val q2Sql = rows(spark.sql(ArxivSql.q2(kTop)))
      val q2Df = rows(ArxivQueries.q2TopJournalShare(
        author, authorship, articles, journals, k = Some(kTop)))
      assert(q2Sql == q2Df && q2Sql.nonEmpty)
      assert(q2Sql.forall(_.last.endsWith("%")))

      // q3/q4: the literal theta-join SQL — must be rewritten (no theta
      // self-join left in the optimized plan) and agree with the
      // window-based DataFrame builders row for row
      def assertNoThetaJoin(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
        val selfJoins = df.queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.condition.exists(_.exists(_.isInstanceOf[
              org.apache.spark.sql.catalyst.expressions.LessThan]))
            => j
        }
        assert(selfJoins.isEmpty, s"theta-join argmax not rewritten in $name SQL")
      }
      val q3Df = spark.sql(ArxivSql.q3(kTop))
      assertNoThetaJoin(q3Df, "q3")
      val q3Builder = rows(ArxivQueries.q3MostProductiveYear(
        author, authorship, articles, k = Some(kTop)))
      assert(rows(q3Df) == q3Builder && q3Builder.nonEmpty)

      val q4Df = spark.sql(ArxivSql.q4(kTop))
      assertNoThetaJoin(q4Df, "q4")
      val q4Builder = rows(ArxivQueries.q4MostInfluentialYear(
        author, authorship, articles, k = Some(kTop)))
      assert(rows(q4Df) == q4Builder && q4Builder.nonEmpty)
    } finally {
      // evict the extension session from the default/active slots even
      // when there was no previous session to restore (ADVICE r2 —
      // otherwise later suites' getOrCreate silently reuses it)
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("trailing LIMIT truncates argmax ties to exactly k rows (Postgres parity)") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    // author2 has TWO tied most-productive years (same pub count, same
    // integer-division avg_cites) → the untruncated q3 argmax yields 3
    // rows for k=2; Postgres's outer LIMIT returns exactly 2.
    val author = Seq(
      ("author1", 1, 3, 5, 2.0, 10),
      ("author2", 2, 2, 4, 1.0, 8),
      ("author3", 3, 1, 2, 0.5, 3),
    ).toDF("author_id", "rank_total_pubs", "total_pubs", "hindex", "avg_cites", "dummy")
      .drop("dummy")
    val articles = Seq(
      ("a1", "issn-1", 10, 2020), ("a2", "issn-1", 10, 2020), ("a3", "issn-1", 10, 2021),
      ("b1", "issn-1", 6, 2020), ("b2", "issn-1", 6, 2021), // author2: 2020 and 2021 tie
      ("c1", "issn-1", 1, 2020),
    ).toDF("article_id", "journal_issn", "n_cites", "year")
    val authorship = Seq(
      ("a1", "author1"), ("a2", "author1"), ("a3", "author1"),
      ("b1", "author2"), ("b2", "author2"),
      ("c1", "author3"),
    ).toDF("article_id", "author_id")

    import org.apache.spark.sql.functions.{col, count, floor, sum}
    val k = 2
    // q3's metric (integer-division avg_cites) without the trailing limit:
    // author2's years tie at 6, and author1's tie at 10 → 4 argmax rows
    val untruncated = graft.functions.GroupOps.argmaxPerGroup(
      author.orderBy("rank_total_pubs").limit(k)
        .select(col("author_id"))
        .join(authorship, Seq("author_id"))
        .join(articles, Seq("article_id"))
        .groupBy("author_id", "year")
        .agg(floor(sum(col("n_cites")).cast("long") / count("year")).as("avg_cites")),
      Seq("author_id"), col("avg_cites"))
    assert(untruncated.count() > k, "fixture must put a tie inside the top-k")

    val q3 = ArxivQueries.q3MostProductiveYear(author, authorship, articles, k = Some(k))
    assert(q3.count() == k.toLong)
    val q4 = ArxivQueries.q4MostInfluentialYear(author, authorship, articles, k = Some(k))
    assert(q4.count() == k.toLong)
  }
}
