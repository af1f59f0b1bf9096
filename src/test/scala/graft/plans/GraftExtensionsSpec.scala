package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("transliterate is usable from SQL via SparkSessionExtensions") {
    // extensions bind at session build time → detach any active session so
    // getOrCreate builds a fresh one (sharing the JVM's SparkContext), and
    // restore afterwards so other suites keep their session.
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-spec")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import spark.implicits._
      Seq("Šrámek", "Møller").toDF("name").createOrReplaceTempView("names")
      val got = spark.sql("SELECT transliterate(name) AS a FROM names ORDER BY a")
        .as[String].collect().toSeq
      assert(got == Seq("Moller", "Sramek"))

      // char_counts from SQL: one-pass histogram, literal alphabet
      val cc = spark.sql("SELECT char_counts('abca', 'abc') AS c")
        .as[Seq[Int]].head()
      assert(cc == Seq(2, 1, 1))
      val ccErr = intercept[Exception] {
        spark.sql("SELECT char_counts('x', lower('AB')) AS c").collect()
      }
      assert(ccErr.getMessage.contains("literal"),
        s"non-literal alphabet must be rejected: ${ccErr.getMessage}")

      // ArgmaxRewriteRule: the reference's theta-join argmax plan becomes a
      // window — no Join in the optimized plan, same rows incl. ties
      Seq(("a", 1, 10), ("a", 2, 30), ("a", 3, 30), ("b", 4, 5))
        .toDF("g", "id", "m").createOrReplaceTempView("t")
      val q =
        """SELECT f.g, f.id, f.m FROM t f
          |LEFT JOIN t f1 ON f.g = f1.g AND f.m < f1.m
          |WHERE f1.g IS NULL""".stripMargin
      val df = spark.sql(q)
      val optimized = df.queryExecution.optimizedPlan
      assert(!optimized.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.Join]),
        s"theta-join argmax not rewritten:\n$optimized")
      assert(optimized.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.Window]))
      val rows = df.as[(String, Int, Int)].collect().toSet
      assert(rows == Set(("a", 2, 30), ("a", 3, 30), ("b", 4, 5)))

      // NULL keys and NULL metrics (ADVICE r1, high): the theta-join keeps
      // every row whose key or metric is NULL (the join condition never
      // matches); the rewrite must reproduce that multiset exactly.
      Seq[(Option[String], Int, Option[Int])](
        (Some("a"), 1, Some(10)), (Some("a"), 2, Some(30)),
        (Some("a"), 3, None),              // NULL metric → kept
        (None, 4, Some(99)), (None, 5, Some(1)), // NULL keys → all kept
        (Some("b"), 6, None), (Some("b"), 7, None), // all-NULL group → all kept
        (Some("c"), 8, Some(7)))
        .toDF("g", "id", "m").createOrReplaceTempView("tn")
      val qn =
        """SELECT f.g, f.id, f.m FROM tn f
          |LEFT JOIN tn f1 ON f.g = f1.g AND f.m < f1.m
          |WHERE f1.g IS NULL""".stripMargin
      val dfn = spark.sql(qn)
      assert(!dfn.queryExecution.optimizedPlan.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.Join]),
        "nullable argmax not rewritten")
      val gotN = dfn.as[(Option[String], Int, Option[Int])].collect().toSet
      assert(gotN == Set(
        (Some("a"), 2, Some(30)), (Some("a"), 3, None),
        (None, 4, Some(99)), (None, 5, Some(1)),
        (Some("b"), 6, None), (Some("b"), 7, None),
        (Some("c"), 8, Some(7))),
        s"null-handling mismatch: $gotN")
      // and the same query WITHOUT the rule agrees (executed ground truth,
      // not just the hand-derived set): fresh session, no extensions
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val plainSpark = SparkSession.builder()
        .master("local[2]").appName("graft-ext-spec-plain")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      import org.apache.spark.sql.{Row => SRow}
      import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
      val schema = StructType(Seq(StructField("g", StringType),
        StructField("id", IntegerType, nullable = false), StructField("m", IntegerType)))
      plainSpark.createDataFrame(java.util.Arrays.asList(
        SRow("a", 1, 10), SRow("a", 2, 30), SRow("a", 3, null),
        SRow(null, 4, 99), SRow(null, 5, 1), SRow("b", 6, null),
        SRow("b", 7, null), SRow("c", 8, 7)), schema)
        .createOrReplaceTempView("tn")
      val plainDf = plainSpark.sql(qn)
      assert(plainDf.queryExecution.optimizedPlan.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.Join]),
        "control session unexpectedly rewrote the join")
      val plain = plainDf.collect().map(r =>
        (Option(r.getAs[String]("g")), r.getInt(1),
          Option(r.getAs[Integer]("m")).map(_.intValue))).toSet
      assert(gotN == plain)
    } finally {
      // plainSpark shares the JVM-wide SparkContext, so it must not be
      // stop()ed — but it MUST be evicted from the default/active slots:
      // if prevDefault was None, a bare foreach-restore would leave the
      // extension-less session as the JVM default and later suites'
      // getOrCreate would silently reuse it (ADVICE r2).
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
