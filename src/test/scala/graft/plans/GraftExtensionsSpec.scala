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
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
