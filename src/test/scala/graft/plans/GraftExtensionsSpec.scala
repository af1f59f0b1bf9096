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
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
