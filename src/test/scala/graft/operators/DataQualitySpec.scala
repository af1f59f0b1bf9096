package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), Some(10.0)),
    (2L, Some("b"), None),
    (3L, None, Some(30.0)),
    (3L, Some("b"), Some(30.0)),
  ).toDF("id", "s", "v")

  test("profile reports per-column null/distinct/min/max from one pass") {
    val got = DataQuality.profile(df, Seq("id", "s", "v"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 4L, 0L, 3L, Some("1"), Some("3"))))
    assert(got("s") == (("s", 4L, 1L, 2L, Some("a"), Some("b"))))
    assert(got("v") == (("v", 4L, 1L, 2L, Some("10.0"), Some("30.0"))))
  }

  test("profile of an empty frame reports zero counts and null extrema") {
    val got = DataQuality.profile(df.filter(col("id") < 0), Seq("id", "s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 0L, 0L, 0L, None, None)))
    assert(got("s") == (("s", 0L, 0L, 0L, None, None)))
  }

  test("profileApprox matches exact profile except n_distinct stays within rsd") {
    val wide = (1L to 2000L).map(i => (i, s"s${i % 37}", i.toDouble % 11))
      .toDF("id", "s", "v")
    val exact = DataQuality.profile(wide, Seq("id", "s", "v"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    val approx = DataQuality.profileApprox(wide, Seq("id", "s", "v"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    for (c <- Seq("id", "s", "v")) {
      val (e, a) = (exact(c), approx(c))
      assert(a._2 == e._2 && a._3 == e._3 && a._5 == e._5 && a._6 == e._6,
        s"$c: counts and extrema are exact in both variants")
      val err = math.abs(a._4 - e._4).toDouble / math.max(e._4, 1L)
      assert(err <= 0.15, s"$c: approx distinct ${a._4} vs exact ${e._4}")
    }
  }

  test("checks evaluate violation counts and pass/fail in one pass") {
    import DataQuality.Check
    val got = DataQuality.checks(df, Seq(
      Check("pk_unique", count(lit(1)) - count_distinct(col("id")), _ === 0),
      Check("s_complete", count(lit(1)) - count(col("s")), _ === 0),
      Check("v_nonneg", sum(when(col("v") < 0, 1L).otherwise(0L)), _ === 0)))
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("pk_unique") == ((1L, false)), "id 3 repeats")
    assert(got("s_complete") == ((1L, false)))
    assert(got("v_nonneg") == ((0L, true)))
  }

  test("orphanCount counts fact rows without a dim match, null keys included") {
    val fact = Seq(Some(1L), Some(2L), Some(9L), None).toDF("k")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val n = DataQuality.orphanCount(fact, "k", dim, "pk")
      .as[Long].head()
    assert(n == 2L, "the unmatched key and the null key are both orphans")
  }

  test("observed metrics ride along the consuming action — no second pass") {
    val stage = df.filter(col("v") >= 0)
    val (out, obs) = DataQuality.observed(stage, "stage_metrics",
      count(lit(1)).as("rows"),
      sum(when(col("s").isNull, 1L).otherwise(0L)).as("null_s"),
      round(sum("v"), 2).as("total_v"))
    val dir = java.nio.file.Files.createTempDirectory("obs_out").toString
    out.write.mode("overwrite").parquet(dir) // the ONLY action that runs
    val m = obs.get
    val (wantRows, wantNulls, wantTotal) = stage
      .agg(count(lit(1)), sum(when(col("s").isNull, 1L).otherwise(0L)), round(sum("v"), 2))
      .as[(Long, Long, Double)].head()
    assert(m("rows") == wantRows && m("null_s") == wantNulls && m("total_v") == wantTotal)
    // and the written output is the observed frame
    assert(spark.read.parquet(dir).count() == wantRows)
  }
}
