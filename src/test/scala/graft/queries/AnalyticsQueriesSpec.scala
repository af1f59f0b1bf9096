package graft.queries

import graft.SparkSpec
import graft.operators.PageRank
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Semantic checks of the OLAP/event/graph analytics queries on the
  * sf0.001 fixtures — properties the DuckDB hash-match can't express
  * (internal consistency between grouping levels, funnel ordering,
  * exact agreement with an independent in-memory PageRank). */
class AnalyticsQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("q64 rollup levels are mutually consistent") {
    val rows = AnalyticsQueries.q64Rollup(spark, d)
      .select("l_returnflag", "l_linestatus", "n", "gid")
      .as[(Option[String], Option[String], Long, Int)].collect()
    val detail = rows.filter(_._4 == 0)
    val subtot = rows.filter(_._4 == 1)
    val grand = rows.filter(_._4 == 3)
    assert(grand.length == 1 && grand.head._1.isEmpty && grand.head._2.isEmpty)
    assert(grand.head._3 == detail.map(_._3).sum, "grand total = sum of detail")
    subtot.foreach { case (flag, ls, n, _) =>
      assert(ls.isEmpty)
      assert(n == detail.filter(_._1 == flag).map(_._3).sum, s"subtotal $flag")
    }
    // rollup (not cube): no linestatus-only subtotals
    assert(rows.forall(r => !(r._1.isEmpty && r._4 == 2)))
  }

  test("q65 pivot cells equal independently filtered sums") {
    val pv = AnalyticsQueries.q65Pivot(spark, d)
      .as[(String, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val li = graft.core.Tables.lineitem(spark, d)
    for (flag <- Seq("A", "N", "R"); ls <- pv.keys) {
      val want = li.filter(col("l_returnflag") === flag && col("l_linestatus") === ls)
        .agg(round(sum("l_quantity"), 2)).as[Option[Double]].head()
      val got = flag match {
        case "A" => pv(ls)._2; case "N" => pv(ls)._3; case "R" => pv(ls)._4
      }
      assert(got == want, s"cell ($ls, $flag)")
    }
  }

  test("q66 funnel stages are strictly ordered and stage counts are monotone") {
    val rows = AnalyticsQueries.q66Funnel(spark, d)
      .select(col("user_id"), col("view_ts").cast("long"),
        col("click_ts").cast("long"), col("purchase_ts").cast("long"), col("stage"))
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, v, c, p, stage) =>
      // a later stage implies every earlier one, strictly increasing in time
      assert(c.isEmpty || (v.nonEmpty && c.get > v.get), s"user $u click<=view")
      assert(p.isEmpty || (c.nonEmpty && p.get > c.get), s"user $u purchase<=click")
      val want = if (p.nonEmpty) 3 else if (c.nonEmpty) 2 else if (v.nonEmpty) 1 else 0
      assert(stage == want, s"user $u stage")
    }
    val byStage = (0 to 3).map(k => rows.count(_._5 >= k))
    assert(byStage == byStage.sorted.reverse, "funnel must narrow monotonically")
    assert(rows.exists(_._5 == 3), "fixture must contain full conversions")
  }

  test("q67 cohort offset-0 cell counts the whole cohort exactly once") {
    val rows = AnalyticsQueries.q67CohortRetention(spark, d)
      .as[(String, Int, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 >= 0))
    val cohortSizes = graft.core.Tables.events(spark, d)
      .groupBy("user_id").agg(min("ts").as("first"))
      .select(date_format(to_date(date_trunc("week", col("first"))), "yyyy-MM-dd").as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val offset0 = rows.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    assert(offset0 == cohortSizes, "every user is active in their own first week")
    rows.foreach { case (w, off, n) =>
      assert(n <= cohortSizes(w), s"cohort $w offset $off exceeds cohort size")
    }
  }

  test("q68 pagerank matches an independent in-memory integer PageRank exactly") {
    val sp = graft.core.Tables.lineitem(spark, d)
      .select((col("l_suppkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
      .distinct().as[(Long, Long)].collect()
    val edges = sp ++ sp.map { case (s, t) => (t, s) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val n = deg.size
    val init = PageRank.Scale / n
    val base = 15L * init / 100L
    var rank: Map[Long, Long] = deg.keysIterator.map(_ -> init).toMap
    for (_ <- 1 to AnalyticsQueries.PrIters) {
      val contrib = mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, t) <- edges) contrib(t) += rank(s) / deg(s)
      rank = contrib.iterator.map { case (k, v) => k -> (base + 85L * v / 100L) }.toMap
    }
    val got = AnalyticsQueries.q68PageRank(spark, d)
      .as[(Long, Long)].collect().toMap
    assert(got == rank, "distributed and in-memory integer PageRank must agree bit-for-bit")
    // parts with more suppliers rank higher: spot the extremes make sense
    assert(got.values.max > got.values.min, "graph must not be rank-uniform")
  }
}
