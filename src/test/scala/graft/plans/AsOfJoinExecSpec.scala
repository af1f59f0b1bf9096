package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.AsOfJoin

/** The dedicated physical as-of operator must be row-for-row identical to
  * the composed window formulation (which is DuckDB-oracle-matched by
  * q42) — the composed form IS the oracle here. */
class AsOfJoinExecSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  private def canon(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq
      .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))))
      .sortBy(_.mkString("|"))

  private def assertSame(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, rightCols: Map[String, String]): Unit = {
    val composed = AsOfJoin.backward(left, right, on, leftTs, rightTs, rightCols)
    val exec = AsOfJoin.backwardExec(left, right, on, leftTs, rightTs, rightCols)
    val cols = composed.columns // same column SET; order differs by contract
    assert(canon(exec.select(cols.map(col): _*)) == canon(composed),
      "exec disagrees with the oracle-matched composed form")
  }

  test("exec equals composed form on the basic fixture") {
    val left = Seq(
      (1L, ts(10), "p1"), (1L, ts(30), "p2"), (1L, ts(5), "p0"), (2L, ts(20), "p3"),
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts(10), 100.0), (1L, ts(25), 200.0), (1L, ts(31), 300.0),
    ).toDF("user_id", "ts", "price")
    assertSame(left, right, Seq("user_id"), "ts", "ts",
      Map("ts" -> "m_ts", "price" -> "m_price"))
  }

  test("exec honors the greatest-payload tie-break, including NULL fields") {
    val left = Seq((1L, ts(20), "probe")).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts(10), Some("x"), 6),
      (1L, ts(10), None: Option[String], 7),
    ).toDF("user_id", "ts", "src", "qty")
    assertSame(left, right, Seq("user_id"), "ts", "ts",
      Map("src" -> "m_src", "qty" -> "m_qty"))
    val got = AsOfJoin.backwardExec(left, right, Seq("user_id"), "ts", "ts",
        Map("src" -> "m_src", "qty" -> "m_qty"))
      .select("m_qty", "m_src").as[(Int, Option[String])].head()
    assert(got == ((7, None)))
  }

  test("exec equals composed form on 1000 random rows with null keys and values") {
    val rnd = new scala.util.Random(17L)
    def side(n: Int) = (1 to n).map { i =>
      (if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(8).toLong),
        ts(rnd.nextInt(500)),
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(100).toDouble))
    }
    val left = side(600).toDF("k", "ts", "lv")
    val right = side(400).toDF("k", "ts", "rv")
      .withColumnRenamed("lv", "rv")
    assertSame(left, right, Seq("k"), "ts", "ts",
      Map("ts" -> "m_ts", "rv" -> "m_rv"))
  }

  test("plan contains the dedicated exec and co-partitioned exchanges") {
    val left = Seq((1L, ts(1), "a")).toDF("user_id", "ts", "t")
    val right = Seq((1L, ts(0), 1.0)).toDF("user_id", "ts", "v")
    val df = AsOfJoin.backwardExec(left, right, Seq("user_id"), "ts", "ts",
      Map("v" -> "mv"))
    df.count()
    val plan = df.queryExecution.executedPlan
    val nodes = plan.collectWithSubqueries { case p => p }.flatMap {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect { case p => p }
      case p => Seq(p)
    }
    assert(nodes.exists(_.isInstanceOf[AsOfJoinExec]), s"no AsOfJoinExec in:\n$plan")
    assert(nodes.count(_.isInstanceOf[
      org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]) == 2,
      "expected one key exchange per side")
  }

  test("exec matches composed on the real events table (q42 shape)") {
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "value")
    val composed = AsOfJoin.backward(purchases, clicks, Seq("user_id"), "ts", "ts",
      Map("ts" -> "click_ts", "value" -> "click_value"))
    val exec = AsOfJoin.backwardExec(purchases, clicks, Seq("user_id"), "ts", "ts",
      Map("ts" -> "click_ts", "value" -> "click_value"))
    assert(canon(exec.select(composed.columns.map(col): _*)) == canon(composed))
  }
}
