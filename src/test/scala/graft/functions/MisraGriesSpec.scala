package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def summarize(items: Seq[String], k: Int, parts: Int): Map[String, Long] =
    items.toDF("t").repartition(parts)
      .agg(MisraGries(col("t"), k).as("mg"))
      .as[Map[String, Long]].head()

  test("guaranteed heavy hitters survive any partitioning; estimates undercount by <= n/(k+1)") {
    val rnd = new scala.util.Random(21)
    val heavy = Seq.fill(400)("whale") ++ Seq.fill(300)("elephant")
    val noise = Seq.fill(800)(s"small${rnd.nextInt(200)}")
    val items = rnd.shuffle(heavy ++ noise)
    val n = items.size
    val k = 10
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    Seq(1, 4, 16).foreach { parts =>
      val mg = summarize(items, k, parts)
      assert(mg.size <= k)
      exact.foreach { case (t, c) =>
        if (c > n.toDouble / (k + 1)) {
          assert(mg.contains(t), s"heavy hitter $t missing at parts=$parts")
          assert(mg(t) <= c && c - mg(t) <= n.toDouble / (k + 1),
            s"estimate for $t out of bounds at parts=$parts: ${mg(t)} vs $c")
        }
      }
    }
  }

  test("k >= distinct items makes the sketch exact") {
    val items = Seq("a", "a", "b", "c", "c", "c")
    val mg = summarize(items, k = 8, parts = 3)
    assert(mg == Map("a" -> 2L, "b" -> 1L, "c" -> 3L))
  }
}
