package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CoOccurSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    // key "hot" is held by 5 items → 10 pairs if unbounded
    ("hot", 1), ("hot", 2), ("hot", 3), ("hot", 4), ("hot", 5),
    ("k1", 1), ("k1", 2), ("k1", 3),
    ("k2", 2), ("k2", 3),
    ("k2", 2) // duplicate input row — must not double-count
  ).toDF("k", "item")

  test("pairs: distinct input, ordered pairs, shared-key counts") {
    val got = CoOccur.pairs(df, "k", "item")
      .as[(Int, Int, Long)].collect().toSet
    // k1 pairs: (1,2)(1,3)(2,3); k2 pairs: (2,3); hot: all 10
    assert(got.contains((2, 3, 3L))) // hot + k1 + k2
    assert(got.contains((1, 2, 2L))) // hot + k1
    assert(got.contains((4, 5, 1L))) // hot only
    assert(got.size == 10)
  }

  test("hot-key bound drops pathological keys; others unchanged") {
    val got = CoOccur.pairs(df, "k", "item", maxItemsPerKey = 4)
      .as[(Int, Int, Long)].collect().toSet
    assert(got == Set((1, 2, 1L), (1, 3, 1L), (2, 3, 2L)),
      s"expected only k1/k2 pairs, got $got")
  }

  test("minShared filters pair counts after the bound") {
    val got = CoOccur.pairs(df, "k", "item", minShared = 2, maxItemsPerKey = 4)
      .as[(Int, Int, Long)].collect().toSet
    assert(got == Set((2, 3, 2L)))
  }

  test("pairsViaGroups (HOF and codegen-expr forms) is pair-for-pair identical to the self-join form") {
    // same fixture, bound active (hot key dropped) and minShared applied:
    // all three formulations must agree on the exact multiset
    val expected = Set((1, 2, 1L), (1, 3, 1L), (2, 3, 2L))
    val join = CoOccur.pairs(df, "k", "item", 1L, 4L)
      .as[(Int, Int, Long)].collect().toSet
    val hof = CoOccur.pairsViaGroups(df, "k", "item", 1L, 4L, viaExpr = false)
      .as[(Int, Int, Long)].collect().toSet
    val viaExpr = CoOccur.pairsViaGroups(df, "k", "item", 1L, 4L, viaExpr = true)
      .as[(Int, Int, Long)].collect().toSet
    assert(join == expected)
    assert(hof == expected)
    assert(viaExpr == expected)
    // unbounded request is a contract violation for the grouped form
    intercept[IllegalArgumentException] {
      CoOccur.pairsViaGroups(df, "k", "item", 1L, 0L)
    }
  }

  test("PairCombosExpr equals the HOF emitter element-for-element (order included)") {
    // the expression's exactness contract: same structs in the same
    // (i asc, j asc) order as flatten/transform/slice — checked on the
    // raw arrays (longs and strings), not just the aggregated pairs,
    // including the n<2 edge cases
    val arrs = Seq(
      Seq(1L, 2L, 3L, 4L), Seq(7L), Seq.empty[Long], Seq(5L, 5L), Seq(2L, 9L))
      .toDF("items")
    val hofCol = expr(
      """flatten(transform(items, (x, i) ->
        |  transform(slice(items, i + 2, size(items) - i - 1),
        |    y -> struct(x AS item_a, y AS item_b))))""".stripMargin)
    val got = arrs.select(
      graft.functions.PairCombosFn.pairCombos(col("items")).as("e"),
      hofCol.as("h"))
      .selectExpr("cast(e as string) AS es", "cast(h as string) AS hs")
      .as[(String, String)].collect()
    got.foreach { case (e, h) => assert(e == h, s"expr $e != hof $h") }
    val strs = Seq(Seq("b", "a", "c"), Seq("x")).toDF("items")
    val gotS = strs.select(
      graft.functions.PairCombosFn.pairCombos(col("items")).as("e"),
      hofCol.as("h"))
      .selectExpr("cast(e as string) AS es", "cast(h as string) AS hs")
      .as[(String, String)].collect()
    gotS.foreach { case (e, h) => assert(e == h, s"expr $e != hof $h") }
  }

  test("q21's cap=64 is inert on the fixture (capped == uncapped)") {
    val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_partkey", "l_suppkey")
    val capped = CoOccur.pairs(li, "l_partkey", "l_suppkey",
      minShared = 2, maxItemsPerKey = 64)
      .as[(Long, Long, Long)].collect().toSet
    val uncapped = CoOccur.pairs(li, "l_partkey", "l_suppkey", minShared = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped == uncapped && capped.nonEmpty)
  }
}
