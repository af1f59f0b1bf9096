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

  test("pairsViaGroups is pair-for-pair identical to the self-join form") {
    // same fixture, bound active (hot key dropped) and minShared applied:
    // both formulations must agree on the exact multiset
    def run(fn: (org.apache.spark.sql.DataFrame, String, String, Long, Long) =>
        org.apache.spark.sql.DataFrame) =
      fn(df, "k", "item", 1L, 4L).as[(Int, Int, Long)].collect().toSet
    assert(run(CoOccur.pairs) == run(CoOccur.pairsViaGroups))
    assert(run(CoOccur.pairsViaGroups) == Set((1, 2, 1L), (1, 3, 1L), (2, 3, 2L)))
    // unbounded request is a contract violation for the grouped form
    intercept[IllegalArgumentException] {
      CoOccur.pairsViaGroups(df, "k", "item", 1L, 0L)
    }
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
