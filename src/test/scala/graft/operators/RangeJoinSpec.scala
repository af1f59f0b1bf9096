package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 5L), (2L, 10L), (3L, 17L), (4L, 100L),
  ).toDF("pid", "p")
  private lazy val intervals = Seq(
    (10L, 0L, 9L),    // covers p=5
    (11L, 5L, 10L),   // covers p=5, p=10 (inclusive ends)
    (12L, 15L, 30L),  // covers p=17
    (13L, 0L, 200L),  // covers everything (degenerate long interval)
  ).toDF("iid", "s", "e")

  private def pairsWith(width: Long, maxBuckets: Long = 0L): Set[(Long, Long)] =
    RangeJoin.pointInInterval(points, intervals, "p", "s", "e", width, maxBuckets)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  private val exact = Set(
    (1L, 10L), (1L, 11L), (1L, 13L),
    (2L, 11L), (2L, 13L),
    (3L, 12L), (3L, 13L),
    (4L, 13L))

  test("bucketed range join equals the exact BETWEEN semantics") {
    assert(pairsWith(width = 7) == exact)
  }

  test("result is invariant to bucket width (width only tunes the plan)") {
    assert(pairsWith(1) == exact)
    assert(pairsWith(3) == exact)
    assert(pairsWith(1000) == exact) // one bucket = degenerate all-pairs
  }

  test("interval ends are inclusive on both sides") {
    val got = RangeJoin.pointInInterval(
      Seq((1L, 10L)).toDF("pid", "p"),
      Seq((20L, 10L, 10L)).toDF("iid", "s", "e"),
      "p", "s", "e", width = 4)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 20L)))
  }

  test("maxBucketsPerInterval drops degenerate long intervals") {
    // width 7: interval 13 spans 0..200 → 29 buckets; the bound at 10
    // drops it, everything else is unaffected
    assert(pairsWith(width = 7, maxBuckets = 10) ==
      exact.filterNot(_._2 == 13L))
  }

  test("column-name collisions are rejected up front") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points,
        intervals.withColumnRenamed("iid", "pid"), "p", "s", "e", 7)
    }
  }

  test("plan is a hash equi-join on the bucket, not a nested loop") {
    val df = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 7)
    val plan = df.queryExecution.executedPlan
    val nested = plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(nested.isEmpty, s"range join fell back to nested loop:\n$plan")
  }
}
