package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("backward as-of join picks the latest right row at or before left.ts") {
    val left = Seq(
      (1L, ts(10), "p1"),
      (1L, ts(30), "p2"),
      (1L, ts(5), "p0"),  // before any right row → null match
      (2L, ts(20), "p3"), // key with no right rows at all
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts(10), 100.0), // equal ts → inclusive match for p1
      (1L, ts(25), 200.0),
      (1L, ts(31), 300.0), // after p2 → never matched
    ).toDF("user_id", "ts", "price")

    val got = AsOfJoin.backward(left, right, Seq("user_id"), "ts", "ts",
        Map("ts" -> "m_ts", "price" -> "m_price"))
      .orderBy("user_id", "ts")
      .select("tag", "m_price")
      .as[(String, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("p0", None),
      ("p1", Some(100.0)), // inclusive equal-ts
      ("p2", Some(200.0)), // latest prior, not the later 300
      ("p3", None)))
  }

  test("as-of join preserves row count of the left side") {
    val left = Seq((1L, ts(1), "a"), (1L, ts(2), "b")).toDF("user_id", "ts", "t")
    val right = Seq((1L, ts(1), 1.0)).toDF("user_id", "ts", "v")
    val got = AsOfJoin.backward(left, right, Seq("user_id"), "ts", "ts",
      Map("v" -> "mv"))
    assert(got.count() == 2)
  }

  test("carried payload always comes from ONE right row, even with NULL fields") {
    // Two right rows at the same (key, ts). The tie-break struct compares
    // (m_qty, m_src) — dst-name order — so (7, NULL) beats (6, 'x'). A
    // per-column carry would skip the winner's NULL src and reach into
    // the loser, delivering (7, 'x'): a row that never existed. The
    // struct carry must deliver the winner verbatim: (7, NULL).
    val left = Seq((1L, ts(20), "probe")).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts(10), Some("x"), 6),
      (1L, ts(10), None: Option[String], 7),
    ).toDF("user_id", "ts", "src", "qty")
    val got = AsOfJoin.backward(left, right, Seq("user_id"), "ts", "ts",
        Map("src" -> "m_src", "qty" -> "m_qty"))
      .select("m_qty", "m_src")
      .as[(Int, Option[String])].head()
    assert(got == ((7, None)), s"payload mixed across right rows: $got")
  }
}
