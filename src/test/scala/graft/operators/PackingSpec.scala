package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("greedy packing fills shards in order and resets per group") {
    val df = Seq(
      // group a, capacity 10: 4+5 -> shard 0, 3+6 -> shard 1, 9 -> shard 2
      ("a", 1L, 4L), ("a", 2L, 5L), ("a", 3L, 3L), ("a", 4L, 6L), ("a", 5L, 9L),
      // group b starts back at shard 0
      ("b", 1L, 10L), ("b", 2L, 1L),
    ).toDF("g", "id", "sz")
    val got = Packing.packGreedy(df, "g", "id", "sz", 10L)
      .orderBy("g", "id")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 1L, 4L, 0L), ("a", 2L, 5L, 0L), ("a", 3L, 3L, 1L),
      ("a", 4L, 6L, 1L), ("a", 5L, 9L, 2L),
      ("b", 1L, 10L, 0L), ("b", 2L, 1L, 1L)))
  }

  test("oversize rows get a shard of their own without derailing the scan") {
    val df = Seq(("g", 1L, 3L), ("g", 2L, 50L), ("g", 3L, 4L), ("g", 4L, 5L))
      .toDF("g", "id", "sz")
    val got = Packing.packGreedy(df, "g", "id", "sz", 10L)
      .orderBy("id").select("shard").as[Long].collect().toSeq
    // 3 -> shard 0; 50 oversize -> shard 1 alone; 4+5 -> shard 2
    assert(got == Seq(0L, 1L, 2L, 2L))
  }

  test("matches a direct sequential simulation on random inputs") {
    val rnd = new scala.util.Random(99)
    (1 to 5).foreach { _ =>
      val cap = 10L + rnd.nextInt(40)
      val rows = (1 to 150).map { i =>
        (s"g${rnd.nextInt(5)}", i.toLong, 1L + rnd.nextInt(60))
      }
      val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
        var shard = 0L; var fill = 0L; var first = true
        rs.sortBy(_._2).map { case (_, id, sz) =>
          if (first) { first = false; fill = sz }
          else if (fill + sz <= cap) { fill += sz }
          else { shard += 1; fill = sz }
          (g, id, sz, shard)
        }
      }.toSet
      val got = Packing.packGreedy(rows.toDF("g", "id", "sz"), "g", "id", "sz", cap)
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got == want, s"cap=$cap")
    }
  }

  test("capped packing splits a monster group across >1 sub-group, stays deterministic") {
    // one group of 400 rows; maxGroupRows=100 -> 4 sub-groups
    val rows = (1L to 400L).map(i => ("mono", i, 1L + i % 7))
    val a = Packing.packGreedyCapped(rows.toDF("g", "id", "sz").repartition(1),
        "g", "id", "sz", 20L, 100L)
      .orderBy("id").as[(String, Long, Long, Long)].collect().toSeq
    val b = Packing.packGreedyCapped(rows.toDF("g", "id", "sz").repartition(16, col("id")),
        "g", "id", "sz", 20L, 100L)
      .orderBy("id").as[(String, Long, Long, Long)].collect().toSeq
    assert(a == b, "shard ids independent of physical input partitioning")
    // parallelism: the packing stage keys on (g, sub); with 4 sub-groups
    // the monster group engages up to 4 tasks instead of 1
    val shards = a.map(_._4)
    val byShard = a.groupBy(_._4).view.mapValues(_.map(_._3).sum).toMap
    byShard.foreach { case (s, fill) =>
      assert(fill <= 20L, s"shard $s overfilled: $fill")
    }
    // dense 0-based shard range per group
    assert(shards.min == 0L && shards.distinct.sorted == (0L to shards.max).toSeq)
    // bounded deviation (next-fit bound per sub-group, sizes < capacity):
    // shard count < 2*sum(size)/capacity + nSubs
    val total = rows.map(_._3).sum.toDouble
    assert(shards.max + 1 < 2 * total / 20L + 4,
      s"shards ${shards.max + 1} vs next-fit bound ${2 * total / 20L + 4}")
    // and it stays in the same ballpark as exact greedy on this data
    val exactShards = Packing.packGreedy(rows.toDF("g", "id", "sz"), "g", "id", "sz", 20L)
      .agg(max("shard")).as[Long].head() + 1
    assert(shards.max + 1 <= exactShards + 2 * 4,
      s"capped ${shards.max + 1} vs exact greedy $exactShards")
    // and the sub-group split is real: >1 distinct portable-hash bucket
    // (recompute hash16 % 4 in plain Scala from the md5 hex, as any
    // engine would)
    def hash16(id: Long): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(hex.take(4), 16)
    }
    val nSubBuckets = rows.map(r => hash16(r._2) % 4).distinct.size
    assert(nSubBuckets > 1, "salting actually splits the group")
  }

  test("capped packing with a large cap matches exact greedy for small groups") {
    val rows = (1L to 120L).map(i => (s"g${i % 5}", i, 1L + i % 13))
    val exact = Packing.packGreedy(rows.toDF("g", "id", "sz"), "g", "id", "sz", 40L)
      .orderBy("g", "id").as[(String, Long, Long, Long)].collect().toSeq
    val capped = Packing.packGreedyCapped(rows.toDF("g", "id", "sz"), "g", "id", "sz", 40L,
        maxGroupRows = 1000L)
      .orderBy("g", "id").as[(String, Long, Long, Long)].collect().toSeq
    assert(capped == exact, "<=maxGroupRows groups take the single-scan path result")
  }

  test("shard assignment is independent of input partitioning") {
    val rows = (1L to 200L).map(i => (s"g${i % 7}", i, 1L + i % 13))
    val a = Packing.packGreedy(rows.toDF("g", "id", "sz").repartition(1), "g", "id", "sz", 40L)
      .orderBy("g", "id").as[(String, Long, Long, Long)].collect().toSeq
    val b = Packing.packGreedy(rows.toDF("g", "id", "sz").repartition(16, col("id")), "g", "id", "sz", 40L)
      .orderBy("g", "id").as[(String, Long, Long, Long)].collect().toSeq
    assert(a == b)
    // every shard except possibly the last per group respects capacity...
    val byShard = a.groupBy(r => (r._1, r._4)).view.mapValues(_.map(_._3).sum)
    byShard.foreach { case ((g, s), fill) =>
      assert(fill <= 40L, s"shard ($g,$s) overfilled: $fill") // sizes <= 13 < capacity
    }
  }
}
