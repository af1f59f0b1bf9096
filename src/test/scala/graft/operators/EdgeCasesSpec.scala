package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: every operator must return an EMPTY,
  * correctly-schemed result on empty input — not throw. At 100 TB an
  * empty partition, an all-filtered source, or a first-run-of-the-day
  * delta is routine, and an operator that NPEs or divides by zero on it
  * takes the whole job down. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def emptyEdges = Seq.empty[(Long, Long)].toDF("a", "b")

  test("PageRank on an empty graph returns empty ranks, not a zero division") {
    val got = PageRank.ranks(spark,
      Seq.empty[(Long, Long)].toDF("src", "dst"), iters = 3)
    assert(got.columns.toSeq == Seq("node", "rank"))
    assert(got.count() == 0)
  }

  test("triangle enumeration and per-vertex counts are empty on an empty graph") {
    assert(Triangles.enumerate(emptyEdges).count() == 0)
    assert(Triangles.perVertex(emptyEdges).count() == 0)
  }

  test("co-occurrence pairs are empty on empty input (with and without bound)") {
    val in = Seq.empty[(Long, Long)].toDF("key", "item")
    assert(CoOccur.pairs(in, "key", "item").count() == 0)
    assert(CoOccur.pairs(in, "key", "item", maxItemsPerKey = 8).count() == 0)
  }

  test("dedup operators pass empty corpora through") {
    assert(Dedup.exact(emptyDocs).count() == 0)
    assert(Dedup.ngramJaccard(emptyDocs).count() == 0)
  }

  test("as-of join with an empty right side keeps every left row unmatched") {
    val left = Seq((1L, 10L, 100L)).toDF("k", "ts", "payload")
    val right = Seq.empty[(Long, Long, Double)].toDF("k", "ts", "v")
    val got = AsOfJoin.backward(left, right, on = Seq("k"),
      leftTs = "ts", rightTs = "ts", rightCols = Map("v" -> "right_v"))
    assert(got.count() == 1)
    assert(got.select("right_v").first().isNullAt(0))
  }

  test("greedy packing of an empty table yields no shards") {
    val in = Seq.empty[(String, Long, Long)].toDF("src", "doc_id", "n_tokens")
    assert(Packing.packGreedy(in, "src", "doc_id", "n_tokens", 256L).count() == 0)
  }

  test("single-node graph: PageRank keeps full mass, no triangles") {
    // one undirected edge = smallest nonempty graph
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val ranks = PageRank.ranks(spark, e, 2).as[(Long, Long)].collect().toMap
    assert(ranks.keySet == Set(1L, 2L))
    // symmetric 2-cycle: both nodes keep the initial share exactly
    assert(ranks(1L) == ranks(2L))
    assert(Triangles.enumerate(Seq((1L, 2L)).toDF("a", "b")).count() == 0)
  }
}
