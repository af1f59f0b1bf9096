package graft.operators

import scala.collection.mutable

/** Single in-memory reference implementation of the integer PageRank
  * recurrence, shared by PageRankSpec and AnalyticsQueriesSpec so the
  * two suites cannot pin different algorithms. Mirrors
  * [[PageRank.ranks]] exactly: every vertex in the edge list is ranked,
  * every vertex keeps the damping base each iteration, in-sums from
  * unranked sources are impossible (sources are vertices), and all
  * arithmetic is integral. */
object PageRankReference {
  def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size
    val init = PageRank.Scale / n
    val base = 15L * init / 100L
    var rank: Map[Long, Long] = nodes.iterator.map(_ -> init).toMap
    for (_ <- 1 to iters) {
      val contrib = mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, t) <- edges) contrib(t) += rank(s) / deg(s)
      rank = nodes.iterator.map(v => v -> (base + 85L * contrib(v) / 100L)).toMap
    }
    rank
  }
}
