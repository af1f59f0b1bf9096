package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected graph given as canonical edges
  * (a < b, one row per edge).
  *
  * Enumeration is the standard wedge-close join: wedges (a,b,c) with
  * a<b<c from two copies of the edge list anchored at the smallest
  * vertex, closed by a third join probing (b,c). With id-canonical
  * edges the wedge fanout concentrates on low-id vertices; the
  * classical fix at full scale is DEGREE ordering (orient each edge
  * toward its higher-degree endpoint, bounding per-vertex out-degree by
  * O(sqrt m)). Callers here bound the input instead — a top-k edge
  * subgraph ([[graft.queries.AnalyticsQueries.q74Triangles]]) keeps the
  * join volume constant at any corpus scale while staying bit-exact
  * reproducible in SQL, which degree ordering also is (degrees are
  * exact counts; ties break on vertex id) if the full graph is wanted.
  */
object Triangles {

  /** Triangles (x,y,z), x<y<z, from canonical edges (a<b). */
  def enumerate(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    e.as("ab")
      .join(e.as("ac"),
        col("ab.a") === col("ac.a") && col("ab.b") < col("ac.b"))
      .select(col("ab.a").as("x"), col("ab.b").as("y"), col("ac.b").as("z"))
      .join(e.as("bc"),
        col("y") === col("bc.a") && col("z") === col("bc.b"))
      .select("x", "y", "z")
  }

  /** Per-vertex triangle participation counts (vertices in >=1 triangle). */
  def perVertex(edges: DataFrame): DataFrame =
    enumerate(edges)
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
}
