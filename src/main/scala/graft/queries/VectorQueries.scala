package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Dedup, Similarity}

/** Similarity-search battery over the `embeddings` table (64-dim float
  * vectors). Cosine math folds in double precision left-to-right on both
  * engines, so rounded values hash-match. */
object VectorQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Brute-force cosine top-3 for the first 10 vectors as queries. */
  def q38KnnBrute(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    Similarity.knnBruteForce(e, e.filter(col("vec_id") < 10), k = 3)
      .orderBy("query_id", "rn")
  }

  /** LSH-bucketed approximate top-3 (scale path; deterministic seeded
    * hyperplanes — engine-specific, rows-only check). */
  def q39KnnLsh(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    Similarity.knnLsh(e, e.filter(col("vec_id") < 10), k = 3, nPlanes = 8)
      .orderBy("query_id", "rn")
  }

  /** Embedding near-dup pairs: same-label blocking, cosine ≥ 0.3 (the
    * synthetic corpus has no planted vector dups; τ relaxed to exercise
    * the operator non-trivially). */
  def q40EmbedNearDup(s: SparkSession, d: String): DataFrame =
    Dedup.embeddingNearDup(Tables.embeddings(s, d), threshold = 0.3)
      .orderBy("id_a", "id_b")

  /** IVF (KMeans-cell) approximate top-3, nprobe=1 — the scale path a
    * vector index takes at 10^9 vectors. Seeded, but KMeans internals are
    * engine-specific → rows-only check. */
  def q41KnnIvf(s: SparkSession, d: String): DataFrame =
    Similarity.knnIvf(Tables.embeddings(s, d),
      assigned => assigned.filter(col("vec_id") < 10), k = 3, nCells = 8)
      .orderBy("query_id", "rn")

  val all: Map[String, Q] = Map(
    "q38_knn_bruteforce" -> (q38KnnBrute _),
    "q39_knn_lsh" -> (q39KnnLsh _),
    "q40_embed_neardup" -> (q40EmbedNearDup _),
    "q41_knn_ivf" -> (q41KnnIvf _),
  )

  val oracle: Map[String, String] = Map(
    "q38_knn_bruteforce" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_dot_product(q.v, c.v)
        |      / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 4) AS cos
        |  FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |ranked AS (SELECT query_id, neighbor_id, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rn
        |  FROM pairs)
        |SELECT query_id, neighbor_id, cos, rn FROM ranked
        |WHERE rn <= 3 ORDER BY query_id, rn""".stripMargin,
    "q40_embed_neardup" ->
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.v, b.v)
        |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,
  )
}
