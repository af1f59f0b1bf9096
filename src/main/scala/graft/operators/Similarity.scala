package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Similarity search over embedding columns.
  *
  * Brute-force top-k is the exactness baseline: queries × corpus with the
  * query side broadcast (query sets are small by construction; the corpus —
  * the 100 TB side — never moves). The LSH variant is the scale path: one
  * shuffle to bucket the corpus, then per-bucket candidate joins; recall is
  * traded via nPlanes. IVF comes in two flavors: KMeans cells (the
  * programmatic scale path) and seeded cells (deterministic, SQL-oracle
  * reproducible, with nprobe > 1).
  *
  * Every candidate pair costs ONE dot product: both sides carry a
  * precomputed `__*n` norm column into the join and cosine is
  * `dot / (normA * normB)` ([[V.cosineFromNorms]]). Recomputing norms
  * per pair (round-1 shape) tripled the pair work — 47 s → the dominant
  * cost of the r1 bench's worst query.
  */
object Similarity {

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Query side is broadcast. */
  def knnBruteForce(corpus: DataFrame, queries: DataFrame, k: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      V.l2Norm(col(vecCol)).as("qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      V.l2Norm(col(vecCol)).as("cn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(V.cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "cos", "rn")
  }

  /** Corpus bucketed by sign-LSH over explicit hyperplanes
    * ([[V.rademacherPlanes]] for SQL-reproducible buckets,
    * [[V.hyperplanes]] for seeded Gaussian ones). */
  def lshBucketsWith(corpus: DataFrame, planes: Array[Array[Double]],
      vecCol: String = "embedding"): DataFrame =
    corpus.withColumn("bucket", V.lshBucket(col(vecCol), planes))

  /** IVF coarse quantizer: KMeans centroids over a (sampled) corpus; each
    * vector is assigned to its nearest centroid's cell. At 100 TB the model
    * fits on the driver (k × dim doubles) and the assignment is a narrow
    * map — one pass, no shuffle. */
  def ivfAssign(corpus: DataFrame, k: Int = 16, seed: Long = 42L,
      vecCol: String = "embedding"): DataFrame = {
    val featurized = corpus.withColumn("__features",
      org.apache.spark.ml.functions.array_to_vector(col(vecCol)))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(seed).setFeaturesCol("__features").setPredictionCol("cell")
      .fit(featurized)
    model.transform(featurized).drop("__features")
  }

  /** IVF approximate top-k over KMeans cells: probe only the query's cell
    * (nprobe=1). KMeans internals are engine-specific — recall is pinned
    * by SimilaritySpec against [[knnBruteForce]]; the hash-verifiable
    * variant is [[knnIvfSeeded]]. */
  def knnIvf(corpus: DataFrame, queryIds: DataFrame => DataFrame, k: Int = 3,
      nCells: Int = 16, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val assigned = ivfAssign(corpus, nCells, vecCol = vecCol)
    val c = assigned.select(col("cell"), col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      V.l2Norm(col(vecCol)).as("cn"))
    val q = broadcast(queryIds(assigned)
      .select(col("cell"), col(idCol).as("query_id"), col(vecCol).as("qv"),
        V.l2Norm(col(vecCol)).as("qn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(V.cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "cos", "rn")
  }

  /** IVF with data-seeded centroids and multi-cell probing: the centroids
    * are the embeddings of `vec_id < nCells` (deterministic and exactly
    * reproducible in SQL — unlike KMeans this makes the whole operator
    * DuckDB-oracle-verifiable), each corpus vector joins the inverted list
    * of its nearest centroid (cosine, ties to the smallest centroid id),
    * and each query probes its `nprobe` nearest cells.
    *
    * Scale shape: centroids are collected to the driver (nCells × dim
    * doubles) and the cell assignment is a pure expression — a narrow map
    * over the corpus with NO shuffle and no per-row join fan-out; the only
    * shuffle is the final per-query top-k window on the (small) candidate
    * set. nprobe trades recall for candidate volume at a 1/nCells
    * granularity. */
  def knnIvfSeeded(corpus: DataFrame, queries: DataFrame, k: Int = 3,
      nCells: Int = 8, nprobe: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // driver-resident centroids, in centroid-id order; norms are folded
    // left-to-right like V.dot so SQL twins reproduce them bit-for-bit
    val cents: Array[(Int, Seq[Double])] = corpus.filter(col(idCol) < nCells)
      .select(col(idCol).cast("int"), col(vecCol))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble)))
      .sortBy(_._1)
    require(cents.length == nCells, s"expected $nCells centroid rows, got ${cents.length}")

    def cellRank(v: Column, vn: Column): Column = {
      // array of (−cos, cid), ascending sort = cosine desc with smallest-id
      // tie-break; pure expression, evaluated once per row
      val scored = cents.map { case (cid, cv) =>
        val cn = math.sqrt(cv.foldLeft(0.0)((acc, x) => acc + x * x))
        struct((V.cosineFromNorms(v, typedLit(cv), vn, lit(cn)) * lit(-1.0)).as("neg"),
          lit(cid).as("cid"))
      }
      sort_array(array(scored: _*))
    }

    val c = corpus
      .withColumn("__n", V.l2Norm(col(vecCol)))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("__n").as("cn"),
        element_at(cellRank(col(vecCol), col("__n")), 1).getField("cid").as("cell"))
    val q = broadcast(queries
      .withColumn("__n", V.l2Norm(col(vecCol)))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("__n").as("qn"),
        explode(transform(slice(cellRank(col(vecCol), col("__n")), 1, nprobe),
          s => s.getField("cid"))).as("cell")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(V.cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "cos", "rn")
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket
    * under explicit hyperplanes; misses across bucket boundaries are the
    * accepted recall trade (floor pinned by SimilaritySpec).
    * [[V.rademacherPlanes]] gives ±1 planes whose dot products SQL
    * engines reproduce exactly, making the full bucketed top-k
    * DuckDB-oracle-verifiable; [[V.hyperplanes]] gives the classic
    * seeded Gaussian family. */
  def knnLshWith(corpus: DataFrame, queries: DataFrame,
      planes: Array[Array[Double]], k: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cb = lshBucketsWith(corpus, planes, vecCol)
      .select(col("bucket"), col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        V.l2Norm(col(vecCol)).as("cn"))
    val qb = broadcast(lshBucketsWith(queries, planes, vecCol)
      .select(col("bucket"), col(idCol).as("query_id"), col(vecCol).as("qv"),
        V.l2Norm(col(vecCol)).as("qn")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    qb.join(cb, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(V.cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "cos", "rn")
  }
}
