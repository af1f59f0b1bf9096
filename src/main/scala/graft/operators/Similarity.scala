package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

/** Similarity search over embedding columns.
  *
  * Brute-force top-k is the exactness baseline: queries × corpus with the
  * query side broadcast (query sets are small by construction; the corpus —
  * the 100 TB side — never moves). The LSH variant is the scale path: one
  * shuffle to bucket the corpus, then per-bucket candidate joins; recall is
  * traded via nPlanes.
  */
object Similarity {

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Query side is broadcast. */
  def knnBruteForce(corpus: DataFrame, queries: DataFrame, k: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(V.cosine(col("qv"), col("cv")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "cos", "rn")
  }

  /** Corpus bucketed by sign-LSH over `nPlanes` random hyperplanes. */
  def lshBuckets(corpus: DataFrame, nPlanes: Int = 12, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = V.hyperplanes(nPlanes, dim)
    corpus.withColumn("bucket", V.lshBucket(col(vecCol), planes))
  }

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

  /** IVF approximate top-k: probe only the query's cell (nprobe=1). */
  def knnIvf(corpus: DataFrame, queryIds: DataFrame => DataFrame, k: Int = 3,
      nCells: Int = 16, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val assigned = ivfAssign(corpus, nCells, vecCol = vecCol)
    val c = assigned.select(col("cell"), col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = broadcast(queryIds(assigned)
      .select(col("cell"), col(idCol).as("query_id"), col(vecCol).as("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(V.cosine(col("qv"), col("cv")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "cos", "rn")
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket.
    * Misses across bucket boundaries are the accepted recall trade. */
  def knnLsh(corpus: DataFrame, queries: DataFrame, k: Int = 3,
      nPlanes: Int = 12, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cb = lshBuckets(corpus, nPlanes, dim, idCol, vecCol)
      .select(col("bucket"), col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val qb = broadcast(lshBuckets(queries, nPlanes, dim, idCol, vecCol)
      .select(col("bucket"), col(idCol).as("query_id"), col(vecCol).as("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    qb.join(cb, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(V.cosine(col("qv"), col("cv")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "cos", "rn")
  }
}
