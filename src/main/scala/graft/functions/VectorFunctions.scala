package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `ArrayType(FloatType)` columns.
  *
  * Dot products fold left-to-right in double precision
  * (`zip_with` + `aggregate`) — sequential order matches DuckDB's
  * `list_dot_product` over double lists, so oracle comparisons are
  * bit-stable. All expression-level (codegen), no UDFs.
  */
object VectorFunctions {

  /** Double-precision dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine with inline norms — 3 aggregate passes per call. In any join,
    * prefer [[cosineFromNorms]] with norms computed once per ROW before
    * the join: per PAIR this form redoes both norms, tripling the work on
    * the candidate set (the round-1 bench's worst offender: 47 s on q38). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine given precomputed per-side norms. The expression shape
    * `dot / (normA * normB)` is kept identical to [[cosine]] (and to
    * DuckDB's `list_dot_product(a,b) / (sqrt(..)*sqrt(..))` oracle), so
    * results stay bit-identical — only the norm COMPUTATION moves from
    * per-pair to per-row. */
  def cosineFromNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Deterministic random hyperplanes for sign-LSH (seeded; same planes on
    * every executor since they ship as literals in the plan). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Deterministic ±1 (Rademacher) hyperplanes: a valid sign-LSH family
    * whose dot products are exact sign-flipped sums — SQL engines
    * reproduce them bit-for-bit from the same literals, so bucketed
    * results are oracle-verifiable (Gaussian planes from a JVM RNG are
    * not reproducible in SQL). */
  def rademacherPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Sign-LSH bucket id: bit p set iff dot(v, plane_p) > 0. nPlanes <= 30. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedLit(p.toSeq)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
}
