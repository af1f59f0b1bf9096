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

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Deterministic random hyperplanes for sign-LSH (seeded; same planes on
    * every executor since they ship as literals in the plan). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-LSH bucket id: bit p set iff dot(v, plane_p) > 0. nPlanes <= 30. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedLit(p.toSeq)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
}
