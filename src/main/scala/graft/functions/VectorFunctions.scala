package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `ArrayType(FloatType)` columns.
  *
  * Dot products fold left-to-right in double precision — sequential order
  * matches DuckDB's `list_dot_product` over double lists, so oracle
  * comparisons are bit-stable. All expression-level, no UDFs; the dot is
  * a custom codegen expression ([[DotProductExpr]]) because the
  * higher-order-function form (`aggregate(zip_with(...))`) evaluates
  * interpreted per element — measured 2-4× slower end-to-end on the
  * pair-join queries whose inner loop it is.
  */
object VectorFunctions {

  /** Double-precision dot product of two float/double-array columns
    * (codegen; bit-identical to the old zip_with+aggregate fold — see
    * [[DotProductExpr]]'s exactness contract). */
  def dot(a: Column, b: Column): Column = DotProductFn.dotProduct(a, b)

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

  /** Symmetric int8 quantization scale: max|x| / 127, floored at a tiny
    * epsilon so the all-zero vector quantizes to zeros instead of NaN. */
  def quantScale(v: Column): Column =
    greatest(aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double")))),
      lit(1e-30)) / lit(127.0)

  /** Quantize a float vector to int8 range [-127, 127] given its scale —
    * the 4× storage cut (and 8× vs double) that makes 10^9-vector
    * corpora shippable; pair with [[dequantize]] and bound the error by
    * scale/2 per component. Pure elementwise expressions, so a SQL twin
    * reproduces every value bit-for-bit. */
  def quantize(v: Column, scale: Column): Column =
    transform(v, x => round(x.cast("double") / scale).cast("int"))

  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

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

  /** ±1 plane as a DuckDB list literal (values are exactly ±1.0, so the
    * literal round-trips losslessly into SQL). */
  private def planeSql(p: Array[Double]): String =
    p.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  /** DuckDB twin of [[lshBucket]] over a double-list column named `v` —
    * bit-for-bit the same bucket ids when `planes` are Rademacher ±1
    * (each ±x_j term is an exact double, so both engines agree on the
    * sign of the dot product). Used to build hash-exact oracles for the
    * LSH-bucketed operators (q39/q40). */
  def lshBucketDuckDbSql(planes: Array[Array[Double]], vExpr: String = "v"): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product($vExpr, ${planeSql(p)}) > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}
