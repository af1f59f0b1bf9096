package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of several columns
  * into one key and lay the table out sorted by it, so rows close in
  * EVERY dimension land in the same files. Single-column sort order
  * prunes scans only on the leading column; a z-ordered layout gives
  * every interleaved dimension partial pruning power — the standard
  * multi-dimensional file-skipping layout (used by Delta/Iceberg
  * OPTIMIZE ZORDER) built here from plain expressions.
  *
  * The key is a pure bit-arithmetic expression (shift/and/or — fully
  * codegen'd, no UDF) over the low `bits` bits of each column, so a SQL
  * twin ([[zKeySql]]) reproduces every key bit-for-bit. Layout writes
  * are `repartitionByRange(zkey) + sortWithinPartitions(zkey)`: one
  * range exchange, and each output file covers a compact z-range whose
  * per-column min/max stats (what parquet row-group pruning reads) form
  * a tight box instead of a full-width stripe. */
object ZOrder {

  /** Morton key: bit i of column c lands at key bit `i*N + c`. Inputs
    * are masked to their low `bits` bits (callers scale values into
    * [0, 2^bits) — ranks, day numbers, bucket ids). N*bits must fit a
    * positive Long. */
  def zKey(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits exceeds a positive Long")
    val n = cols.size
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + ci)
    terms.reduce(_.bitwiseOR(_))
  }

  /** DuckDB twin of [[zKey]] — identical shift/mask arithmetic. */
  def zKeySql(cols: Seq[String], bits: Int = 16): String = {
    val n = cols.size
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      i <- 0 until bits
    } yield s"(((CAST($c AS BIGINT) >> $i) & 1) << ${i * n + ci})"
    terms.mkString("(", " | ", ")")
  }

  /** Cluster `df` for multi-dimensional scan pruning: range-partition on
    * the z-key into `numFiles` output partitions and sort within each —
    * written as-is, every partition becomes one file covering a compact
    * z-range. One exchange; the sort is per-partition. */
  def layoutByZOrder(df: DataFrame, cols: Seq[Column], numFiles: Int,
      bits: Int = 16): DataFrame =
    df.withColumn("__z", zKey(cols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
