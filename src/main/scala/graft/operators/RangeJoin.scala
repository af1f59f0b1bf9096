package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join: pair every left "point" row with the
  * right interval rows [start, end] (inclusive) that contain it.
  *
  * Spark plans the naive `p BETWEEN s AND e` theta join as a broadcast
  * nested loop — O(|points|·|intervals|) comparisons, a non-starter at
  * 100 TB. Bucketizing the range axis turns it into an equi-join:
  *
  *   1. each point maps to its bucket `floor(p / w)` (narrow, no fanout);
  *   2. each interval explodes into every bucket it overlaps
  *      (`sequence(floor(s/w), floor(e/w))` — fanout = length/w + 1);
  *   3. hash equi-join on the bucket id, then the exact containment
  *      predicate filters the candidates.
  *
  * Candidate volume per bucket is points_b × intervals_b, so `width`
  * should sit near the TYPICAL interval length: much smaller wastes
  * explode fanout, much larger piles unrelated points and intervals into
  * the same bucket. Degenerate long intervals are the hot-key analogue —
  * `maxBucketsPerInterval` drops them (an interval spanning the whole
  * axis pairs with every point; like CoOccur's hot keys, it carries no
  * selectivity and only the caller can decide it is meaningful).
  */
object RangeJoin {

  /** @param points    left frame; `pointCol` is a numeric axis value
    * @param intervals right frame; `startCol <= endCol`, same axis
    * @param width     bucket width on the axis (> 0)
    * @param maxBucketsPerInterval drop intervals exploding into more
    *        buckets than this; <= 0 disables the bound
    * @return all (point row ++ interval row) combinations with
    *         start <= point <= end; column sets must be disjoint */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      width: Long, maxBucketsPerInterval: Long = 0L): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points/intervals column names must be disjoint, both have: ${overlap.mkString(", ")}")
    def bucketOf(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / lit(width.toDouble)).cast("long")
    val p = points.withColumn("__b", bucketOf(col(pointCol)))
    val iBase = intervals.withColumn("__bs", bucketOf(col(startCol)))
      .withColumn("__be", bucketOf(col(endCol)))
    val iBounded =
      if (maxBucketsPerInterval <= 0) iBase
      else iBase.filter(col("__be") - col("__bs") < maxBucketsPerInterval)
    val i = iBounded
      .withColumn("__b", explode(sequence(col("__bs"), col("__be"))))
      .drop("__bs", "__be")
    p.join(i, Seq("__b"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__b")
  }
}
