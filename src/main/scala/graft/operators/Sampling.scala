package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deterministic mixture sampling: down- OR up-sample each stratum by a
  * percentage rate, with membership decided per row by portable hash
  * arithmetic — never by `rand()` or partition order, so the sampled
  * corpus is identical across engines, reruns, and cluster sizes (the
  * property `df.sample` does NOT have).
  *
  * A rate of 37 keeps ~37% of rows; a rate of 250 emits every row 2 times
  * plus a third copy for a deterministic 50% of rows — the "epochs per
  * source" mixture weighting a training run applies to high-value domains.
  * Sampling is a narrow map (filter + bounded explode): no shuffle, no
  * skew, safe at any scale.
  */
object Sampling {

  /** Exact copy count for a row: `rate/100` guaranteed copies plus one
    * extra iff the row's hash bucket falls below `rate % 100`. */
  def copies(id: Column, ratePct: Column): Column =
    floor(ratePct / lit(100)).cast("int") +
      when(TextFunctions.hashBucket(id, 100) < pmod(ratePct, lit(100)), 1)
        .otherwise(0)

  /** Emit each row `copies(idCol, ratePct)` times (0 drops the row), with
    * a 1-based `copy_idx` so downstream ordering stays deterministic. */
  def resample(df: DataFrame, idCol: Column, ratePct: Column): DataFrame = {
    val n = copies(idCol, ratePct)
    df.withColumn("n_copies", n)
      .where(col("n_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(1), col("n_copies"))))
      .drop("n_copies")
  }

  /** Priority-sampling priority (Duffield, Lund & Thorup, JACM 2007):
    * weight / u with u = [[TextFunctions.hashUniform]](id). Taking the
    * top-k priorities yields a weighted sample without replacement whose
    * inclusion probabilities are proportional to weight (up to the
    * threshold row) — and because u is hash-derived, the SAMPLE IS A PURE
    * FUNCTION OF ROW IDENTITY: identical across engines, reruns, and
    * cluster sizes. Division-only arithmetic (no ln/pow whose libm
    * rounding differs between engines), so a SQL twin reproduces every
    * priority bit-for-bit. */
  def priority(id: Column, weight: Column): Column =
    weight.cast("double") / TextFunctions.hashUniform(id)

  /** Deterministic weighted sample without replacement: the k rows with
    * the highest priorities. Plans as TakeOrderedAndProject (distributed
    * per-partition top-k + merge) — no global sort, no shuffle of the
    * full table. */
  def samplePriority(df: DataFrame, idCol: Column, weightCol: Column,
      k: Int): DataFrame =
    df.withColumn("priority", priority(idCol, weightCol))
      .orderBy(col("priority").desc)
      .limit(k)

  /** Stratified deterministic weighted sample: the k highest-priority
    * rows WITHIN each group (a fixed per-stratum budget, e.g. "5 docs
    * per source for eval"). One shuffle on the group key, then a
    * per-group window — the per-partition top-k never sorts the table.
    * Ties cannot occur in practice (priorities are distinct hash-derived
    * doubles) but id breaks them totally anyway. */
  def samplePriorityPerGroup(df: DataFrame, idCol: Column, weightCol: Column,
      groupCol: Column, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("priority").desc, idCol)
    df.withColumn("priority", priority(idCol, weightCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
