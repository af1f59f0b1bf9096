package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the single most recent right row
  * with right.ts <= left.ts within the same key group (SQL `ASOF JOIN`).
  *
  * Spark has no built-in as-of join; the preference order from the build
  * charter is (a) compose existing operators — which suffices here: the
  * union + keyed-window formulation does ONE shuffle on (keys) and a
  * per-partition sort, with none of the range-join blow-up of the naive
  * `l.ts >= r.ts` theta join (which is O(|L|·|R|) per key). This is the
  * same mechanics a dedicated SortMergeAsOfJoinExec would have, expressed
  * declaratively:
  *
  *   1. tag left (1) and right (0) rows, union by name;
  *   2. window per key ordered by (ts, tag) — a right row at the same ts
  *      sorts before the left row, making the match inclusive;
  *   3. last(right value, ignoreNulls) over rows-unbounded-preceding
  *      carries the latest right payload forward;
  *   4. keep only left rows.
  *
  * Left rows with no prior right row get nulls (ASOF LEFT JOIN semantics).
  */
object AsOfJoin {

  /** @param on        equi-key columns present in both frames
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param rightCols right payload columns to carry (renamed as given) */
  def backward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String,
      rightCols: Map[String, String]): DataFrame = {
    val collisions = rightCols.values.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"rightCols destinations collide with left columns: ${collisions.mkString(", ")} " +
        "(withColumn would silently overwrite the left payload)")
    val leftCols = left.columns.filterNot(on.contains).filterNot(_ == leftTs)
    // The whole right payload travels as ONE struct carried by ONE
    // last(ignoreNulls): per-column carries would mix values from
    // different right rows whenever the winning row holds a NULL in one
    // payload column (last skips the NULL and reaches into an older row).
    val dsts = rightCols.toSeq.sortBy(_._2)
    val rStruct = struct(dsts.map { case (src, dst) => col(src).as(dst) }: _*)
    val rStructType = right.select(rStruct.as("__r")).schema("__r").dataType
    val l = left.select(
      (on.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__is_l")) ++
        leftCols.map(col) :+ lit(null).cast(rStructType).as("__r"): _*)
    val r = right.select(
      (on.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__is_l")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        rStruct.as("__r"): _*)
    // Tie-break beyond (__ts, __is_l): multiple right rows sharing
    // (key, ts) would otherwise carry a partitioning-dependent payload.
    // Ordering by the payload struct makes the carried value
    // deterministic — the greatest payload tuple at the shared timestamp
    // wins (documented semantics, independent of run/partition layout).
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts"), col("__is_l"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__rc", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__is_l") === 1)
      .select((on.map(col) :+ col("__ts").as(leftTs)) ++
        leftCols.map(col) ++
        dsts.map { case (_, dst) => col("__rc").getField(dst).as(dst) }: _*)
  }
}
