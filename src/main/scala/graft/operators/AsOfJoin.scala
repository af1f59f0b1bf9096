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

  /** [[backward]] planned through the dedicated physical operator
    * ([[graft.plans.AsOfJoinExec]]): same contract, same deterministic
    * greatest-payload tie-break, but executed as a per-partition
    * streaming merge with O(1) carried state instead of the union +
    * window. Self-registers the planner strategy, so it works in any
    * session (GraftExtensions also injects it). Output column order:
    * left columns, then payload destinations sorted by name. */
  def backwardExec(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String,
      rightCols: Map[String, String]): DataFrame = {
    import org.apache.spark.sql.graftbridge.DatasetBridge
    val collisions = rightCols.values.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"rightCols destinations collide with left columns: ${collisions.mkString(", ")}")
    val spark = left.sparkSession
    DatasetBridge.ensureStrategy(spark, graft.plans.AsOfJoinStrategy)
    val dsts = rightCols.toSeq.sortBy(_._2)
    // every right column goes through an Alias: a fresh exprId per column
    // breaks any lineage shared with the left side (same-source as-of
    // joins would otherwise carry conflicting attribute ids into the
    // custom node, which the analyzer's dedup pass does not rewrite)
    val rightSel = right.select(
      (on.map(k => col(k).as(k)) :+ col(rightTs).as("__rts")) ++
        dsts.map { case (src, d) => col(src).as(d) }: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightSel.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    val node = graft.plans.AsOfJoinNode(
      lPlan, rPlan,
      on.map(attr(lPlan, _)), on.map(attr(rPlan, _)),
      attr(lPlan, leftTs), attr(rPlan, "__rts"),
      dsts.map { case (_, d) => attr(rPlan, d) })
    DatasetBridge.ofRows(spark, node)
  }
}
