package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-occurrence pairs: items that share at least `minShared` keys
  * (suppliers co-supplying parts, authors co-writing articles, docs
  * sharing shingles — the graph 2-hop self-join J7/G3 generalized).
  *
  * Scale design: the input is reduced to DISTINCT (key, item) before the
  * self-join, and keys with more than `maxItemsPerKey` distinct items are
  * dropped first — one key held by S items yields S(S−1)/2 pairs, so a
  * single pathological key at 100× data is a straight scale-killer (the
  * same hot-key discipline as `Dedup.docShingles` `maxDocFreq`; see the
  * r1 verdict on q21). Dropping hot keys is a SEMANTIC choice the caller
  * opts into: a key shared by "everyone" carries no pairing signal, like
  * a stopword shingle. `maxItemsPerKey <= 0` disables the bound.
  */
object CoOccur {

  /** @return (item_a, item_b, shared_keys) with item_a < item_b. */
  def pairs(df: DataFrame, keyCol: String, itemCol: String,
      minShared: Long = 1L, maxItemsPerKey: Long = 0L): DataFrame = {
    val distinctPairs = df.select(col(keyCol).as("key"), col(itemCol).as("item")).distinct()
    val bounded =
      if (maxItemsPerKey <= 0) distinctPairs
      else {
        val hot = distinctPairs.groupBy("key").agg(count(lit(1)).as("__n"))
          .filter(col("__n") > maxItemsPerKey)
          .select("key")
        distinctPairs.join(hot, Seq("key"), "left_anti")
      }
    val a = bounded.select(col("key"), col("item").as("item_a"))
    val b = bounded.select(col("key"), col("item").as("item_b"))
    a.join(b, Seq("key"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("shared_keys"))
      .filter(col("shared_keys") >= minShared)
  }

  /** Same contract as [[pairs]] (with the bound REQUIRED), formulated as
    * per-key pair explosion instead of a self-join: collect the bounded,
    * sorted item set per key and emit only the a<b combinations directly
    * — S(S−1)/2 rows outright instead of the join's S² candidates, and
    * one fewer exchange.
    *
    * MEASURED SLOWER than [[pairs]] despite the nicer row count: 3.6 s vs
    * 1.95 s warm p50 on sf0.1 lineitem (499,500 pairs, identical output).
    * collect_list + the nested transform/slice/flatten fall out of
    * whole-stage codegen, while the self-join stays in codegen'd hash
    * join + partial aggregation. Kept as the measured alternative (and
    * the shape to revisit if per-key arrays ever become the input format
    * upstream); q21 uses [[pairs]]. */
  def pairsViaGroups(df: DataFrame, keyCol: String, itemCol: String,
      minShared: Long = 1L, maxItemsPerKey: Long = 64L): DataFrame = {
    require(maxItemsPerKey > 0, "pairsViaGroups needs a positive maxItemsPerKey " +
      "(the per-key collect_list is only safe bounded); use pairs() for unbounded")
    val distinctPairs = df.select(col(keyCol).as("key"), col(itemCol).as("item")).distinct()
    val grouped = distinctPairs.groupBy("key")
      .agg(sort_array(collect_list(col("item"))).as("items"))
      .filter(size(col("items")) <= maxItemsPerKey)
    grouped
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
          |  transform(slice(items, i + 2, size(items) - i - 1),
          |    y -> struct(x AS item_a, y AS item_b))))""".stripMargin)).as("p"))
      .select(col("p.item_a"), col("p.item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("shared_keys"))
      .filter(col("shared_keys") >= minShared)
  }
}
