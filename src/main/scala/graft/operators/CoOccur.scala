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
}
