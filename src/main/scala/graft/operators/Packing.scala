package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-capacity "shards" (context
  * windows / training files) by a greedy first-fit-in-order rule — the step
  * between "deduped corpus" and "token-budgeted training shards".
  *
  * Greedy packing is inherently a sequential scan (each assignment depends
  * on the running fill), so it cannot be a pure window expression: a
  * cumulative-sum formulation drifts from true greedy as soon as one doc
  * straddles a boundary. The scalable shape is *parallel across groups,
  * sequential within*: `repartition(groupCol)` puts every group on exactly
  * one partition, `sortWithinPartitions(group, order)` fixes a deterministic
  * scan order, and one `mapPartitions` pass assigns shards with O(1) state.
  * At 100 TB the group is a source/domain/date bucket — thousands of groups
  * → full cluster parallelism, and shard ids are reproducible because they
  * depend only on (group, order) and never on physical placement.
  */
object Packing {

  /** Pack rows into shards of at most `capacity` size units per group.
    *
    * Rule: scan the group in `orderCol` order; a row joins the current
    * shard iff `fill + size <= capacity`, else it opens the next shard.
    * The first row of a group always opens shard 0 — an oversize row
    * (size > capacity) therefore gets a shard of its own rather than
    * being dropped or split.
    *
    * Output columns: groupCol, orderCol, sizeCol, `shard` (0-based per
    * group).
    */
  def packGreedy(df: DataFrame, groupCol: String, orderCol: String,
                 sizeCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string"), col(orderCol).cast("long"),
        col(sizeCol).cast("long"))
      .repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(orderCol))
      .as[(String, Long, Long)]
      .mapPartitions { rows =>
        var group: String = null
        var shard = 0L
        var fill = 0L
        rows.map { case (g, id, n) =>
          if (g != group) { group = g; shard = 0L; fill = n }
          else if (fill + n <= capacity) { fill += n }
          else { shard += 1; fill = n }
          (g, id, n, shard)
        }
      }
      .toDF(groupCol, orderCol, sizeCol, "shard")
  }

  /** Two-level packing for monster groups: [[packGreedy]] serializes each
    * group onto one task, so a corpus dominated by a single giant source
    * bottlenecks on it. This variant salts any group larger than
    * `maxGroupRows` into `ceil(rows / maxGroupRows)` deterministic
    * sub-groups (membership = the portable md5 hash
    * [[graft.functions.TextFunctions.hash16]] `mod nSubs` — stable under
    * any physical partitioning AND identical in every engine, which is
    * what makes the assignment DuckDB-oracle-able), packs every sub-group greedily in
    * parallel, then stitches shard ids back to one dense 0-based range
    * per group by offsetting each sub-group with the cumulative shard
    * count of the sub-groups before it.
    *
    * Bounded deviation from exact single-scan greedy (documented, not
    * hidden): greedy-in-order is next-fit, so within any sub-group two
    * consecutive shard fills sum over `capacity` (when no single row is
    * oversize), giving `m_j < 2·S_j/capacity + 1` shards for sub-group
    * size `S_j` — the group total stays under
    * `2·sum(size)/capacity + nSubs`, the same worst-case class as exact
    * greedy itself (next-fit ≤ 2·OPT), plus one possible partial shard
    * per sub-group. In practice (row sizes ≪ capacity·rows/nSubs) the
    * overhead is a few shards per sub-group, in exchange for nSubs-way
    * parallelism instead of 1. Shard ids remain reproducible: they
    * depend only on (group, orderCol, nSubs), never on physical
    * placement.
    *
    * Output columns: groupCol, orderCol, sizeCol, `shard` (0-based and
    * dense per group). Groups at or under `maxGroupRows` still pack in
    * one sub-group and so match [[packGreedy]] exactly.
    */
  def packGreedyCapped(df: DataFrame, groupCol: String, orderCol: String,
                       sizeCol: String, capacity: Long, maxGroupRows: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(maxGroupRows > 0, "maxGroupRows must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(groupCol).cast("string").as("g"),
      col(orderCol).cast("long").as("o"), col(sizeCol).cast("long").as("n"))
    // sub-group count per group — a counting aggregate, fully parallel
    val nSubs = base.groupBy("g")
      .agg(ceil(count(lit(1)) / lit(maxGroupRows.toDouble)).cast("int").as("n_subs"))
    val salted = base.join(nSubs, Seq("g"))
      .withColumn("sub",
        pmod(graft.functions.TextFunctions.hash16(col("o")), col("n_subs")).cast("int"))
    // pack each (group, sub-group) independently — same scan shape as
    // packGreedy, keyed by the composite
    val packed = salted
      .repartition(col("g"), col("sub"))
      .sortWithinPartitions(col("g"), col("sub"), col("o"))
      .select("g", "o", "n", "sub").as[(String, Long, Long, Int)]
      .mapPartitions { rows =>
        var key: (String, Int) = null
        var shard = 0L
        var fill = 0L
        rows.map { case (g, o, n, sub) =>
          val k = (g, sub)
          if (k != key) { key = k; shard = 0L; fill = n }
          else if (fill + n <= capacity) { fill += n }
          else { shard += 1; fill = n }
          (g, o, n, sub, shard)
        }
      }
      .toDF("g", "o", "n", "sub", "shard_local")
    // stitch: offset each sub-group by the shard counts before it; the
    // window runs over nSubs rows per group (sub-group metadata, not data)
    val perSub = packed.groupBy("g", "sub")
      .agg((max("shard_local") + 1).as("sub_shards"))
    val cumW = Window.partitionBy("g").orderBy("sub")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perSub
      .withColumn("offset", coalesce(sum("sub_shards").over(cumW), lit(0L)))
      .select("g", "sub", "offset")
    packed.join(offsets, Seq("g", "sub"))
      .select(col("g").as(groupCol), col("o").as(orderCol),
        col("n").as(sizeCol), (col("offset") + col("shard_local")).as("shard"))
  }
}
