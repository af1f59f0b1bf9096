package graft.operators

import org.apache.spark.sql.DataFrame
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
}
