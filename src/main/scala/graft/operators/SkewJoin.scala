package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows (a hot user,
  * a null-ish default key), hash partitioning sends the whole key to one
  * task. AQE's skew-join split handles sort-merge joins automatically
  * (`spark.sql.adaptive.skewJoin.enabled`, on in this engine's sessions);
  * explicit salting remains the tool when the small side fits a bounded
  * replication but not a broadcast, or when AQE is unavailable (e.g.
  * inside a cached subplan).
  *
  * Mechanics: the big side gets a deterministic per-row salt in
  * [0, saltFactor); the small side is replicated saltFactor times; the join
  * key becomes (key, salt), splitting each hot key across saltFactor tasks.
  * Replication cost: |small| × saltFactor rows shuffled — choose saltFactor
  * ≈ (hot-key rows / target task size).
  *
  * For AGGREGATION skew no helper is needed: Catalyst always plans
  * partial (map-side) aggregation, which is exactly the salt-then-merge
  * two-phase scheme. */
object SkewJoin {

  /** Inner equi-join of `big` ⋈ `small` on `keys`, salted. Result equals
    * `big.join(small, keys)` exactly; only the partitioning differs. */
  def saltedInner(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 0)
    // deterministic per-row salt: hash of the whole row spreads even a
    // single hot key's rows uniformly (rand() would break retry semantics)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
