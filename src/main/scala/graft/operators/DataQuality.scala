package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality primitives for the pipeline gate: one-pass column
  * profiling and declarative constraint checks (the deequ/dbt-test shape,
  * and the engine-side generalization of the reference's load-time
  * invariants — uniqueness constraints and non-null count checks,
  * reference `research_pipeline_dag.py:291-294,374-390`).
  *
  * Scale design: [[profile]] computes every per-column statistic in ONE
  * aggregation pass over the table (a 1-row wide aggregate, reshaped to
  * long form by exploding a literal struct array — no per-column scan, no
  * driver collect). [[checks]] turns each constraint into a counting
  * aggregate (violations, not violating rows), so a failed check on a
  * 100 TB table still returns one number; referential checks count via
  * anti-join, never materializing the join product.
  */
object DataQuality {

  /** Long-format profile of `cols`: per column the row count, null count,
    * exact distinct count (nulls excluded), and min/max rendered as
    * strings (one output schema across input types). One SCAN of the
    * table — but note Spark plans the k exact `count_distinct`s via an
    * Expand node, which multiplies the shuffled row volume by ~|cols|
    * (each input row fans out once per distinct aggregate). For wide
    * profiles over very large tables use [[profileApprox]], whose HLL
    * sketches aggregate map-side with no Expand. (ADVICE r3) */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => count_distinct(col(c)))

  /** [[profile]] with `approx_count_distinct` (HLL++, default rsd 5%):
    * the documented large-scale variant — sketches combine map-side, so
    * shuffle volume is |cols| fixed-size sketches per map task instead of
    * Expand-multiplied rows. */
  def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c)))

  private def profileWith(df: DataFrame, cols: Seq[String],
      distinctAgg: String => Column): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        distinctAgg(c).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__mn"),
        max(col(c)).cast("string").as(s"${c}__mx"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_val"), col(s"${c}__mx").as("max_val"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** One named constraint: `observed` must be an aggregate Column over the
    * table (a violation count or measured value); `passed` is the
    * predicate applied to it. */
  final case class Check(name: String, observed: Column, passed: Column => Column)

  /** Evaluate checks that are all expressible over one table in one
    * aggregation pass. Output: (check_name, observed, passed). */
  def checks(df: DataFrame, cs: Seq[Check]): DataFrame = {
    val aggs = cs.zipWithIndex.map { case (c, i) => c.observed.as(s"__o$i") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cs.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"),
        col(s"__o$i").cast("long").as("observed"),
        c.passed(col(s"__o$i")).as("passed"))
    }
    wide.select(explode(array(entries: _*)).as("c")).select("c.*")
  }

  /** Referential-integrity violation count: rows of `fact` whose
    * `factKey` has no match in `dim.dimKey` (NULL keys are violations —
    * an orphan is an orphan whether or not the key is present). Counted
    * via anti-join: only keys shuffle, and the count is the only thing
    * returned. */
  def orphanCount(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String): DataFrame =
    fact.select(col(factKey))
      .join(dim.select(col(dimKey).as(factKey)).distinct(), Seq(factKey), "left_anti")
      .agg(count(lit(1)).as("orphans"))

  /** In-flight observability: attach named metrics to a frame with
    * `Dataset.observe` — the metrics accumulate DURING whatever action
    * consumes the frame (a sink write, a count), so a pipeline stage gets
    * its row counts / null counts / sums with ZERO extra passes over the
    * data. This is the production shape for "how many rows did this 100 TB
    * stage actually emit": a separate `.agg` would re-run the stage; the
    * observation rides along. Read the metrics from the returned
    * [[org.apache.spark.sql.Observation]] AFTER an action:
    *
    *   val (out, obs) = DataQuality.observed(stage, "ingest",
    *     count(lit(1)).as("rows"), sum("v").as("total"))
    *   out.write.parquet(dir)
    *   val rows = obs.get("rows")
    */
  def observed(df: DataFrame, name: String, metrics: Column*)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    require(metrics.nonEmpty, "observed needs at least one metric column")
    val obs = org.apache.spark.sql.Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
