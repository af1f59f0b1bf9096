package graft.tools

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import graft.SparkEntry

/** Plan-quality audit: for every declared query, count shuffles/broadcasts
  * and verify parquet scans are pruned (column projection + pushed
  * filters). Emits a markdown table (stdout) — the per-round evidence that
  * plans are shaped for scale, not just correct. */
object AuditPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    // Sessions.local carries the full driver-parity config (UTC, AQE,
    // nanosAsLong for events.parquet — without it every events query
    // fails the audit with IllegalArgumentException).
    val spark = graft.core.Sessions.local(8, "audit-plans")
    spark.sparkContext.setLogLevel("ERROR")
    println("| query | shuffles | broadcasts | scans | max cols read | pushed filters |")
    println("|---|---|---|---|---|---|")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.count() // materialize so AQE finalizes the executed plan
        val plan = df.queryExecution.executedPlan
        val nodes = plan.collectWithSubqueries { case p => p }.flatMap {
          case a: AdaptiveSparkPlanExec => a.executedPlan.collect { case p => p }
          case p => Seq(p)
        }
        val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
        val bcasts = nodes.count(_.isInstanceOf[BroadcastExchangeExec])
        val scans = nodes.collect { case s: FileSourceScanExec => s }
        val maxCols = if (scans.isEmpty) 0 else scans.map(_.requiredSchema.size).max
        val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "[]"))
          .count(_ != "[]")
        println(s"| $name | $shuffles | $bcasts | ${scans.size} | $maxCols | $pushed scans w/ pushdown |")
      } catch {
        case e: Throwable => println(s"| $name | ERROR ${e.getClass.getSimpleName} | | | | |")
      }
    }
    spark.stop()
  }
}
