package graft.tools

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import graft.SparkEntry

/** Plan-quality audit: for every declared query, count shuffles/broadcasts
  * and verify parquet scans are pruned (column projection + pushed
  * filters). Emits a markdown table (stdout) — the per-round evidence that
  * plans are shaped for scale, not just correct.
  *
  * `1p-windows` (round 14, VERDICT r13 #1): the count of Window /
  * WindowGroupLimit operators with an EMPTY partition spec — each one
  * forces ALL its input rows through a single task ("No Partition Defined
  * for Window operation" in the executor log), the scale-killer class the
  * shuffle/scan counters can't see. Every nonzero row must be either
  * re-shaped (two-pass distinct-value rank — see q11RankGlobal) or carry a
  * documented bounded-cardinality precondition at the site (q69's
  * Heaps-law vocab, q107's year frame). */
object AuditPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    // Sessions.local carries the full driver-parity config (UTC, AQE,
    // nanosAsLong for events.parquet — without it every events query
    // fails the audit with IllegalArgumentException).
    val spark = graft.core.Sessions.local(8, "audit-plans")
    spark.sparkContext.setLogLevel("ERROR")
    println("| query | shuffles | broadcasts | scans | max cols read | pushed filters | 1p-windows |")
    println("|---|---|---|---|---|---|---|")
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
        val onePartWindows = nodes.count {
          case w: WindowExec => w.partitionSpec.isEmpty
          case w: WindowGroupLimitExec => w.partitionSpec.isEmpty
          case _ => false
        }
        println(s"| $name | $shuffles | $bcasts | ${scans.size} | $maxCols | $pushed scans w/ pushdown | $onePartWindows |")
      } catch {
        case e: Throwable => println(s"| $name | ERROR ${e.getClass.getSimpleName} | | | | | |")
      }
    }
    spark.stop()
  }
}
