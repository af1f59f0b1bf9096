package graft.tools

import graft.SparkEntry

/** Dev-only: run one query (or ALL) N times, print per-run wall time.
  * `GRAFT_EXPLAIN=1` additionally dumps the formatted plan. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // Sessions.local carries driver-parity config incl. nanosAsLong —
    // a hand-rolled session here silently breaks every events query.
    val spark = graft.core.Sessions.local(cpus, "graft-profile")
    val names =
      if (name == "ALL") SparkEntry.queries.keys.toSeq.sorted else Seq(name)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        if (name != "ALL") println(f"[profile] $n run $i: $sec%.3f s ($rows rows)")
        sec
      }.sorted
      println(f"[profile] $n p50=${times((times.size - 1) / 2)}%.3f s")
      if (sys.env.contains("GRAFT_EXPLAIN")) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
