package graft.tools

import java.util.Locale

import org.apache.spark.sql.SparkSession

import graft.core.Sessions

/** Shuffle-partition sizing probe (round 8): every wall harness pins
  * `spark.sql.shuffle.partitions` = cores (32), so per-partition shuffle
  * rows grow linearly with the corpus — at the g100 decade q116's
  * exploded band frame is ~200M rows over 32 partitions (~6M rows each)
  * and its wall exponent read 1.22 against a DETERMINISTIC candidate
  * volume of 1.03 (BENCH_SCALE_r08_g100 vs CANDVOL_r08_g100). On a real
  * cluster partitions scale with the data; this probe answers whether
  * the local super-linear residue is spill from fixed partition COUNT
  * (more, smaller partitions at the same 32-core parallelism → wall
  * drops) or something algorithmic (wall unchanged).
  *
  * ANSWER (PARTPROBE_r08.json, single session): spill. q116 at g100
  * reads p50 857.8 s at 32 partitions, 539.1 s at 128, 508.7 s at 512 —
  * and ~540 s is the volume-predicted wall from the g30 leg
  * (159.7 s × 3.333^1.025 ≈ 548 s). With shuffle width scaled the way a
  * cluster's would be, the g30→g100 wall exponent is ~0.96, matching
  * CANDVOL's 1.025; the BENCH_SCALE_r08_g100 reading of 1.22 was
  * per-partition sort spill at the fixed local width.
  *
  * Usage: tools/run.sh graft.tools.PartProbe <dir> <query> <parts[,parts...]> [runs] [warmupDir]
  * One JSON line on stdout; same noop-sink materialization as Bench.
  * `warmupDir` (e.g. scaledata/g1) runs the query once per fresh session
  * before timing — the first probe otherwise pays the JVM's whole
  * classload/codegen warmup (measured ~9 s of a 19 s g1 run) and the
  * bias lands on whichever partition count runs first.
  */
object PartProbe {

  private def fmt(v: Double): String =
    String.format(Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PartProbe <dir> <query> <parts[,parts...]> [runs]")
    val (dir, qname) = (args(0), args(1))
    val partsList = args(2).split(",").toSeq.map(_.toInt)
    val runs = args.lift(3).map(_.toInt).getOrElse(3)
    val warmupDir = args.lift(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val fn = graft.SparkEntry.queries.getOrElse(qname,
      sys.error(s"unknown query $qname"))

    def p50(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)

    val results = partsList.map { parts =>
      // fresh session per partition count: shuffle.partitions is read at
      // plan time, and a shared context would let AQE coalesce state leak
      // across probes
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(s"partprobe-$parts")
        .config("spark.sql.shuffle.partitions", parts.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      warmupDir.foreach { w =>
        Sessions.materialize(fn(spark, w))
        spark.catalog.clearCache() // don't let warmup caches occupy memory
      }
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        Sessions.materialize(fn(spark, dir))
        val dt = (System.nanoTime() - t0) / 1e9
        // outside the timed window: see Bench — without this a repeat
        // run reuses persisted verify intermediates across runs
        spark.catalog.clearCache()
        dt
      }
      spark.stop()
      (parts, times)
    }
    val json = results.map { case (parts, ts) =>
      s""""p$parts":{"p50":${fmt(p50(ts))},"raw":${ts.map(fmt).mkString("[", ",", "]")}}"""
    }.mkString(",")
    println(s"""{"metric":"part_probe","harness":"noop","cache_cleared":true,"dir":"$dir","query":"$qname","cpus":$cpus,$json}""")
  }
}
