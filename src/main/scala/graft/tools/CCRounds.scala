package graft.tools

import java.util.Locale

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.operators.{ConnectedComponents, Dedup}
import graft.queries.TextQueries

/** q44 wall-exponent decomposition (VERDICT r7 #3): the g10→g30 leg read
  * 1.135 — above the linear band even with the iterative-allowance
  * hand-wave — and the verdict asks for the same treatment q113 got:
  * measure, don't allow. This runs q44's EXACT pipeline (same capped
  * ngramJaccard pair set, same resolve call) with the
  * [[ConnectedComponents.resolve]] per-round hook, reporting per run:
  * round 0 (pair lineage + symmetrize + distinct), each star round's
  * wall and surviving edge count, and the final keep-join — so the total
  * exponent decomposes into round COUNT growth (the O(log n) term the
  * algorithm owns) vs per-round cost growth (a tuning defect if
  * super-linear).
  *
  * Run: tools/run.sh graft.tools.CCRounds <dir> [runs]   (p50-of-runs
  * per stage; one JSON line on stdout).
  */
object CCRounds {

  private def fmt(v: Double): String =
    String.format(Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.error("usage: CCRounds <sfDir> [runs]"))
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-ccrounds")

    val perRun = (1 to runs).map { _ =>
      val rounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Long)]
      val t0 = System.nanoTime()
      val docs = Tables.documents(spark, dir)
      val pairs = Dedup.ngramJaccard(docs, n = 3, threshold = 0.5,
          maxDocFreq = TextQueries.MaxShingleDf)
        .select("id_a", "id_b")
      val comp = ConnectedComponents.resolve(pairs,
        onRound = (i, s, e) => rounds += ((i, s, e)))
      // the resolve call runs eagerly (checkpoints); this tail is q44's
      // final left join, materialized like the bench would
      val tTail = System.nanoTime()
      Sessions.materialize(
        docs.select(col("doc_id"))
          .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("component")))
      val tEnd = System.nanoTime()
      // outside the timed window: see Bench — cross-run cache reuse
      spark.catalog.clearCache()
      (rounds.toSeq, (tTail - t0) / 1e9, (tEnd - tTail) / 1e9, (tEnd - t0) / 1e9)
    }

    def p50(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)
    val nRounds = perRun.map(_._1.count(_._1 > 0))
    // a varied round count is worth REPORTING, not a reason to discard
    // all the paid-for timings (ADVICE r8): quote p50 over the rounds
    // every run has, and stamp the per-run counts so the divergence is
    // visible in the artifact
    if (nRounds.distinct.size != 1)
      System.err.println(s"[ccrounds] WARNING: round count varied across " +
        s"runs: $nRounds — per-round p50 is over the common prefix")
    val roundJson = perRun.head._1
      .filter { case (i, _, _) => perRun.forall(_._1.exists(_._1 == i)) }
      .map { case (i, _, edges) =>
        val secs = p50(perRun.map(_._1.find(_._1 == i).get._2))
        s"""{"round":$i,"sec":${fmt(secs)},"edges":$edges}"""
      }.mkString("[", ",", "]")
    val json = s"""{"metric":"cc_rounds","dir":"$dir","runs":$runs,""" +
      s""""star_rounds":${nRounds.max},""" +
      s""""round_counts":${nRounds.mkString("[", ",", "]")},""" +
      s""""rounds":$roundJson,""" +
      s""""resolve_sec":${fmt(p50(perRun.map(_._2)))},""" +
      s""""tail_sec":${fmt(p50(perRun.map(_._3)))},""" +
      s""""total_sec":${fmt(p50(perRun.map(_._4)))}}"""
    spark.stop()
    println(json)
  }
}
