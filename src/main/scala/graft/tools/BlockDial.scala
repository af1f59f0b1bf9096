package graft.tools

import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.util.Locale
import graft.core.{Sessions, Tables}
import graft.operators.Dedup

/** Measured dial sheet for the adaptive embedding near-dup (q113/q117):
  * candidate volume AND planted-pair candidate recall at each setting of
  * the two bounding knobs —
  *
  *  - `maxItemsPerBlock`: NOTES r6 proposed tightening the hot-bucket
  *    drop from the 10000 default toward ~4·targetPerBucket to truncate
  *    the plane-correlation skew tail (the residual that keeps the
  *    probe volume exponent at ~1.2); dropping a bucket loses every
  *    pair inside it, so the question is volume saved vs recall paid.
  *  - `maxProbePlanes`: the round-6 probe cap (8), freezing the log n
  *    probe-growth term at a known recall cost.
  *
  * Recall is measured on GenScale's planted near-identical pairs
  * (cosine ≥ 0.99; ids (2i, 2i+1) for i < nVecs/25 by construction):
  * a pair COUNTS iff one side's effective bucket is in the other side's
  * deduped probe set after the hot-bucket drop — exactly the operator's
  * join condition, so this is candidate recall, not an estimate. All
  * numbers are pure functions of the corpus: deterministic, immune to
  * the VM's scheduler stalls.
  *
  * Usage: runMain graft.tools.BlockDial [--out=path.json] <dir> [dir...]
  */
object BlockDial {

  private def fmt(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else String.format(Locale.ROOT, "%.4f", Double.box(v))

  /** (volume, plantedFound, plantedTotal) at one knob setting, over any
    * embeddings frame following GenScale's planted-pair convention
    * (ids (2i, 2i+1) near-identical for i < n/25). */
  def measure(embs: org.apache.spark.sql.DataFrame,
      maxItemsPerBlock: Long, maxProbePlanes: Int): (Long, Long, Long) = {
    val nVecs = embs.count()
    val nPlanted = math.max(1L, nVecs / 25) // GenScale's nDupPairs
    val (bounded, scheme) =
      Dedup.adaptiveBuckets(embs, maxItemsPerBlock = maxItemsPerBlock)
    val (vol, _, _, _) =
      CandVol.adaptiveProbeVolume(bounded, scheme, maxProbePlanes)
    val a = bounded.select(col("id").as("id_a"), col("blk"))
    val b = bounded.select(col("id").as("id_b"),
      explode(Dedup.probeBuckets(col("full"), scheme, maxProbePlanes)).as("blk"))
    // a planted pair (2i, 2i+1) is a candidate iff either orientation
    // meets: side A's effective bucket in side B's probe set (integer
    // pairing arithmetic — no FP division)
    val found = a.join(b, Seq("blk"))
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("lo", least(col("id_a"), col("id_b")))
      .withColumn("hi", greatest(col("id_a"), col("id_b")))
      .filter(col("hi") === col("lo") + lit(1) &&
        pmod(col("lo"), lit(2)) === 0 && col("lo") < lit(2L * nPlanted))
      .select("lo").distinct().count()
    (vol, found, nPlanted)
  }

  def main(args: Array[String]): Unit = {
    val out = args.collectFirst { case a if a.startsWith("--out=") => a.drop(6) }
    val dirs = args.filterNot(_.startsWith("--")).toSeq
    require(dirs.nonEmpty, "usage: BlockDial [--out=path.json] <dir> [dir...]")
    val s = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "blockdial")
    // (label, maxItemsPerBlock, maxProbePlanes): default / tight blocks
    // (4x target) / probe cap / both
    val settings = Seq(
      ("default", 10000L, Int.MaxValue),
      ("mb4t", 1024L, Int.MaxValue),
      ("cap8", 10000L, 8),
      ("mb4t_cap8", 1024L, 8))
    val rows = dirs.map { d =>
      val per = settings.map { case (label, mb, cap) =>
        val (vol, found, total) = measure(Tables.embeddings(s, d), mb, cap)
        System.err.println(f"[blockdial] $d $label%-10s vol=$vol%12d recall=$found/$total")
        (label, vol, found, total)
      }
      d -> per
    }
    val json = rows.map { case (d, per) =>
      "\"" + d + "\":" + per.map { case (label, vol, found, total) =>
        s""""$label":{"volume":$vol,"planted_found":$found,"planted_total":$total,"recall":${fmt(found.toDouble / total)}}"""
      }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val doc =
      s"""{"metric":"q113_block_dials","what":"adaptive near-dup volume and planted-pair candidate recall per (maxItemsPerBlock, maxProbePlanes) setting; deterministic","dirs":$json}"""
    out.foreach(p => Files.writeString(Paths.get(p), doc + "\n"))
    println(doc)
    s.stop()
  }
}
