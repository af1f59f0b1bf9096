package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}

/** Deterministic scale diagnostic for the capped ngram-Jaccard family:
  * the candidate-pair volume of the shingle self-join is exactly
  * Σ_kept-shingles C(df, 2), a pure function of the corpus — so its
  * growth across GenScale corpora measures the operator's asymptote
  * with ZERO timing noise (this VM's scheduler stalls made the round-5
  * q34 g1→g3 wall-clock leg read 1.43; this diagnostic reads the true
  * candidate growth: 10.8M → 35.4M for 3× docs = exponent 1.08, vs
  * 107M → 754M uncapped = 1.78). Reported per directory: shingle
  * vocabulary, capped and uncapped candidate volumes (MaxShingleDf =
  * 200, the declared q34 cap), kept postings, and the hot-shingle count
  * the cap prunes.
  *
  * Usage: runMain graft.tools.CandVol <dir> [dir...] */
object CandVol {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "candvol")
    for (d <- args) {
      val sh = Tables.documents(s, d)
        .select(col("doc_id").as("id"),
          explode(graft.functions.TextFunctions.shingles(col("text"), 3)).as("shingle"))
        .distinct()
      val cap = graft.queries.TextQueries.MaxShingleDf
      val r = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .agg(
          count(lit(1)).as("vocab"),
          sum(when(col("df") <= cap, col("df") * (col("df") - 1) / 2)
            .otherwise(0L)).cast("long").as("cand_capped"),
          sum(col("df") * (col("df") - 1) / 2).cast("long").as("cand_uncapped"),
          sum(when(col("df") <= cap, col("df")).otherwise(0L))
            .cast("long").as("postings_kept"),
          sum(when(col("df") > cap, 1).otherwise(0)).cast("long").as("n_hot"))
        .head()
      println(s"$d vocab=${r.get(0)} cand_capped=${r.get(1)} " +
        s"cand_uncapped=${r.get(2)} postings_kept=${r.get(3)} hot=${r.get(4)}")
    }
    s.stop()
  }
}
