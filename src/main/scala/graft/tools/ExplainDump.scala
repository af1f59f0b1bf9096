package graft.tools

import java.nio.file.{Files, Paths}

import graft.core.Sessions

/** Dump `.explain("formatted")` for declared queries to files — the
  * optimization-round plan evidence (`plans/rNN/<query>_{before,after}.txt`).
  * The judge cannot run Spark; these files are how plan claims ("2
  * Exchange → 1", "PushedFilters includes X") are checked against the code.
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix>
  *          [names] [--hof-shingles] [--pin-shingles]
  *   names           comma-separated SparkEntry.queries keys (default: all),
  *                   plus the alternative-form arms below
  *   suffix          appended to the file name: <query>_<suffix>.txt
  *   --hof-shingles  build plans with TextFunctions.UseShinglesExpr=false
  *                   (the pre-round-13 interpreted-HOF form) — the
  *                   "before" arm for every text-family plan diff
  *   --pin-shingles  build plans with Dedup.DefaultShingleForm="pin"
  *                   (the round-12 default) — combined with
  *                   --hof-shingles this reproduces the exact r12 plans
  *
  * Alternative-form arms (the measured-but-not-default round-13 shapes):
  *   q68_hoist_alt   declared q68 with PageRank hoistDeg=true
  *   q21_groups_alt  declared q21 via pairsViaGroups(viaExpr=true)
  *
  * Plans are captured UNEXECUTED (the logical->physical compile only, AQE
  * isFinalPlan=false) — that is the shape the round's claims are about:
  * Exchange count, join strategy, PushedFilters/ReadSchema, codegen spans.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val known = Set("--hof-shingles", "--pin-shingles", "--no-dedup-dials")
    val flags = args.filter(_.startsWith("--")).toSet
    require(flags.subsetOf(known), s"unknown flags: ${(flags -- known).mkString(", ")}")
    val pos = args.filterNot(_.startsWith("--"))
    require(pos.length >= 3,
      "usage: ExplainDump <sfDir> <outDir> <suffix> [names] [--hof-shingles] [--pin-shingles] [--no-dedup-dials]")
    val (sfDir, outDir, suffix) = (pos(0), pos(1), pos(2))
    val names: Seq[String] =
      if (pos.length > 3) pos(3).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    if (flags.contains("--hof-shingles"))
      graft.functions.TextFunctions.UseShinglesExpr = false
    if (flags.contains("--pin-shingles"))
      graft.operators.Dedup.DefaultShingleForm = "pin"
    if (flags.contains("--no-dedup-dials")) {
      // the pre-round-14 simhash/minhash shapes: signature pipeline
      // re-derived per join side, no singleton-bucket prune
      graft.operators.Dedup.DefaultPinSims = false
      graft.operators.Dedup.DefaultPruneSingletons = false
    }
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val alts: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "q68_hoist_alt" -> ((s, d) => {
        import org.apache.spark.sql.functions.col
        val sp = graft.core.Tables.lineitem(s, d)
          .select((col("l_suppkey") * 2).as("src"),
            (col("l_partkey") * 2 + 1).as("dst"))
          .distinct()
        val edges = sp.union(sp.select(col("dst").as("src"), col("src").as("dst")))
        graft.operators.PageRank.ranks(s, edges, 5, hoistDeg = true)
          .orderBy("node")
      }),
      "q74_rescan_alt" -> ((s, d) =>
        graft.queries.AnalyticsQueries.q74WithPin(s, d, pinTop = false)),
      // candidate-generation subplans of the simhash/minhash family: the
      // declared queries checkpoint the candidate frame eagerly inside
      // verifiedJaccard, so their FINAL plans never show the keyed join —
      // the r14 pin/prune evidence lives in these subplans (dump them
      // with and without --no-dedup-dials for the before/after pair)
      "q116_cands_alt" -> ((s, d) => graft.operators.Dedup
        .simhashPairsCombinatorial(graft.core.Tables.documents(s, d),
          maxDist = 3)),
      "q123_cands_alt" -> ((s, d) => graft.operators.Dedup
        .simhashPairsCombinatorial(graft.core.Tables.documents(s, d),
          maxDist = 3, nBlocks = 7)),
      "q122_cands_alt" -> ((s, d) => graft.operators.Dedup
        .simhashPairsPermuted(graft.core.Tables.documents(s, d),
          maxDist = 3)),
      "q35_cands_alt" -> ((s, d) => graft.operators.Dedup
        .minhashLsh(graft.core.Tables.documents(s, d), k = 16, bands = 4,
          minEstimate = 0.5)),
      "q21_groups_alt" -> ((s, d) => {
        import org.apache.spark.sql.functions.col
        graft.operators.CoOccur.pairsViaGroups(
          graft.core.Tables.lineitem(s, d).select("l_partkey", "l_suppkey"),
          "l_partkey", "l_suppkey", minShared = 2L, maxItemsPerKey = 64L)
          .select(col("item_a").as("s1"), col("item_b").as("s2"),
            col("shared_keys").as("shared_parts"))
          .orderBy("s1", "s2")
      }))
    names.foreach { name =>
      val fn = (graft.SparkEntry.queries ++ alts).getOrElse(name,
        sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"[explaindump] wrote $outDir/${name}_$suffix.txt (${txt.length} chars)")
      // free anything a query pinned at BUILD time (q44/q100 pin-form
      // checkpoints etc.) so successive dumps don't accumulate blocks
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
