package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.util.Locale
import graft.core.{Sessions, Tables}
import graft.operators.Dedup

/** Deterministic scale diagnostic for the WHOLE near-dup family: each
  * blocking scheme's candidate-pair volume is a pure function of the
  * corpus — Σ over join keys of C(pop, 2) for the symmetric self-joins,
  * Σ popA·popProbe for q113's one-sided multiprobe — so its growth
  * across GenScale corpora measures each operator's asymptote with ZERO
  * timing noise (this VM's scheduler stalls made the round-5 q34 g1→g3
  * wall-clock leg read 1.43; the volume reads the true growth, 1.08).
  *
  * Every volume is computed from the SAME key frames the operators
  * shuffle (Dedup.minhashBandKeys / simhashChunkKeys / prefixKeys /
  * adaptiveBuckets — factored, not reimplemented; CandVolSpec pins each
  * aggregate equal to the enumerated join count on the fixture corpus).
  * Declared-query configurations throughout: q34/q44/q100's df cap,
  * q35's 16×4 bands, q36's maxDist=12, q114's Manku maxDist=3, q97's
  * t=0.5 prefixes, q113's targetPerBucket=256 with radius-1 multiprobe.
  *
  * Per-directory output also carries the q113 bucket stats (planes,
  * bucket count, mean/max pop) — the direct witness that the round-6
  * even-stepping scheme holds populations near target at EVERY n
  * (the round-5 power-of-two stepping let them sawtooth 2×). With 2+
  * dirs, per-leg exponents are emitted against the corpus row-count
  * ratio (docs for text ops, vectors for q113).
  *
  * Usage: runMain graft.tools.CandVol [--out=path.json] <dir> [dir...] */
object CandVol {

  /** Σ over distinct key of C(pop, 2) — the row count of an
    * `id_a < id_b` self-equijoin on `keyCols` (each unordered same-key
    * pair meets exactly once per shared key). */
  def selfJoinVolume(keys: DataFrame, keyCols: Seq[String]): Long =
    keys.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("pop"))
      .agg(sum(col("pop") * (col("pop") - 1) / 2).cast("long"))
      .head().getLong(0)

  /** Σ over distinct key of popA·popB — the row count of an A×B
    * cross-equijoin on `keyCols` (q119's corpus × probe band join). */
  def crossJoinVolume(keysA: DataFrame, keysB: DataFrame,
      keyCols: Seq[String]): Long = {
    val a = keysA.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("pa"))
    val b = keysB.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("pb"))
    a.join(b, keyCols)
      .agg(sum(col("pa") * col("pb")).cast("long")).head().getLong(0)
  }

  /** q115's blocking frame: each surviving vector keyed by its Lloyd
    * cluster, hot clusters (> SemMaxCluster) dropped exactly as the
    * operator drops them before its pair join. [[selfJoinVolume]] on
    * `cid` is then the operator's within-cluster pair count. */
  def semanticBlockKeys(embs: DataFrame): DataFrame = {
    val assign = graft.queries.VectorQueries.semanticClusters(embs)
    val ok = assign.groupBy("cid").agg(count(lit(1)).as("pop"))
      .filter(col("pop") <= graft.queries.VectorQueries.SemMaxCluster)
      .select("cid")
    assign.join(ok, Seq("cid")).select(col("vec_id").as("id"), col("cid"))
  }

  /** q113's asymmetric volume: side A sits in its effective bucket,
    * side B probes the deduped coarsenings of its raw bucket and every
    * single-plane flip; the join feeds Σ_e popA(e) · probeRows(e) rows
    * into the id/cosine filters. Raw-bucket pops are ≤ 2^(p+1) rows —
    * tiny — so the exact per-row probe sets are enumerable on the
    * driver from the (fullb → count) histogram. */
  def adaptiveProbeVolume(bounded: DataFrame,
      scheme: Dedup.AdaptiveScheme,
      maxProbePlanes: Int = Int.MaxValue): (Long, Long, Double, Long) = {
    val popsFull = bounded.groupBy("full").agg(count(lit(1)).as("pop"))
      .select(col("full").cast("int").as("full"), col("pop")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    def coarsen(x: Int): Int = {
      val low = x & ((1 << scheme.nLowPlanes) - 1)
      val top = (x >> scheme.nLowPlanes) & 1
      if (low < scheme.m) low | (top << scheme.nLowPlanes) else low
    }
    val popsEff = popsFull.groupMapReduce { case (f, _) => coarsen(f) }(_._2)(_ + _)
    val flips = 0 +: (0 until math.min(scheme.planesUsed, maxProbePlanes)).map(1 << _)
    // probe rows landing in effective bucket e, from each row's DEDUPED
    // probe set — the exact explode the operator joins
    val probeRows = popsFull.toSeq
      .flatMap { case (f, pop) => flips.map(fl => coarsen(f ^ fl)).distinct.map(_ -> pop) }
      .groupMapReduce(_._1)(_._2)(_ + _)
    val vol = popsEff.iterator.map { case (e, popA) =>
      popA * probeRows.getOrElse(e, 0L)
    }.sum
    val nVec = popsFull.valuesIterator.sum
    val meanPop = if (popsEff.isEmpty) 0.0 else nVec.toDouble / popsEff.size
    (vol, nVec, meanPop, if (popsEff.isEmpty) 0L else popsEff.valuesIterator.max)
  }

  /** All volumes for one corpus directory, keyed by metric name.
    * `familyOnly` (round 11, `--family`): compute only the DECLARED
    * at-scale family — q34-capped, q35, q116, q123, q119, q120, q115 — and
    * skip the documented dials (q36/q114/q122 chunk/permuted simhash,
    * q113 adaptive, q97 prefix), whose key fan-outs are the expensive
    * terms at the g1000 decade and whose envelopes are already
    * measured through g300. */
  /** `--simonly` (round 13): ONLY the q116 vs q123 combination-scheme
    * volumes (plus n_docs) — the focused pair the q123 envelope claim
    * needs at g300/g1000, without re-running the whole family sweep
    * (the r12 --family g1000 session cost ~3 h; the two combo
    * selfJoinVolumes + one portable-signature pass are its small
    * minority). */
  def simVolumes(s: SparkSession, dir: String): Seq[(String, Double)] = {
    val docs = Tables.documents(s, dir)
    val nDocs = docs.count()
    val simsPortable = Dedup.simhashDocsPortable(docs)
    simsPortable.persist()
    val sim116 = selfJoinVolume(
      Dedup.simhashComboKeys(simsPortable, maxDist = 3,
        bits = Dedup.PortableSimHashBits, nBlocks = 6),
      Seq("combo_idx", "combo_key"))
    val sim123 = selfJoinVolume(
      Dedup.simhashComboKeys(simsPortable, maxDist = 3,
        bits = Dedup.PortableSimHashBits, nBlocks = 7),
      Seq("combo_idx", "combo_key"))
    simsPortable.unpersist()
    Seq(("n_docs", nDocs.toDouble),
      ("q116_simhash_combo", sim116.toDouble),
      ("q123_simhash_combo7", sim123.toDouble))
  }

  def volumes(s: SparkSession, dir: String,
      familyOnly: Boolean = false): Seq[(String, Double)] = {
    val docs = Tables.documents(s, dir)
    val embs = Tables.embeddings(s, dir)
    val cap = graft.queries.TextQueries.MaxShingleDf

    // q34/q44/q100 family: distinct doc-shingle postings, df cap —
    // per-row array_distinct, the operator's own shuffle-free form
    // (round 11: the frame-level distinct() was a corpus-sized shuffle
    // that overflowed disk at g1000; see Dedup.docShingles)
    val sh = docs.select(col("doc_id").as("id"),
      explode(array_distinct(
        graft.functions.TextFunctions.shingles(col("text"), 3))).as("shingle"))
    val ng = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .agg(
        count(lit(1)).as("vocab"),
        sum(when(col("df") <= cap, col("df") * (col("df") - 1) / 2)
          .otherwise(0L)).cast("long").as("cand_capped"),
        sum(col("df") * (col("df") - 1) / 2).cast("long").as("cand_uncapped"),
        sum(when(col("df") <= cap, col("df")).otherwise(0L))
          .cast("long").as("postings_kept"),
        sum(when(col("df") > cap, 1).otherwise(0)).cast("long").as("n_hot"))
      .head()

    val nDocs = docs.count()
    val minhash = selfJoinVolume(
      Dedup.minhashBandKeys(docs, k = 16, bands = 4, n = 3),
      Seq("band", "band_hash"))
    val sim36 = if (familyOnly) None else Some(selfJoinVolume(
      Dedup.simhashChunkKeys(Dedup.simhashDocs(docs), maxDist = 12,
        bits = graft.functions.SimHash.Bits),
      Seq("chunk_idx", "chunk")))
    val simsPortable = Dedup.simhashDocsPortable(docs)
    simsPortable.persist()
    val sim114 = if (familyOnly) None else Some(selfJoinVolume(
      Dedup.simhashChunkKeys(simsPortable, maxDist = 3,
        bits = Dedup.PortableSimHashBits),
      Seq("chunk_idx", "chunk")))
    // q116: Manku block-combination tables — the chance-collision term's
    // fix; its volume should stay ~linear where sim114's n²/2^15 term
    // has taken over
    val sim116 = selfJoinVolume(
      Dedup.simhashComboKeys(simsPortable, maxDist = 3,
        bits = Dedup.PortableSimHashBits, nBlocks = 6),
      Seq("combo_idx", "combo_key"))
    // q123: the 7-block rung (C(7,4)=35 tables on 32-36-bit keys) — the
    // answer to q116's measured 2^30 envelope (volume 1.204 at g1000);
    // in the at-scale family because its deep-decade volume IS the
    // claim it exists to carry
    val sim123 = selfJoinVolume(
      Dedup.simhashComboKeys(simsPortable, maxDist = 3,
        bits = Dedup.PortableSimHashBits, nBlocks = 7),
      Seq("combo_idx", "combo_key"))
    // q122: recursive permuted tables — 16 tables on 26-27-bit keys;
    // volume should track q116's ~1.0 at 20% less fan-out
    val sim122 = if (familyOnly) None else Some(selfJoinVolume(
      Dedup.simhashPermutedKeys(simsPortable, maxDist = 3,
        bits = Dedup.PortableSimHashBits, nOuter = 4, nInner = 4),
      Seq("tbl_idx", "tbl_key")))
    simsPortable.unpersist()
    val prefix = if (familyOnly) None else Some(selfJoinVolume(
      Dedup.prefixKeys(docs, threshold = 0.5), Seq("shingle")))
    // q119: corpus × probe band join — the decontamination shape; the
    // probe slice is the declared query's own doc_id % mod split
    val dmod = graft.queries.TextQueries.DecontamMod
    val cross = crossJoinVolume(
      Dedup.minhashBandKeys(docs.filter(col("doc_id") % dmod =!= 0)),
      Dedup.minhashBandKeys(docs.filter(col("doc_id") % dmod === 0)),
      Seq("band", "band_hash"))
    // q120: incremental-ingest dedup — the history-index probe (cross
    // join, linear in the history for a fixed band scheme) plus the
    // in-batch self-join, at the declared batch slice
    val imod = graft.queries.TextQueries.IngestMod
    val bh120 = Dedup.minhashBandKeys(docs.filter(col("doc_id") % imod =!= 0))
    val bb120 = Dedup.minhashBandKeys(docs.filter(col("doc_id") % imod === 0))
    val ingestCross = crossJoinVolume(bh120, bb120, Seq("band", "band_hash"))
    val ingestWithin = selfJoinVolume(bb120, Seq("band", "band_hash"))
    // q115: pair work is confined to Lloyd clusters ≤ the size cap —
    // Σ over surviving clusters of C(pop, 2), from the operator's own
    // cluster assignment (semanticClusters — factored, not reimplemented)
    val semVol = selfJoinVolume(semanticBlockKeys(embs), Seq("cid"))

    val ad = if (familyOnly) None else {
      val (bounded, scheme) = Dedup.adaptiveBuckets(embs)
      val (adVol, nVecs, adMean, adMax) = adaptiveProbeVolume(bounded, scheme)
      // the probe-plane cap dial (Dedup.probeBuckets maxProbePlanes=8):
      // volume with the probe-growth term frozen — the <=1.1-exponent
      // configuration, at the documented recall cost on deep corpora
      val (adVolCap, _, _, _) = adaptiveProbeVolume(bounded, scheme, 8)
      System.err.println(
        f"[candvol] $dir q113: planes=${scheme.planesUsed} buckets=${scheme.nBuckets} " +
          f"mean_pop=$adMean%.1f max_pop=$adMax")
      Some((adVol, nVecs, adMean, adMax, adVolCap, scheme))
    }
    // n_vecs is ALWAYS the full table count (ADVICE r11): the bounded
    // frame's count excludes vectors in blocks dropped by the
    // maxItemsPerBlock left_anti, so using it as the exponent base in
    // full mode while --family used embs.count() would give q113/q115
    // exponents computed across modes different denominators. The
    // bounded count stays available as its own q113 metric below.
    val nVecs = embs.count()
    Seq(
      ("n_docs", nDocs.toDouble),
      ("n_vecs", nVecs.toDouble),
      ("vocab", ng.getLong(0).toDouble),
      ("q34_cand_capped", ng.getLong(1).toDouble),
      ("q34_cand_uncapped", ng.getLong(2).toDouble),
      ("postings_kept", ng.getLong(3).toDouble),
      ("hot_shingles_pruned", ng.getLong(4).toDouble),
      ("q35_minhash_bands", minhash.toDouble)) ++
      sim36.map(v => ("q36_simhash_d12", v.toDouble)) ++
      sim114.map(v => ("q114_simhash_manku", v.toDouble)) ++
      Seq(("q116_simhash_combo", sim116.toDouble),
        ("q123_simhash_combo7", sim123.toDouble)) ++
      sim122.map(v => ("q122_simhash_permuted", v.toDouble)) ++
      prefix.map(v => ("q97_prefix", v.toDouble)) ++
      Seq(
        ("q119_cross_bands", cross.toDouble),
        ("q120_hist_probe", ingestCross.toDouble),
        ("q120_within_batch", ingestWithin.toDouble)) ++
      ad.toSeq.flatMap { case (adVol, boundedVecs, adMean, adMax, adVolCap, scheme) =>
        Seq(
          ("q113_bounded_vecs", boundedVecs.toDouble),
          ("q113_adaptive_probe", adVol.toDouble),
          ("q113_probe_cap8", adVolCap.toDouble),
          ("q113_n_planes", scheme.planesUsed.toDouble),
          ("q113_n_buckets", scheme.nBuckets.toDouble),
          ("q113_mean_bucket_pop", adMean),
          ("q113_max_bucket_pop", adMax.toDouble))
      } ++
      Seq(("q115_semantic_blocks", semVol.toDouble))
  }

  private def fmt(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else String.format(Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val out = args.collectFirst { case a if a.startsWith("--out=") => a.drop(6) }
    val familyOnly = args.contains("--family")
    val simOnly = args.contains("--simonly")
    val dirs = args.filterNot(_.startsWith("--")).toSeq
    require(dirs.nonEmpty,
      "usage: CandVol [--out=path.json] [--family|--simonly] <dir> [dir...]")
    val s = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "candvol")
    val perDir = dirs.map(d => d ->
      (if (simOnly) simVolumes(s, d) else volumes(s, d, familyOnly)))
    perDir.foreach { case (d, vs) =>
      println(s"$d " + vs.map { case (k, v) => s"$k=${fmt(v)}" }.mkString(" "))
    }
    // per-leg volume exponents between consecutive dirs, scaled by the
    // corpus's own row-count ratio (docs for text ops, vectors for
    // q113/q115)
    val volKeys = Seq("q34_cand_capped", "q34_cand_uncapped",
      "q35_minhash_bands", "q36_simhash_d12", "q114_simhash_manku",
      "q116_simhash_combo", "q123_simhash_combo7",
      "q122_simhash_permuted", "q97_prefix",
      "q119_cross_bands",
      "q120_hist_probe", "q120_within_batch",
      "q113_adaptive_probe", "q113_probe_cap8", "q115_semantic_blocks")
    val legs = perDir.sliding(2).collect { case Seq((d1, v1), (d2, v2)) =>
      val m1 = v1.toMap; val m2 = v2.toMap
      val exps = volKeys.flatMap { k =>
        val base = if (k.startsWith("q113") || k.startsWith("q115")) "n_vecs" else "n_docs"
        // look the base up lazily INSIDE the guard: a focused mode
        // (--simonly) emits no n_vecs, and an eager m2(base) here threw
        // AFTER the volumes printed (round 13 — counts were recovered
        // from stdout, but the exponent lines never ran)
        for {
          a <- m1.get(k); b <- m2.get(k)
          r1 <- m1.get(base); r2 <- m2.get(base)
          ratio = r2 / r1
          if a > 0 && b > 0 && ratio > 1
        } yield k -> math.log(b / a) / math.log(ratio)
      }
      exps.foreach { case (k, e) =>
        System.err.println(f"[candvol] $d1 -> $d2 $k%-22s exponent=$e%5.2f")
      }
      (d1, d2, exps)
    }.toSeq
    out.foreach { path =>
      val dirJson = perDir.map { case (d, vs) =>
        "\"" + d + "\":" + vs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
          .mkString("{", ",", "}")
      }.mkString("{", ",", "}")
      val legJson = legs.map { case (d1, d2, exps) =>
        s"""{"from":"$d1","to":"$d2","exponents":""" +
          exps.map { case (k, e) => "\"" + k + "\":" + fmt(e) }
            .mkString("{", ",", "}") + "}"
      }.mkString("[", ",", "]")
      val json =
        s"""{"metric":"candidate_volumes","what":"deterministic asymptote check: candidate-pair volume of each near-dup blocking scheme, computed from the operators' own key frames (zero timing noise); exponents are per-leg log(vol ratio)/log(corpus ratio)","dirs":$dirJson,"legs":$legJson}"""
      Files.writeString(Paths.get(path), json + "\n")
      println(json)
    }
    s.stop()
  }
}
