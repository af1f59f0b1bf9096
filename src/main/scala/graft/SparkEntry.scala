package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, PipelineQueries, Relational, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one named query per implemented operator from SURVEY.md §2
  * (plus the beyond-reference training-data operators); `oracleSql` holds the
  * DuckDB twin for every SQL-expressible query. Column names and ordering are
  * aligned pairwise — the driver sorts columns by name and hash-compares.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q07MultiJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.all ++ TextQueries.all ++ VectorQueries.all ++ PipelineQueries.all ++
      AnalyticsQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ TextQueries.oracle ++ VectorQueries.oracle ++ PipelineQueries.oracle ++
      AnalyticsQueries.oracle

  /** Headline subset used by Bench (fast, scale-representative).
    *
    * The first 12 names are the round-1/2 set — their per-query numbers
    * stay comparable across BENCH_r* artifacts. Round 3 appends the six
    * scale-interesting new operators (iterative connected components,
    * LSH-blocked embedding near-dup, contamination join, greedy packing,
    * iterative integer PageRank, top-k triangle counting), and the late
    * round-3 session appends three more (prefix-filter similarity join,
    * iterative integer k-means, the q100 end-to-end pipeline); the
    * "total" metric therefore covers 21 queries from then on — compare
    * per-query across rounds, never totals. Round 5 appends the two
    * declared at-scale near-dup forms (adaptive-plane embedding
    * near-dup, Manku-width simhash) and SemDeDup → 24 queries; round 6
    * appends the two asymptote-hardened forms (block-combination
    * simhash, probe-capped adaptive near-dup) plus cross-corpus
    * decontamination → 27, and the late session adds incremental-ingest
    * dedup (the production corpus-update shape) → 28.
    *
    * Scale framing (round 8, VERDICT r7 #4 closing the r6 #1 re-scope):
    * the headline carries only NON-QUADRATIC simhash forms — q116
    * (block-combination tables, volume ~1.00 on every measured decade)
    * and q122 (recursive permuted tables, 16 tables on 27-bit keys, the
    * low-fan-out variant). The chunk-scheme dials q36/q114 (volume
    * exponent ~2.0 by construction, constant 2⁻¹⁵, honest envelope
    * ~10⁶ docs) left the headline in round 8 but remain DECLARED and
    * oracled — their md5-portable mechanism oracles are the family's
    * strongest machinery proof. Likewise q113 is the exact-recall
    * flagship near-dup and q117 its probe-capped at-scale dial. */
  def headline: Seq[String] = Seq(
    "q01_pricing_summary", "q03_join_agg", "q07_multi_join",
    "q10_argmax_window", "q13_hindex", "q19_running_sum",
    "q21_cosupply_pairs", "q25_tumbling_window", "q27_sessionize",
    "q33_dedup_exact", "q38_knn_bruteforce", "q42_asof_join",
    "q40_embed_neardup", "q44_dedup_clusters", "q50_contamination",
    "q54_pack_shards", "q68_pagerank", "q74_triangles",
    "q97_prefix_join", "q99_kmeans", "q100_pipeline_e2e",
    "q113_embed_neardup_adaptive", "q115_semantic_dedup",
    "q116_simhash_combos", "q117_embed_neardup_capped",
    "q119_fuzzy_decontam", "q120_incremental_dedup",
    "q122_simhash_permuted")
}
