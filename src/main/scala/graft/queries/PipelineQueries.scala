package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{TextFunctions => T}
import graft.operators.{Packing, Sampling}

/** Training-data pipeline composition queries: chunking, contamination,
  * PII scrub, mixture sampling, repetition filtering, sequence packing —
  * the steps between "deduped corpus" (TextQueries) and "training run".
  *
  * Every query has an exact DuckDB twin; where a computation involves
  * hashing, only portable md5 arithmetic reaches the output so the twin
  * reproduces every value bit-for-bit.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Chunk window size / stride (tokens): 32-token windows every 24
    * tokens — 8-token overlap so no span is split across chunk borders. */
  val ChunkW = 32
  val ChunkS = 24

  /** Packing shard capacity (tokens). */
  val PackCapacity = 256L

  /** Context-window chunking: overlapping fixed-size token windows per
    * document (the "split long docs for a 32-token context" step). A doc
    * with n tokens yields 1 + ceil(max(n-W,0)/S) chunks; the final chunk
    * is allowed to run short. Narrow per-row explode — no shuffle; chunk
    * count per row is bounded by n/S so memory stays flat at any scale. */
  def q49ChunkWindows(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), T.tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")))
      .withColumn("nchunks",
        floor((greatest(col("n") - ChunkW, lit(0)) + lit(ChunkS - 1)) / lit(ChunkS))
          .cast("int") + lit(1))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), col("nchunks") - 1)).as("chunk_idx"))
      .withColumn("start", col("chunk_idx") * ChunkS + 1)
      .withColumn("chunk", slice(col("t"), col("start"), lit(ChunkW)))
      .select(col("doc_id"), col("chunk_idx"), col("start"),
        size(col("chunk")).as("n_chunk_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_fp"))
      .orderBy("doc_id", "chunk_idx")

  /** Benchmark-contamination check: for every train-split document (q48's
    * md5 split), the count of distinct 3-gram shingles it shares with ANY
    * test-split document. The test set plays the "held-out benchmark"
    * role; a train doc with high overlap would leak the benchmark into
    * training. The benchmark shingle set is small by construction (the
    * test split is ~10% and real benchmark suites are tiny), so it is
    * broadcast — the corpus-side scan never shuffles. */
  def q50Contamination(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(s, d)
      .withColumn("bk", T.hashBucket(col("doc_id"), 100))
      .select(col("doc_id"), col("bk"),
        explode(array_distinct(T.shingles(col("text"), 3))).as("shingle"))
    val train = sh.filter(col("bk") < 80).select("doc_id", "shingle")
    val testShingles = sh.filter(col("bk") >= 90).select("shingle").distinct()
    val sizes = train.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val overlap = train.join(broadcast(testShingles), "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_common"))
    overlap.join(sizes, "doc_id")
      .select(col("doc_id"), col("n_shingles"), col("n_common"),
        round(col("n_common") / col("n_shingles").cast("double"), 4).as("overlap"))
      .withColumn("contaminated", col("overlap") >= 0.2)
      .orderBy("doc_id")
  }

  /** PII injected deterministically per row (the corpus itself is clean),
    * so the scrub path is exercised on real matches in BOTH engines. */
  private def augmentedText = concat(col("text"),
    lit(" contact doc"), col("doc_id").cast("string"),
    lit("@mail.example.com tel 555-867-"),
    lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
    lit(" ip 192.168."), pmod(col("doc_id"), lit(256)).cast("string"),
    lit("."), pmod(col("doc_id") * 7, lit(256)).cast("string"))

  /** PII detect + redact: per-pattern match counts on the (augmented)
    * text and the fingerprint of the scrubbed output. Pure regexp chain —
    * codegen'd, linear, no shuffle. */
  def q51PiiScrub(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("aug", augmentedText)
      .select(col("doc_id"),
        T.piiCount(col("aug"), T.piiPatterns(0)._2).as("n_email"),
        T.piiCount(col("aug"), T.piiPatterns(1)._2).as("n_phone"),
        T.piiCount(col("aug"), T.piiPatterns(2)._2).as("n_ipv4"),
        md5(T.scrubPii(col("aug"))).as("scrub_fp"))
      .orderBy("doc_id")

  /** Mixture sampling: per-source percentage rates (derived here from the
    * source suffix: rate = 10 + 37·k mod 211, spanning 10%..220% so both
    * down- AND up-sampling paths run), applied by deterministic hash
    * membership ([[Sampling.resample]]). Output: per source, input docs vs
    * emitted rows. */
  def q52MixtureSample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("rate",
        lit(10) + pmod(substring(col("source"), 4, 10).cast("int") * 37, lit(211)))
    val nIn = docs.groupBy("source", "rate").agg(count(lit(1)).as("n_docs_in"))
    val nOut = Sampling.resample(docs, col("doc_id"), col("rate"))
      .groupBy("source", "rate").agg(count(lit(1)).as("n_rows_out"))
    nIn.join(nOut, Seq("source", "rate"), "left")
      .select(col("source"), col("rate"), col("n_docs_in"),
        coalesce(col("n_rows_out"), lit(0L)).as("n_rows_out"))
      .orderBy("source")
  }

  /** Gopher-style repetition signals: duplicate-token fraction (per-row
    * array math) and most-frequent-bigram fraction (explode → two-level
    * aggregate — the scalable formulation: per-doc maps stay distributed,
    * nothing collects). */
  def q53Repetition(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val base = docs.select(col("doc_id"),
      T.nTokens(col("text")).as("n_tokens"),
      T.dupTokenFrac(col("text")).as("dup_frac"))
    val bigramStats = docs
      .select(col("doc_id"), explode(T.shingles(col("text"), 2)).as("bg"))
      .groupBy("doc_id", "bg").count()
      .groupBy("doc_id")
      .agg(max(col("count")).as("top_bg"), sum(col("count")).as("n_bg"))
    base.join(bigramStats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("dup_frac"),
        coalesce(round(col("top_bg") / col("n_bg").cast("double"), 4), lit(0.0))
          .as("top_bigram_frac"))
      .withColumn("repetitive",
        col("dup_frac") >= 0.5 || col("top_bigram_frac") >= 0.1)
      .orderBy("doc_id")
  }

  /** Sequence packing: greedy in-order packing of each source's docs into
    * 256-token shards ([[Packing.packGreedy]] — parallel across sources,
    * one sequential pass within). */
  def q54PackShards(s: SparkSession, d: String): DataFrame =
    Packing.packGreedy(
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), T.nTokens(col("text")).as("n_tokens")),
      "source", "doc_id", "n_tokens", PackCapacity)
      .orderBy("source", "doc_id")

  /** Sub-group cap for [[q111PackCapped]]: small enough that every
    * source (25 docs at sf0.01) splits into 3 sub-groups, so the
    * two-level machinery — portable-hash salting, parallel sub-group
    * packing, cumulative shard-id stitching — is genuinely exercised
    * and oracle-checked, not just the degenerate 1-sub-group path. */
  val PackMaxGroupRows = 10L

  /** Two-level capped packing (q54's scalable sibling): groups larger
    * than [[PackMaxGroupRows]] rows are salted into deterministic
    * sub-groups packed in parallel, shard ids stitched dense per group.
    * The salt is the portable md5 [[T.hash16]], so the DuckDB oracle
    * reproduces the exact assignment (sub-group membership, per-sub
    * greedy scan, cumulative offsets) bit-for-bit. */
  def q111PackCapped(s: SparkSession, d: String): DataFrame =
    Packing.packGreedyCapped(
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), T.nTokens(col("text")).as("n_tokens")),
      "source", "doc_id", "n_tokens", PackCapacity, PackMaxGroupRows)
      .orderBy("source", "doc_id")

  /** Unigram-surprisal quality score (the one-gram core of CCNet-style
    * LM filtering): corpus MLE unigram probabilities, then per-doc mean
    * -log2 p(token) = "bits per token" — unusually surprising docs are
    * filter candidates. Two-level shape: vocab aggregate, then a join
    * back on token. The token join is the textbook skew case (stopwords
    * dominate), so it is left to AQE's skew-join split rather than a
    * forced broadcast — at 100 TB the vocab can be 10^7 rows but the
    * per-token counts remain a thin two-column table. */
  def q55UnigramSurprisal(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(T.tokens(col("text"))).as("t"))
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).cast("double").as("s"))
    tok.join(vocab, "t")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(-avg(log2(col("c") / col("s"))), 4).as("bits_per_token"))
      .orderBy("doc_id")
  }

  /** Deterministic weighted sampling (priority sampling, Duffield-Lund-
    * Thorup): the 25 documents with the highest weight/u priorities,
    * weight = token count, u = portable md5 uniform. Inclusion is
    * weight-proportional yet a pure function of doc identity — rerun it
    * on any cluster and the same docs come back. Plans as
    * TakeOrderedAndProject: per-partition top-k + merge, no global sort. */
  def q59WeightedSample(s: SparkSession, d: String): DataFrame =
    Sampling.samplePriority(
      Tables.documents(s, d)
        .select(col("doc_id"), T.nTokens(col("text")).as("weight")),
      col("doc_id"), col("weight"), k = 25)
      .orderBy(col("priority").desc, col("doc_id"))

  /** Stratified weighted sampling: a fixed 5-doc budget PER SOURCE, the
    * per-stratum form of q59 (same portable priorities, but the top-k is
    * a per-group window after one group-key shuffle instead of a global
    * TakeOrderedAndProject). The eval-set construction pattern: every
    * source is represented, long docs are favored, and the pick is a
    * pure function of doc identity. */
  def q62StratifiedSample(s: SparkSession, d: String): DataFrame =
    Sampling.samplePriorityPerGroup(
      Tables.documents(s, d)
        .select(col("source"), col("doc_id"), T.nTokens(col("text")).as("weight")),
      col("doc_id"), col("weight"), col("source"), k = 5)
      .orderBy(col("source"), col("priority").desc, col("doc_id"))

  /** BM25 query terms / parameters (Robertson-Sparck Jones with the
    * Lucene +1 idf floor; k1/b the standard defaults). The parameters are
    * DECIMAL STRINGS, rendered verbatim into both the Spark literals and
    * the DuckDB SQL — a host-side float computation (1.2 + 1) need not
    * round to the same double as the literal "2.2" both engines parse. */
  val Bm25Terms: Seq[String] = Seq("spark", "merge", "window")
  val Bm25K1 = "1.2"
  val Bm25K1Plus1 = "2.2"
  val Bm25OneMinusB = "0.25"
  val Bm25B = "0.75"

  /** BM25 retrieval scoring: rank the corpus for a fixed term query.
    * Per-doc term frequencies are per-row array math (no explode); the
    * corpus statistics (N, avgdl, per-term document frequencies) are ONE
    * 1-row aggregate broadcast back over the scan — at 100 TB the corpus
    * is read twice and nothing wider than a single stats row ever
    * shuffles. Like q61 (TF-IDF), ordering is on the ROUNDED score with a
    * doc_id tiebreak so a last-ulp ln() difference between engines can't
    * flip the top-k boundary. */
  def q91Bm25(s: SparkSession, d: String): DataFrame = {
    val t = Tables.documents(s, d)
      .select(col("doc_id"), T.tokens(col("text")).as("t"))
      .withColumn("dl", size(col("t")))
    val withTf = Bm25Terms.zipWithIndex.foldLeft(t) { case (df, (term, i)) =>
      df.withColumn(s"tf$i", size(filter(col("t"), x => x === lit(term))))
    }.drop("t")
    val stats = withTf.agg(
      count(lit(1)).as("n"),
      sum("dl").cast("double").as("sdl") +:
        Bm25Terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).cast("double").as(s"df$i")): _*)
    val avgdl = col("sdl") / col("n")
    val score = Bm25Terms.indices.map { i =>
      val tf = col(s"tf$i")
      val idf = log((col("n") - col(s"df$i") + lit(0.5)) / (col(s"df$i") + lit(0.5)) + lit(1.0))
      idf * (tf * lit(Bm25K1Plus1.toDouble)) /
        (tf + lit(Bm25K1.toDouble) *
          (lit(Bm25OneMinusB.toDouble) + lit(Bm25B.toDouble) * col("dl") / avgdl))
    }.reduce(_ + _)
    withTf.crossJoin(broadcast(stats))
      .select(col("doc_id") +: col("dl").as("n_tokens") +:
        Bm25Terms.zipWithIndex.map { case (term, i) => col(s"tf$i").as(s"tf_$term") } :+
        round(score, 4).as("bm25"): _*)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  /** Per-source document cap (the fixture corpus carries 25-250 docs per
    * source depending on SF, so 15 genuinely trims at every SF). */
  val SourceCap = 15

  /** Per-source corpus capping (the C4/Gopher "cap documents per domain"
    * step): keep at most [[SourceCap]] docs per source, chosen by the
    * portable md5 uniform so the kept SET is a pure function of doc
    * identity — rerun on any cluster, same survivors. One group-key
    * shuffle + per-group window; the kept-set md5 fingerprint (sorted
    * doc_ids) proves set equality, not just counts, under the oracle. */
  def q92SourceCap(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("source").orderBy(col("u"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"))
      .withColumn("u", T.hashUniform(col("doc_id")))
      .withColumn("kept", row_number().over(w) <= SourceCap)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("kept").cast("long")).as("n_kept"),
        (count(lit(1)) - sum(col("kept").cast("long"))).as("n_dropped"),
        md5(concat_ws(",",
          transform(array_sort(collect_list(when(col("kept"), col("doc_id")))),
            _.cast("string")))).as("kept_fp"))
      .orderBy("source")
  }

  /** Shard count for the deterministic corpus shuffle. */
  val NShards = 8

  /** Deterministic corpus shuffle + sharding (training-order
    * randomization): shard by one salted md5 bucket, position within the
    * shard by an independent salted md5 key. This is hash-partition +
    * sort-WITHIN-partition — Spark's native shuffle shape — so at 100 TB
    * there is no global sort: each shard sorts independently
    * (`repartition(shard).sortWithinPartitions(skey)` writes training
    * shards straight out), yet the (shard, pos) assignment is a pure
    * function of doc identity, reproducible on any cluster layout. */
  def q93CorpusShuffle(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("skey"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"))
      .withColumn("shard",
        T.hashBucket(concat(lit("shard:"), col("doc_id").cast("string")), NShards).cast("int"))
      .withColumn("skey", md5(concat(lit("epoch0:"), col("doc_id").cast("string"))))
      .withColumn("pos", row_number().over(w))
      .select(col("shard"), col("pos"), col("doc_id"))
      .orderBy("shard", "pos")
  }

  /** Alphabet for the character-entropy signal: the 26 ascii letters plus
    * space — the characters the synthetic corpus (and most natural text)
    * is made of. */
  val EntropyAlphabet: Seq[String] = ('a' to 'z').map(_.toString) :+ " "

  /** Character-distribution Shannon entropy per document — the classic
    * low-entropy/gibberish quality signal (boilerplate and repeated-char
    * junk score low, natural text ~4 bits). Counts come from the custom
    * codegen'd [[graft.functions.CharCountsExpr]]: ONE string pass per
    * row (the pure-functions alternative needs one replace/length pair
    * per alphabet char = 27 scans), zero explode, zero shuffle — the
    * entropy of a 100 TB corpus costs one narrow scan. The entropy fold
    * runs in alphabet order in both engines (array fold here, literal
    * term chain in the DuckDB twin — identical left-to-right sums), so
    * the only cross-engine FP risk is log2's last ulp, hidden by
    * round(4). */
  def q94CharEntropy(s: SparkSession, d: String): DataFrame = {
    val totD = col("tot").cast("double")
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.CharCountsFn
          .charCounts(lower(col("text")), EntropyAlphabet.mkString).as("cnt"))
      .withColumn("tot", aggregate(col("cnt"), lit(0), (a, c) => a + c))
      .select(col("doc_id"), col("tot").as("n_alpha"),
        aggregate(col("cnt"), lit(0), (a, c) => a + when(c > 0, 1).otherwise(0))
          .as("n_distinct_chars"),
        when(col("tot") > 0,
          round(-aggregate(col("cnt"), lit(0.0),
            (a, c) => a + when(c > 0, (c / totD) * log2(c / totD)).otherwise(lit(0.0))), 4))
          .otherwise(lit(0.0))
          .as("entropy_bits"))
      .orderBy("doc_id")
  }

  val all: Map[String, Q] = Map(
    "q91_bm25" -> (q91Bm25 _),
    "q92_source_cap" -> (q92SourceCap _),
    "q93_corpus_shuffle" -> (q93CorpusShuffle _),
    "q94_char_entropy" -> (q94CharEntropy _),
    "q62_stratified_sample" -> (q62StratifiedSample _),
    "q49_chunk_windows" -> (q49ChunkWindows _),
    "q50_contamination" -> (q50Contamination _),
    "q51_pii_scrub" -> (q51PiiScrub _),
    "q52_mixture_sample" -> (q52MixtureSample _),
    "q53_repetition" -> (q53Repetition _),
    "q54_pack_shards" -> (q54PackShards _),
    "q111_pack_capped" -> (q111PackCapped _),
    "q55_unigram_surprisal" -> (q55UnigramSurprisal _),
    "q59_weighted_sample" -> (q59WeightedSample _),
  )

  /** The q48/q50/q52 md5 hash bucket, as DuckDB SQL over an id expression. */
  private def bucketSql(id: String): String = T.hashBucketSql(id, 100)

  private val augSql: String =
    "text || ' contact doc' || CAST(doc_id AS VARCHAR) || '@mail.example.com tel 555-867-' || " +
      "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ip 192.168.' || " +
      "CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)"

  /** q94's per-char count as DuckDB SQL (length-difference trick). */
  private def entCntSql(i: Int): String = {
    val ch = if (EntropyAlphabet(i) == "'") "''" else EntropyAlphabet(i)
    s"(length(s) - length(replace(s, '$ch', '')))"
  }

  private val bm25Sql: String = {
    val tfs = Bm25Terms.indices.map(i =>
      s"len(list_filter(t, x -> x = '${Bm25Terms(i)}')) AS tf$i").mkString(", ")
    val dfs = Bm25Terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i").mkString(", ")
    val terms = Bm25Terms.indices.map { i =>
      s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0) * (tf$i * $Bm25K1Plus1) / " +
        s"(tf$i + $Bm25K1 * ($Bm25OneMinusB + $Bm25B * dl / (sdl / n)))"
    }.mkString(" + ")
    val outTf = Bm25Terms.zipWithIndex
      .map { case (t, i) => s"CAST(tf$i AS INTEGER) AS tf_$t" }.mkString(", ")
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |f AS (SELECT doc_id, len(t) AS dl, $tfs FROM d),
       |st AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) AS sdl, $dfs FROM f)
       |SELECT doc_id, CAST(dl AS INTEGER) AS n_tokens, $outTf,
       |  round($terms, 4) AS bm25
       |FROM f CROSS JOIN st ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
  }

  private val charEntropySql: String = {
    val n = EntropyAlphabet.size
    val cnts = (0 until n).map(i => s"${entCntSql(i)} AS c$i").mkString(", ")
    val tot = (0 until n).map(i => s"c$i").mkString(" + ")
    val distinct = (0 until n).map(i => s"(CASE WHEN c$i > 0 THEN 1 ELSE 0 END)").mkString(" + ")
    val terms = (0 until n).map(i =>
      s"(CASE WHEN c$i > 0 THEN (c$i / CAST(tot AS DOUBLE)) * log2(c$i / CAST(tot AS DOUBLE)) ELSE 0.0 END)")
      .mkString(" + ")
    s"""WITH lo AS (SELECT doc_id, lower(text) AS s FROM documents),
       |c AS (SELECT doc_id, $cnts FROM lo),
       |t AS (SELECT doc_id, *, ($tot) AS tot FROM c)
       |SELECT doc_id, CAST(tot AS INTEGER) AS n_alpha,
       |  CAST($distinct AS INTEGER) AS n_distinct_chars,
       |  CASE WHEN tot > 0 THEN round(-($terms), 4) ELSE 0.0 END AS entropy_bits
       |FROM t ORDER BY doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q91_bm25" -> bm25Sql,
    "q92_source_cap" ->
      s"""WITH u AS (SELECT source, doc_id, ${T.hashUniformSql("doc_id")} AS u FROM documents),
         |r AS (SELECT source, doc_id,
         |  row_number() OVER (PARTITION BY source ORDER BY u, doc_id) <= $SourceCap AS kept
         |  FROM u)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(count(*) - sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  md5(array_to_string(list_sort(list(doc_id) FILTER (WHERE kept)), ',')) AS kept_fp
         |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "q93_corpus_shuffle" ->
      s"""WITH d AS (SELECT doc_id,
         |  ${T.hashBucketSql("'shard:' || CAST(doc_id AS VARCHAR)", NShards)} AS shard,
         |  md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS skey FROM documents)
         |SELECT CAST(shard AS INTEGER) AS shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) AS INTEGER) AS pos,
         |  doc_id
         |FROM d ORDER BY shard, pos""".stripMargin,
    "q94_char_entropy" -> charEntropySql,
    "q49_chunk_windows" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |n AS (SELECT doc_id, t, len(t) AS n,
         |  1 + (greatest(len(t) - $ChunkW, 0) + ${ChunkS - 1}) // $ChunkS AS nchunks FROM d),
         |c AS (SELECT doc_id, t, n, unnest(range(0, nchunks)) AS ci FROM n)
         |SELECT doc_id, CAST(ci AS INTEGER) AS chunk_idx,
         |  CAST(ci * $ChunkS + 1 AS INTEGER) AS start,
         |  CAST(len(t[ci * $ChunkS + 1 : ci * $ChunkS + $ChunkW]) AS INTEGER) AS n_chunk_tokens,
         |  md5(array_to_string(t[ci * $ChunkS + 1 : ci * $ChunkS + $ChunkW], ' ')) AS chunk_fp
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q50_contamination" ->
      s"""WITH d AS (SELECT doc_id, ${bucketSql("doc_id")} AS bk,
         |  string_split(text, ' ') AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, bk,
         |  unnest(list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))) AS shingle
         |  FROM d WHERE len(t) >= 3),
         |tr AS (SELECT doc_id, shingle FROM sh WHERE bk < 80),
         |te AS (SELECT DISTINCT shingle FROM sh WHERE bk >= 90),
         |sz AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY doc_id),
         |ov AS (SELECT tr.doc_id, count(*) AS n_common FROM tr JOIN te USING (shingle) GROUP BY tr.doc_id)
         |SELECT ov.doc_id, sz.n_shingles, ov.n_common,
         |  round(ov.n_common / CAST(sz.n_shingles AS DOUBLE), 4) AS overlap,
         |  round(ov.n_common / CAST(sz.n_shingles AS DOUBLE), 4) >= 0.2 AS contaminated
         |FROM ov JOIN sz USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q51_pii_scrub" ->
      s"""WITH a AS (SELECT doc_id, $augSql AS aug FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(aug, '${T.piiPatterns(0)._2}')) AS INTEGER) AS n_email,
         |  CAST(len(regexp_extract_all(aug, '${T.piiPatterns(1)._2}')) AS INTEGER) AS n_phone,
         |  CAST(len(regexp_extract_all(aug, '${T.piiPatterns(2)._2}')) AS INTEGER) AS n_ipv4,
         |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
         |    '${T.piiPatterns(0)._2}', '<EMAIL>', 'g'),
         |    '${T.piiPatterns(1)._2}', '<PHONE>', 'g'),
         |    '${T.piiPatterns(2)._2}', '<IPV4>', 'g')) AS scrub_fp
         |FROM a ORDER BY doc_id""".stripMargin,
    "q52_mixture_sample" ->
      s"""WITH c AS (SELECT doc_id, source,
         |  10 + (CAST(substring(source, 4) AS INTEGER) * 37) % 211 AS rate,
         |  ${bucketSql("doc_id")} AS bk FROM documents)
         |SELECT source, rate, count(*) AS n_docs_in,
         |  CAST(sum(rate // 100 + CASE WHEN bk < rate % 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_out
         |FROM c GROUP BY source, rate ORDER BY source""".stripMargin,
    "q53_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |  i -> t[i] || ' ' || t[i+1])) AS b FROM d WHERE len(t) >= 2),
        |bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
        |bs AS (SELECT doc_id, max(c) AS top_bg, CAST(sum(c) AS BIGINT) AS n_bg FROM bc GROUP BY doc_id)
        |SELECT d.doc_id, CAST(len(t) AS INTEGER) AS n_tokens,
        |  round(1 - len(list_distinct(t)) / CAST(len(t) AS DOUBLE), 4) AS dup_frac,
        |  coalesce(round(top_bg / CAST(n_bg AS DOUBLE), 4), 0.0) AS top_bigram_frac,
        |  (round(1 - len(list_distinct(t)) / CAST(len(t) AS DOUBLE), 4) >= 0.5
        |   OR coalesce(round(top_bg / CAST(n_bg AS DOUBLE), 4), 0.0) >= 0.1) AS repetitive
        |FROM d LEFT JOIN bs ON d.doc_id = bs.doc_id ORDER BY d.doc_id""".stripMargin,
    "q54_pack_shards" ->
      s"""WITH RECURSIVE d AS (SELECT source, doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
         |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn FROM documents),
         |r AS (
         |  SELECT source, rn, doc_id, tok, CAST(0 AS BIGINT) AS shard, tok AS fill
         |  FROM d WHERE rn = 1
         |  UNION ALL
         |  SELECT d.source, d.rn, d.doc_id, d.tok,
         |    CASE WHEN r.fill + d.tok <= $PackCapacity THEN r.shard ELSE r.shard + 1 END,
         |    CASE WHEN r.fill + d.tok <= $PackCapacity THEN r.fill + d.tok ELSE d.tok END
         |  FROM d JOIN r ON d.source = r.source AND d.rn = r.rn + 1)
         |SELECT source, doc_id, tok AS n_tokens, shard FROM r
         |ORDER BY source, doc_id""".stripMargin,
    "q111_pack_capped" ->
      s"""WITH RECURSIVE d AS (SELECT source, doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM documents),
         |ns AS (SELECT source, CAST(ceil(count(*) / $PackMaxGroupRows.0) AS INTEGER) AS n_subs
         |  FROM d GROUP BY source),
         |sd AS (SELECT d.source, d.doc_id, d.tok,
         |  ${T.hash16Sql("d.doc_id")} % ns.n_subs AS sub,
         |  row_number() OVER (PARTITION BY d.source, ${T.hash16Sql("d.doc_id")} % ns.n_subs
         |    ORDER BY d.doc_id) AS rn
         |  FROM d JOIN ns USING (source)),
         |r AS (
         |  SELECT source, sub, rn, doc_id, tok, CAST(0 AS BIGINT) AS shard, tok AS fill
         |  FROM sd WHERE rn = 1
         |  UNION ALL
         |  SELECT sd.source, sd.sub, sd.rn, sd.doc_id, sd.tok,
         |    CASE WHEN r.fill + sd.tok <= $PackCapacity THEN r.shard ELSE r.shard + 1 END,
         |    CASE WHEN r.fill + sd.tok <= $PackCapacity THEN r.fill + sd.tok ELSE sd.tok END
         |  FROM sd JOIN r ON sd.source = r.source AND sd.sub = r.sub AND sd.rn = r.rn + 1),
         |per AS (SELECT source, sub, max(shard) + 1 AS n_shards FROM r GROUP BY source, sub),
         |off AS (SELECT source, sub, CAST(coalesce(sum(n_shards) OVER
         |  (PARTITION BY source ORDER BY sub
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offs
         |  FROM per)
         |SELECT r.source, r.doc_id, r.tok AS n_tokens,
         |  CAST(r.shard + off.offs AS BIGINT) AS shard
         |FROM r JOIN off ON r.source = off.source AND r.sub = off.sub
         |ORDER BY r.source, r.doc_id""".stripMargin,
    "q62_stratified_sample" ->
      s"""WITH w AS (SELECT source, doc_id, len(string_split(text, ' ')) AS weight FROM documents),
         |p AS (SELECT source, doc_id, CAST(weight AS INTEGER) AS weight,
         |  CAST(weight AS DOUBLE) / ${T.hashUniformSql("doc_id")} AS priority FROM w),
         |r AS (SELECT *, row_number() OVER
         |  (PARTITION BY source ORDER BY priority DESC, doc_id) AS rn FROM p)
         |SELECT source, doc_id, weight, priority FROM r WHERE rn <= 5
         |ORDER BY source, priority DESC, doc_id""".stripMargin,
    "q59_weighted_sample" ->
      s"""WITH w AS (SELECT doc_id, len(string_split(text, ' ')) AS weight FROM documents),
         |p AS (SELECT doc_id, CAST(weight AS INTEGER) AS weight,
         |  CAST(weight AS DOUBLE) / ${T.hashUniformSql("doc_id")} AS priority FROM w)
         |SELECT doc_id, weight, priority FROM p
         |ORDER BY priority DESC, doc_id LIMIT 25""".stripMargin,
    "q55_unigram_surprisal" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |v AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
        |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS s FROM v)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(-avg(log2(c / s)), 4) AS bits_per_token
        |FROM tok JOIN v USING (t) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )
}
