package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic checks of the pipeline-composition queries on the sf0.001
  * corpus — properties the DuckDB hash-match can't express (coverage,
  * monotonicity, capacity bounds). */
class PipelineQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("q49 chunks tile every document: start at 1, cover the tail, short docs intact") {
    val docs = graft.core.Tables.documents(spark, d)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"),
        md5(col("text")).as("full_fp"))
    val chunks = PipelineQueries.q49ChunkWindows(spark, d)
    val perDoc = chunks.groupBy("doc_id").agg(
      min("start").as("first_start"),
      max(col("start") + col("n_chunk_tokens") - 1).as("covered_to"),
      count(lit(1)).as("n_chunks"))
      .join(docs, "doc_id")
    val bad = perDoc.filter(col("first_start") =!= 1 || col("covered_to") < col("n"))
    assert(bad.count() == 0, "every doc must be tiled from token 1 to its end")
    // docs that fit one window: the single chunk IS the document
    val whole = chunks.join(docs.filter(col("n") <= PipelineQueries.ChunkW), "doc_id")
    assert(whole.filter(col("chunk_fp") =!= col("full_fp")).count() == 0)
    assert(whole.count() > 0, "fixture must contain single-chunk docs")
  }

  test("q50 finds the planted near-dup cluster when it straddles the split") {
    val got = PipelineQueries.q50Contamination(spark, d)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, nSh, nCo, ov, flag) =>
      assert(nCo <= nSh && ov >= 0.0 && ov <= 1.0)
      assert(flag == (ov >= 0.2))
    }
    // the corpus plants a near-dup cluster; its members share ~all
    // shingles, so if any lands train-side vs test-side it must flag
    assert(got.exists(_._5), "expected at least one contaminated train doc")
  }

  test("q52 upsamples sources with rate>100 and downsamples below") {
    val got = PipelineQueries.q52MixtureSample(spark, d)
      .as[(String, Int, Long, Long)].collect()
    assert(got.length == 20)
    got.foreach { case (src, rate, nIn, nOut) =>
      if (rate >= 200) assert(nOut >= 2 * nIn, s"$src rate=$rate")
      else if (rate > 100) assert(nOut >= nIn, s"$src rate=$rate")
      else assert(nOut <= nIn, s"$src rate=$rate")
    }
    assert(got.exists(_._2 > 100) && got.exists(_._2 < 100),
      "rate formula must exercise both directions")
  }

  test("q54 shards respect capacity (single-doc shards excepted) and are dense") {
    val got = PipelineQueries.q54PackShards(spark, d)
      .as[(String, Long, Long, Long)].collect()
    val byShard = got.groupBy(r => (r._1, r._4)).values
    byShard.foreach { rows =>
      val fill = rows.map(_._3).sum
      assert(fill <= PipelineQueries.PackCapacity || rows.size == 1,
        s"overfilled multi-doc shard: $rows")
    }
    got.groupBy(_._1).foreach { case (src, rows) =>
      val shards = rows.map(_._4).distinct.sorted.toList
      assert(shards == (0L until shards.size).toList, s"$src shard ids not dense")
    }
  }

  test("q55 surprisal is positive, finite, and ranks rare-token docs higher") {
    val got = PipelineQueries.q55UnigramSurprisal(spark, d)
      .as[(Long, Long, Double)].collect()
    assert(got.length == 500)
    got.foreach { case (_, n, bits) =>
      assert(n > 0 && bits > 0.0 && !bits.isNaN && !bits.isInfinite)
    }
  }

  test("q91 bm25 top-20 matches an in-memory BM25 over the same corpus") {
    val docs = graft.core.Tables.documents(spark, d)
      .select("doc_id", "text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val n = docs.length.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    val dfs = PipelineQueries.Bm25Terms.map(t => t -> toks.values.count(_.contains(t)).toDouble).toMap
    def score(id: Long): Double = PipelineQueries.Bm25Terms.map { t =>
      val tf = toks(id).count(_ == t).toDouble
      val df = dfs(t)
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * toks(id).size / avgdl))
    }.sum
    val want = docs.map(_._1)
      .map(id => (id, BigDecimal(score(id)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy { case (id, sc) => (-sc, id) }.take(20).toSeq
    val got = PipelineQueries.q91Bm25(spark, d)
      .select("doc_id", "bm25").as[(Long, Double)].collect().toSeq
    assert(got == want, "distributed BM25 top-20 must equal the in-memory ranking")
    assert(got.head._2 > 0.0)
  }

  test("q92 keeps exactly min(cap, n) docs per source and caps at least one source") {
    val got = PipelineQueries.q92SourceCap(spark, d)
      .as[(String, Long, Long, Long, String)].collect()
    assert(got.nonEmpty)
    got.foreach { case (src, nDocs, nKept, nDropped, fp) =>
      assert(nKept == math.min(PipelineQueries.SourceCap.toLong, nDocs), src)
      assert(nDropped == nDocs - nKept, src)
      assert(fp.length == 32, src)
    }
    assert(got.exists(_._4 > 0), "fixture must exercise the cap (some source over it)")
  }

  test("q93 shuffle is a permutation: every doc once, positions dense per shard") {
    val got = PipelineQueries.q93CorpusShuffle(spark, d)
      .as[(Int, Int, Long)].collect()
    assert(got.map(_._3).distinct.length == 500, "every doc exactly once")
    got.groupBy(_._1).foreach { case (shard, rows) =>
      assert(shard >= 0 && shard < PipelineQueries.NShards)
      assert(rows.map(_._2).sorted.toList == (1 to rows.size).toList,
        s"shard $shard positions not dense")
    }
    // determinism: a second run is identical
    val again = PipelineQueries.q93CorpusShuffle(spark, d)
      .as[(Int, Int, Long)].collect()
    assert(got.toSeq == again.toSeq)
  }

  test("q94 entropy matches an in-memory recompute and is bounded by log2(|alphabet|)") {
    val docs = graft.core.Tables.documents(spark, d)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val maxBits = math.log(PipelineQueries.EntropyAlphabet.size.toDouble) / math.log(2.0)
    val got = PipelineQueries.q94CharEntropy(spark, d)
      .as[(Long, Int, Int, Double)].collect()
    assert(got.length == 500)
    got.foreach { case (id, nAlpha, nDistinct, bits) =>
      assert(bits >= 0.0 && bits <= maxBits + 1e-9, s"doc $id entropy out of range")
      val s = docs(id).toLowerCase
      val counts = PipelineQueries.EntropyAlphabet
        .map(c => s.count(_ == c.head)).filter(_ > 0)
      assert(nAlpha == counts.sum, s"doc $id n_alpha")
      assert(nDistinct == counts.size, s"doc $id distinct chars")
      val tot = counts.sum.toDouble
      val want = -counts.map(c => (c / tot) * (math.log(c / tot) / math.log(2.0))).sum
      assert(math.abs(bits - want) < 5e-4, s"doc $id entropy $bits vs $want")
    }
  }
}
