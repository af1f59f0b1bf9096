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
}
