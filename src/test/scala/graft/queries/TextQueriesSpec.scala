package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic checks for TextQueries members whose properties the DuckDB
  * hash-match can't express directly (here: the posting-intersection
  * plan vs a naive in-memory scan, including overlapping matches). */
class TextQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("q98 posting intersection equals a naive sliding-window scan") {
    val docs = graft.core.Tables.documents(spark, d)
      .select("doc_id", "text").as[(Long, String)].collect()
    val want = docs.flatMap { case (id, text) =>
      val t = text.split(" ", -1)
      val starts = t.indices.dropRight(TextQueries.Phrase.size - 1).filter { i =>
        TextQueries.Phrase.indices.forall(j => t(i + j) == TextQueries.Phrase(j))
      }
      if (starts.isEmpty) None
      else Some((id, starts.size.toLong, starts.min + 1))
    }.sortBy(_._1).toSeq
    val got = TextQueries.q98PhraseSearch(spark, d)
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == want, "posting-intersection hits must equal the direct scan")
    assert(got.nonEmpty, "fixture must contain the phrase")
  }

  test("q100 pipeline stages compose: counts conserve and near-dups collapse") {
    val docs = graft.core.Tables.documents(spark, d)
    val total = docs.count()
    val qualityPass = docs
      .filter(size(split(col("text"), " ")) >= TextQueries.MinTokensE2e).count()
    val got = TextQueries.q100PipelineE2e(spark, d)
      .as[(String, String, Long, Long, String)].collect()
    val kept = got.map(_._3).sum
    assert(kept <= qualityPass && qualityPass < total,
      s"stage monotonicity: $kept <= $qualityPass < $total")
    // the planted near-dup cluster (q34's pairs) must collapse: each
    // cluster among the quality survivors keeps exactly its representative
    val pairRows = TextQueries.q34NgramJaccard(spark, d)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val dupDocs = pairRows.flatMap(p => Seq(p._1, p._2)).toSet
    assert(dupDocs.nonEmpty, "fixture must contain near-dups")
    assert(kept < qualityPass || dupDocs.forall { id =>
      docs.filter(col("doc_id") === id)
        .filter(size(split(col("text"), " ")) >= TextQueries.MinTokensE2e).count() == 0
    }, "near-dup removal must drop at least one quality-passing duplicate")
    got.foreach { case (split, _, n, tok, fp) =>
      assert(Seq("train", "val", "test").contains(split))
      assert(n > 0 && tok >= n * TextQueries.MinTokensE2e, "token floor holds")
      assert(fp.length == 32)
    }
  }

  test("q98 plan shape counts repeated occurrences and 1-based offsets") {
    val df = Seq(
      (1L, "data table scan data table scan"),
      (2L, "data data table scan table"),
      (3L, "no phrase here at all")).toDF("doc_id", "text")
    // route the synthetic frame through the same plan shape
    val posting = df
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("p", "term")))
      .filter(col("term").isin(TextQueries.Phrase: _*))
    val starts = TextQueries.Phrase.zipWithIndex.map { case (t, i) =>
      posting.filter(col("term") === t)
        .select(col("doc_id"), (col("p") - i).as("start"))
    }.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
    val got = starts.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), (min("start") + 1).as("fp"))
      .as[(Long, Long, Int)].collect()
      .map { case (id, n, fp) => id -> ((n, fp)) }.toMap
    assert(got == Map(1L -> ((2L, 1)), 2L -> ((1L, 2))))
  }
}
