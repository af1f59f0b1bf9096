package graft.arxiv

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.functions.GroupOps
import graft.sources.CsvTables

/** Golden parity against the reference's OWN published output
  * (dags/data_ready CSVs: 29,070 authors, 102,121 authorships).
  *
  * Forensic note: the shipped data_ready tables are mutually inconsistent —
  * only ~56k of the 102k authorship rows match the shipped article.csv, and
  * no `article_augmented_raw.csv` snapshot is included, so the
  * citation-derived stats (total_cites/avg/median/h-index) were computed
  * against an article snapshot that is not in the repo and cannot be
  * reproduced from it (SURVEY §7.4 risk 5: order-of-runs artifacts). What
  * the shipped data DOES determine, we verify exactly, at full scale:
  *
  *  1. total_pubs        — authorship count per author (29k authors);
  *  2. n_unique_coauthors — the 2-hop distinct-coauthor join;
  *  3. pandas average-rank semantics, exercised on the golden stat columns
  *     (tie-dense: 15,763 authors share total_pubs=1) against an
  *     independent positional-averaging implementation. The golden rank_*
  *     columns themselves are NOT a function of the shipped stat columns —
  *     fresh `pandas.rank` over the shipped total_pubs disagrees with
  *     golden rank_total_pubs on the same 28,773 rows our formula does
  *     (verified offline), i.e. the reference ranked a stats snapshot it
  *     later overwrote. Our formula was verified bit-identical to
  *     `pandas.rank(ascending=0).astype(int)` on all four shipped metrics.
  */
class ArxivGoldenSpec extends SparkSpec {
  import spark.implicits._

  private val base = "/root/reference/dags/data_ready"

  private def csv(name: String, schema: StructType): DataFrame =
    CsvTables.read(spark, s"$base/$name.csv", schema)

  private lazy val golden = csv("author", ArxivSchemas.author)
  private lazy val authorship = csv("authorship", StructType(Seq(
    StructField("article_id", StringType),
    StructField("author_id", StringType))))

  test("total_pubs matches the reference for all 29k authors") {
    assume(Files.exists(Paths.get(s"$base/author.csv")), "reference data not present")
    val ours = authorship.groupBy("author_id")
      .agg(count(lit(1)).cast("int").as("p"))
    val bad = golden.join(ours, Seq("author_id"), "left")
      .filter(!(col("total_pubs") <=> col("p"))).count()
    assert(bad == 0)
  }

  test("n_unique_coauthors matches the reference for all 29k authors") {
    assume(Files.exists(Paths.get(s"$base/author.csv")), "reference data not present")
    val coauth = authorship.as("l")
      .join(authorship.select(col("article_id"),
        col("author_id").as("coauthor_id")).as("r"), Seq("article_id"))
      .groupBy("author_id")
      .agg((countDistinct("coauthor_id") - lit(1)).cast("int").as("c"))
    val bad = golden.join(coauth, Seq("author_id"), "left")
      .filter(!(col("n_unique_coauthors") <=> col("c"))).count()
    assert(bad == 0)
  }

  test("pandas average-rank semantics hold on the tie-dense golden metrics") {
    assume(Files.exists(Paths.get(s"$base/author.csv")), "reference data not present")
    Seq("total_pubs", "total_cites", "avg_cites", "hindex").foreach { metric =>
      val spark_ = GroupOps.pandasAvgRankDesc(
        golden.select("author_id", metric), metric, "r")
        .select(col("author_id"), col("r")).as[(String, Int)].collect().toMap
      // independent reimplementation: positional average over desc sort
      val vals = golden.select(col("author_id"), col(metric).cast("double"))
        .as[(String, Double)].collect()
      val sorted = vals.sortBy(-_._2)
      val byValue = sorted.zipWithIndex.groupBy(_._1._2)
      val expect: Map[String, Int] = byValue.iterator.flatMap { case (_, rows) =>
        val avgRank = rows.map(_._2 + 1).sum.toDouble / rows.length
        rows.iterator.map { case ((id, _), _) => id -> avgRank.toInt }
      }.toMap
      val bad = expect.count { case (id, r) => spark_(id) != r }
      assert(bad == 0, s"$metric avg-rank mismatches: $bad of ${expect.size}")
    }
  }
}
