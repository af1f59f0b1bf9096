package graft.arxiv

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sequenced pipeline runner mirroring the reference DAG's semantics
  * (`dags/research_pipeline_dag.py:397-440`): each stage materializes to
  * Parquet and is skipped when its output already exists — the same
  * resume-if-exists checkpointing as `final_tables.py:14-26` — plus
  * delete-for-update to force a rebuild. Stage outputs are Parquet (the
  * reference's own format benchmark picked columnar storage;
  * `x_old_files/0_DE_Project_RawToCleanDF.ipynb` cells 39-45). */
class ArxivPipeline(spark: SparkSession, stageDir: String) {

  private def path(name: String) = s"$stageDir/$name.parquet"

  private def exists(name: String) = Files.exists(Paths.get(path(name)))

  /** Materialize-or-reuse one stage. */
  def stage(name: String)(build: => DataFrame): DataFrame = {
    if (!exists(name)) build.write.mode("overwrite").parquet(path(name))
    spark.read.parquet(path(name))
  }

  /** delete_for_update (`research_pipeline_dag.py:39-54`). */
  def deleteForUpdate(): Unit = {
    val dir = Paths.get(stageDir)
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  /** Full run: bronze JSONL → silver → gold, all stages checkpointed. */
  def run(jsonlPath: String, enricher: Augment.Enricher, cwts: DataFrame,
      namesGenders: DataFrame): ArxivTables = {
    val silver = Ingest.silver(Ingest.bronze(spark, jsonlPath))
    val article0 = stage("silver_article")(silver.article)
    val authorship0 = stage("silver_authorship")(silver.authorship)
    val author0 = stage("silver_author")(silver.author)
    val ac0 = stage("silver_article_category")(silver.articleCategory)
    val cat0 = stage("silver_category")(silver.category)

    val article = stage("article")(
      Augment.articleReady(article0, enricher))
    val journal = stage("journal")(Augment.journalReady(article, cwts))
    val authorship = stage("authorship")(
      Augment.authorshipReady(authorship0, article))
    val author = stage("author")(
      Augment.authorReady(author0, authorship, article, namesGenders))
    val articleCategory = stage("article_category")(
      Augment.articleCategoryReady(ac0, article))
    val category = stage("category")(
      Augment.categoryReady(cat0, articleCategory))
    ArxivTables(article, author, authorship, articleCategory, category, journal)
  }

  /** Register the gold tables as temp views so the DWH queries also run as
    * `spark.sql` (the reference's interactive surface, README §5.1). */
  def registerViews(t: ArxivTables): Unit =
    Seq(
      "article" -> t.article, "author" -> t.author,
      "authorship" -> t.authorship, "article_category" -> t.articleCategory,
      "category" -> t.category, "journal" -> t.journal)
      .foreach { case (name, df) =>
        if (df != null) df.createOrReplaceTempView(name)
      }
}
