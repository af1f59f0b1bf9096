package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.CsvTables
object CsvDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dr = "/root/reference/dags/data_ready"
    val schema = StructType(Seq(
      StructField("article_id", StringType), StructField("title", StringType),
      StructField("doi", StringType), StructField("n_authors", DoubleType),
      StructField("journal_issn", StringType), StructField("type", StringType),
      StructField("n_cites", DoubleType), StructField("year", DoubleType)))
    val art = CsvTables.read(spark, s"$dr/article.csv", schema)
    println("[dbg] article rows: " + art.count())
    println("[dbg] null article_id: " + art.filter(col("article_id").isNull).count())
    val auth = CsvTables.read(spark, s"$dr/authorship.csv", StructType(Seq(
      StructField("article_id", StringType), StructField("author_id", StringType))))
    println("[dbg] authorship rows: " + auth.count())
    println("[dbg] joined: " + auth.join(art, Seq("article_id")).count())
    println("[dbg] AndrewsJ joined: " + auth.filter(col("author_id")==="AndrewsJ").join(art, Seq("article_id")).count())
    art.filter(col("article_id").isNull || col("year").isNull).show(5, 60)
    spark.stop()
  }
}
