package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._
import graft.SparkSpec

class CsvTablesSpec extends SparkSpec {
  import spark.implicits._

  test("round-trips quoted fields with embedded commas and newlines") {
    val tmp = Files.createTempDirectory("csv-spec").toString
    val schema = StructType(Seq(
      StructField("article_id", StringType),
      StructField("title", StringType),
      StructField("n_cites", IntegerType)))
    val df = Seq(
      ("a1", "Graphs, trees, and other structures", 10),
      ("a2", "A title with an\nembedded newline", 20),
      ("a3", "Quotes \"inside\" the title", 30),
    ).toDF("article_id", "title", "n_cites")
    CsvTables.write(df, s"$tmp/article")
    val back = CsvTables.read(spark, s"$tmp/article", schema)
    assert(back.count() == 3)
    assert(back.schema("n_cites").dataType == IntegerType)
    val byId = back.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId("a1").contains(","))
    assert(byId("a2").contains("\n"))
    assert(byId("a3").contains("\"inside\""))
  }
}
