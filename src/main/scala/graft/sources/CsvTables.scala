package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV read/write in the reference's dialect (header, comma, double-quoted
  * fields with embedded commas/newlines — the dags/data_ready CSV tables).
  *
  * multiLine=true forces whole-file parsing (no per-line splits), which is
  * the correctness price of newline-embedded fields; at scale prefer the
  * Parquet stage outputs (ArxivPipeline) and keep CSV for fixture exchange
  * only. Schemas are always explicit — pandas' inference is how the
  * reference's `n_cites` silently became VARCHAR (SURVEY §1.3). */
object CsvTables {

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("multiLine", "true")
      .schema(schema)
      .csv(path)

  def write(df: DataFrame, path: String): Unit =
    df.write
      .mode("overwrite")
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)
}
