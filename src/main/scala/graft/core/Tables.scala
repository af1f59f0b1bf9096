package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry for the synthetic scale fixtures (FIXTURES.md §B).
  *
  * Every query receives an `sfDir` (e.g. /root/testdata/sf0.01) holding one
  * parquet file per table. Reads go through `spark.read.parquet` so Catalyst
  * gets parquet footer stats, predicate pushdown and column pruning for free —
  * at 100 TB these scans are the dominant cost and the plan must show
  * PushedFilters/ReadSchema doing the pruning, not the executor.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; read it as raw nanos (legacy conf) and convert to micros
    * (TimestampType). Generator precision is micros, so floor-div by 1000 is
    * lossless and matches DuckDB's TIMESTAMP_NS → us semantics. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        (org.apache.spark.sql.functions.col("ts") / 1000L).cast("long")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
