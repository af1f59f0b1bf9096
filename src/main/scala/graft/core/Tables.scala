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
    * rejects; read it as raw nanos and convert to micros (TimestampType).
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` on the session —
    * set it in the session builder ([[Sessions.local]], Bench, Verify), not
    * here: a read-time `conf.set` is a global side effect that races under
    * concurrent sessions. Conversion uses integral `div`: `/` on longs is
    * double division and 2024-era epoch-nanos (~1.7e18) exceed double's
    * 2^53 integer range, truncating ~1% of values 1 microsecond low. */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true in the session builder " +
        "(events.parquet is TIMESTAMP(NANOS))")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
