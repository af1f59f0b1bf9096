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
  /** events.ts has shipped in two physical parquet encodings across fixture
    * re-stages — TIMESTAMP(NANOS) (which Spark's vectorized reader only
    * surfaces as raw longs under `spark.sql.legacy.parquet.nanosAsLong=true`)
    * and TIMESTAMP(MICROS) (read natively as TimestampType or TimestampNTZType
    * depending on isAdjustedToUTC / inferTimestampNTZ). Branch on the LOADED
    * schema, not an assumed encoding, and normalize every case to
    * TimestampType so downstream operators (windows, watermarks, as-of joins)
    * see one type regardless of how the fixture was staged:
    *   - LongType   → nanos fixture: `timestamp_micros(ts div 1000)`. Integral
    *     `div`, not `/`: 2024-era epoch-nanos (~1.7e18) exceed double's 2^53
    *     integer range and double division truncates ~1% of values 1 us low.
    *   - TimestampNTZType → micros fixture, naive: cast to TimestampType —
    *     identity on the underlying micros under the UTC session timezone
    *     that [[Sessions.local]]/Bench/Verify all pin.
    *   - TimestampType → already what we want; pass through.
    * The nanosAsLong session flag stays required only for the Long case
    * (without it the nanos fixture fails inside the parquet reader with an
    * unsupported-type error before this function can adapt). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
          "events.parquet is TIMESTAMP(NANOS); set " +
            "spark.sql.legacy.parquet.nanosAsLong=true in the session builder")
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts loaded as unsupported type $other (expected nanos-as-Long, " +
          "TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
