package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: co-located joins without a shuffle.
  *
  * Writing both fact tables bucketed (and sorted) by the join key lets
  * Spark plan a sort-merge join with NO Exchange on either side — at
  * 100 TB this removes the dominant network cost of repeated
  * orders ⋈ lineitem style joins. Bucket counts must match on both tables;
  * choose buckets ≈ cluster cores × small multiple, and keep them stable
  * across writes so every downstream join co-locates. */
object Bucketed {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def write(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
