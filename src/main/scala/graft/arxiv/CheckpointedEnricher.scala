package graft.arxiv

import org.apache.spark.sql.{AnalysisException, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-DOI transport (the Crossref `GET /works/<doi>` boundary,
  * `augmentations.py:30-41`). Implementations ship to executors inside
  * `mapPartitions`, hence Serializable. Return the raw response JSON;
  * `None` models a graceful miss (404 / not a journal article — the
  * reference logs and moves on, `augmentations.py:46-50`); a thrown
  * exception models a transport outage and aborts the run for
  * checkpoint-resume. */
trait DoiTransport extends Serializable {
  def fetch(doi: String): Option[String]
}

/** Production-shaped Crossref enricher: rate-limited `mapPartitions`
  * fetch with per-batch checkpoint and resume-after-failure — the
  * reference's batch loop (`final_tables.py:29-45`: 2000-DOI batches,
  * cumulative CSV overwritten per batch) re-expressed distributively.
  *
  *  - **Batching**: `batchSize` DOIs per driver round; each round is one
  *    Spark job whose results are APPENDED to the parquet checkpoint
  *    before the next round starts — a crash loses at most one batch.
  *  - **Resume**: on restart, DOIs already present in the checkpoint are
  *    anti-joined away and never re-fetched (the reference's
  *    file-existence gates, `final_tables.py:14-26`).
  *  - **Rate limit**: `minIntervalMs` sleep per request per partition.
  *    The reference is single-threaded at ~2.4 req/s for IP politeness
  *    (README.md:58); distributed, cluster-wide QPS =
  *    parallelism × 1000/minIntervalMs — so the DOI batch is coalesced
  *    to `fetchParallelism` partitions to keep that product bounded
  *    regardless of upstream partitioning.
  *  - **Parsing** is not driver code: the raw JSON lands in a column and
  *    `from_json` extracts `message.type`, `is-referenced-by-count`,
  *    `ISSN[0]` (`augmentations.py:33-41`) — codegen'd, schema-checked,
  *    and NULL-safe for misses (kept as attempted rows so reruns don't
  *    retry permanent misses forever).
  */
class CheckpointedEnricher(transport: DoiTransport, checkpointDir: String,
    batchSize: Int = 2000, minIntervalMs: Long = 0L,
    fetchParallelism: Int = 1) extends Augment.Enricher {

  private val payloadSchema = StructType(Seq(
    StructField("status", StringType),
    StructField("message", StructType(Seq(
      StructField("type", StringType),
      StructField("is-referenced-by-count", LongType),
      StructField("ISSN", ArrayType(StringType)))))))

  private def readCheckpoint(dois: DataFrame): DataFrame = {
    val spark = dois.sparkSession
    try spark.read.parquet(checkpointDir)
    catch {
      case _: AnalysisException => // first run: no checkpoint yet
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(
            StructField("doi", StringType),
            StructField("type", StringType),
            StructField("n_cites", IntegerType),
            StructField("journal_issn", StringType))))
    }
  }

  def lookup(dois: DataFrame): DataFrame = {
    val spark = dois.sparkSession
    import spark.implicits._
    val distinctDois = dois.select("doi").distinct()

    var pending = distinctDois.join(readCheckpoint(dois), Seq("doi"), "left_anti")
    var remaining = pending.count()
    while (remaining > 0) {
      val t = transport
      val interval = minIntervalMs
      val batch = pending.limit(batchSize)
        .select(col("doi")).as[String]
        .coalesce(fetchParallelism)
      val fetched = batch.mapPartitions { it =>
        it.map { doi =>
          if (interval > 0) Thread.sleep(interval)
          (doi, t.fetch(doi).orNull)
        }
      }.toDF("doi", "payload")
      val parsed = fetched
        .withColumn("msg", from_json(col("payload"), payloadSchema))
        .withColumn("ok", col("msg.status") === "ok")
        .select(col("doi"),
          when(col("ok"), col("msg.message.type")).as("type"),
          when(col("ok"), col("msg.message.`is-referenced-by-count`"))
            .cast("int").as("n_cites"),
          when(col("ok"), col("msg.message.ISSN").getItem(0)).as("journal_issn"))
      // checkpoint BEFORE recomputing pending: the write is the commit
      parsed.write.mode("append").parquet(checkpointDir)
      pending = distinctDois.join(readCheckpoint(dois), Seq("doi"), "left_anti")
      remaining = pending.count()
    }
    distinctDois.join(readCheckpoint(dois), Seq("doi"), "left")
      .select("doi", "type", "n_cites", "journal_issn")
  }
}
