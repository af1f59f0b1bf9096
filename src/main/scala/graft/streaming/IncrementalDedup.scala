package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Streaming incremental-ingest dedup — [[Dedup.incrementalNearDup]]'s
  * production wiring (VERDICT r6 #7): an unbounded stream of documents is
  * deduped micro-batch by micro-batch against everything ingested before
  * it, via `foreachBatch` over a PERSISTED history band index (the
  * "materialized index" the batch operator's scaladoc names).
  *
  * Index layout under `indexDir` (both partitioned by ingest batch):
  *   - `bands/batch_id=N/`  (band INT, band_hash LONG, id LONG) — the
  *     MinHash band keys of batch N, schema = [[Dedup.minhashBandKeys]];
  *   - `docs/batch_id=N/`   (idCol LONG, textCol STRING) — the corpus
  *     registry, read back only for exact verification of candidates.
  *
  * Exactly-once contract (the [[EventStreams.exactlyOnceParquetSink]]
  * pattern): Structured Streaming replays a crashed micro-batch with the
  * SAME batch id, so every write is an overwrite of one `batch_id=N`
  * directory, and every history read filters `batch_id < N` — a replay
  * that finds its own half-written partitions simply ignores and
  * overwrites them. Verdicts are therefore deterministic per (stream,
  * batch id) no matter how many times a batch is attempted.
  *
  * Scale shape at 100 TB/day: per micro-batch the work is |batch|
  * signature computations + one probe join of the batch's band keys
  * (bounded: |batch|·bands rows — the broadcastable side) against the
  * index scan + the batch's internal candidate join + exact verification
  * bounded by the candidate set ([[Dedup.incrementalNearDupIndexed]]'s
  * left-semi doc fetch). The EXECUTOR state is zero — no stateful
  * operator, no watermark, no state store: the only state is the on-disk
  * index, which grows exactly one batch partition per micro-batch (it IS
  * the corpus registry; appending `status = 'kept'` docs only — dedup
  * the corpus as you go — is the one-line filter variant noted on
  * [[processBatch]]). Nothing ever rescans or re-signatures history.
  */
object IncrementalDedup {

  /** Read one index side (bands/docs) as of BEFORE `batchId`, or None if
    * no prior batch has committed a partition yet (first batch / fresh
    * index). The basePath option keeps `batch_id` as a partition column
    * so the `< batchId` filter is partition-PRUNED, not scanned. */
  private def readIndexSide(spark: SparkSession, dir: String,
      batchId: Long): Option[DataFrame] = {
    val p = Paths.get(dir)
    val hasParts = Files.isDirectory(p) && {
      val s = Files.list(p)
      try s.anyMatch(_.getFileName.toString.startsWith("batch_id="))
      finally s.close()
    }
    if (!hasParts) None
    else Some(spark.read.option("basePath", dir).parquet(dir)
      .filter(col("batch_id") < batchId)
      .drop("batch_id"))
  }

  /** Process one ingest batch against the on-disk index: write the
    * batch's registry+band partitions, compute verdicts vs `batch_id <
    * batchId` history, and return them. Idempotent on `batchId` (every
    * write overwrites its own partition; every read excludes partitions
    * at or after `batchId`).
    *
    * The batch frame is written FIRST and re-read from its own parquet
    * partition: foreachBatch hands a view that re-executes per action,
    * and this operator references the batch in four places (band keys,
    * both verify legs, the final left joins) — one write pins one
    * consistent, re-scannable copy, which is also what makes a crash
    * replay byte-deterministic. To dedup the corpus as you go (history =
    * kept docs only), filter the returned verdicts and rewrite the two
    * partitions — the index schema doesn't change. */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      indexDir: String, threshold: Double = 0.5, k: Int = 16,
      bands: Int = 4, n: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val bandsDir = s"$indexDir/bands"
    val docsDir = s"$indexDir/docs"
    batch.select(col(idCol), col(textCol))
      .write.mode("overwrite").parquet(s"$docsDir/batch_id=$batchId")
    val pinned = spark.read.parquet(s"$docsDir/batch_id=$batchId")
    Dedup.minhashBandKeys(pinned, k, bands, n, idCol, textCol)
      .select(col("band"), col("band_hash"), col("id"))
      .write.mode("overwrite").parquet(s"$bandsDir/batch_id=$batchId")
    val histBands = readIndexSide(spark, bandsDir, batchId)
    val histDocs = readIndexSide(spark, docsDir, batchId)
    (histBands, histDocs) match {
      case (Some(hb), Some(hd)) =>
        Dedup.incrementalNearDupIndexed(
          // the persisted keys, never recomputed — the index contract
          hb, hd, pinned, threshold, k, bands, n, idCol, textCol)
      case _ =>
        // first batch: empty history — every verdict is within-batch
        Dedup.incrementalNearDup(pinned.limit(0), pinned, threshold, k,
          bands, n, idCol, textCol)
    }
  }

  /** Wire a streaming (idCol, textCol) document frame through
    * [[processBatch]]: verdicts for micro-batch N land in
    * `outDir/batch_id=N` (overwrite → exactly-once observable output),
    * and the index under `indexDir` grows one partition per batch. */
  def stream(docs: DataFrame, indexDir: String, outDir: String,
      checkpointDir: String, threshold: Double = 0.5, k: Int = 16,
      bands: Int = 4, n: Int = 3, idCol: String = "doc_id",
      textCol: String = "text",
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processBatch(b.sparkSession, b, id, indexDir, threshold, k,
          bands, n, idCol, textCol)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$id")
        ()
      }
      .start()
}
