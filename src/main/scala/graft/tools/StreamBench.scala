package graft.tools

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.Sessions
import graft.streaming.EventStreams

/** Streaming throughput/state evidence (VERDICT r4 #7): the functional
  * streaming story is spec-complete but carried no rate number. This
  * measures rows/s and state-store rows/bytes for the two stateful
  * ingest-path operators — sessionize (flatMapGroupsWithState) and
  * watermarked dedup — on a gen-scale synthetic stream over the RocksDB
  * state store, and asserts the property that makes them 100 TB-safe:
  * STATE PLATEAUS while rows keep flowing, because the watermark evicts
  * what the operator no longer needs.
  *
  * Stream shape: the deterministic `rate-micro-batch` source (public
  * Spark source made for exactly this: fixed rowsPerBatch, no
  * wall-clock coupling). Event time is SIMULATED from the row counter —
  * `value` is globally consecutive across batches, so
  * ts = epoch0 + value·msPerRow sweeps event time forward at a constant
  * simulated rate and the watermark cycles many times per run,
  * regardless of how fast the host executes batches (the same
  * decoupling trick GenScale uses for data scale). Users are BURSTY
  * (user_id = (value / burst) % nUsers): a user is active for `burst`
  * consecutive rows, then idle long past the session gap, so sessions
  * genuinely close and session state turns over; dedup sees every id
  * twice (value >> 1) so the dropDuplicates path does real work.
  *
  * Run: sbt "runMain graft.tools.StreamBench [rowsPerBatch] [nBatches]"
  * — prints one JSON line (saved as STREAM_r{N}.json by the round). */
object StreamBench {

  private def fmt(v: Double): String =
    String.format(Locale.ROOT, "%.3f", Double.box(v))

  case class Metrics(rows: Long, seconds: Double, rowsPerSec: Double,
      peakStateRows: Long, finalStateRows: Long, stateBytes: Long,
      batches: Int, rocksDb: Boolean, outputRows: Long)

  /** Drive `query` (built from the synthetic event frame) until
    * `nBatches` micro-batches have state metrics, then stop and report.
    * Shared by the bench main and the bounded-state spec. */
  def measure(spark: SparkSession, q: StreamingQuery, nBatches: Int,
      timeoutMs: Long = 300000L): Metrics = {
    // recentProgress is a ring buffer (spark.sql.streaming
    // .numRecentProgressUpdates, default 100): asking for more batches
    // than it retains would spin to the timeout and then silently
    // measure a smaller window — fail loudly instead
    val retained = spark.conf
      .getOption("spark.sql.streaming.numRecentProgressUpdates")
      .map(_.toInt).getOrElse(100)
    require(nBatches <= retained,
      s"nBatches $nBatches exceeds the progress retention $retained; " +
        "raise spark.sql.streaming.numRecentProgressUpdates before the run")
    val deadline = System.currentTimeMillis() + timeoutMs
    var done = false
    while (!done && System.currentTimeMillis() < deadline) {
      val n = q.recentProgress.count(_.stateOperators.nonEmpty)
      if (n >= nBatches) done = true else Thread.sleep(200)
    }
    q.stop()
    q.awaitTermination()
    val ps = q.recentProgress.filter(_.stateOperators.nonEmpty).take(nBatches)
    require(ps.nonEmpty, s"no stateful progress within ${timeoutMs} ms")
    val rows = ps.map(_.numInputRows).sum
    val secs = ps.map(_.batchDuration).sum / 1000.0
    val stateRows = ps.map(_.stateOperators.map(_.numRowsTotal).sum)
    val last = ps.last.stateOperators
    val rocks = last.exists(_.customMetrics.keySet().toString.contains("rocksdb"))
    val bytes = last.map(_.memoryUsedBytes).sum
    Metrics(rows, secs, if (secs > 0) rows / secs else 0.0,
      stateRows.max, stateRows.last, bytes, ps.length, rocks,
      ps.map(_.sink.numOutputRows).filter(_ >= 0).sum)
  }

  /** Synthetic document stream for the incremental-dedup bench:
    * deterministic token text from the row counter, with planted
    * near-dups — every id ≡ 9 (mod 10) near-duplicates id−9 (same
    * micro-batch when docsPerBatch is a multiple of 10) and every id ≡ 5
    * (mod 10) past the second batch near-duplicates the doc two batches
    * earlier (a HISTORY dup: exercises the persisted-index leg). The
    * near-copy appends one marker token, so J ≈ 0.93 — above the 0.5
    * verify threshold but not exact. */
  def syntheticDocs(spark: SparkSession, docsPerBatch: Long) = {
    val rpb = docsPerBatch
    spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", docsPerBatch)
      .load()
      .select(col("value").as("doc_id"))
      .withColumn("base",
        // −1 lands on an id ≡ 4 (mod 10), which is never itself
        // rewritten — copying id−2·rpb (≡ 5) would chase a chain of
        // rewrites and only match for the first two eligible batches
        when(pmod(col("doc_id"), lit(10)) === 5 && col("doc_id") >= 2L * rpb,
          col("doc_id") - 2L * rpb - 1)
          .when(pmod(col("doc_id"), lit(10)) === 9, col("doc_id") - 9)
          .otherwise(col("doc_id")))
      .withColumn("text", concat(
        array_join(transform(
          sequence(lit(0L), pmod(xxhash64(col("base")), lit(21)) + 29),
          j => concat(lit("w"), pmod(xxhash64(col("base"), j), lit(5000)))), " "),
        when(col("base") =!= col("doc_id"),
          concat(lit(" x"), col("doc_id"))).otherwise(lit(""))))
      .select("doc_id", "text")
  }

  /** Measure the streaming incremental dedup (VERDICT r6 #7): docs/s
    * over `nBatches` micro-batches through the foreachBatch +
    * persisted-band-index path, per-batch wall trend (the flat-work
    * claim: a batch's cost must not grow with the corpus beyond the
    * index-scan term), index growth, and the zero-executor-state
    * property (no stateful operator — the index on disk IS the state). */
  def incrementalDedupBench(spark: SparkSession, docsPerBatch: Long = 5000L,
      nBatches: Int = 12, timeoutMs: Long = 600000L): String = {
    val tmp = java.nio.file.Files.createTempDirectory("sb_incdedup").toString
    val (indexDir, outDir) = (s"$tmp/index", s"$tmp/out")
    val q = graft.streaming.IncrementalDedup.stream(
      syntheticDocs(spark, docsPerBatch), indexDir, outDir,
      s"$tmp/ckpt", threshold = 0.5)
    val deadline = System.currentTimeMillis() + timeoutMs
    while (q.recentProgress.count(_.numInputRows > 0) < nBatches &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
    q.stop(); q.awaitTermination()
    val ps = q.recentProgress.filter(_.numInputRows > 0).take(nBatches)
    require(ps.nonEmpty, s"no document batches within $timeoutMs ms")
    val rows = ps.map(_.numInputRows).sum
    val secs = ps.map(_.batchDuration).sum / 1000.0
    val perBatch = ps.map(_.batchDuration / 1000.0)
    // executor state: no stateful operator by construction
    val stateOps = ps.map(_.stateOperators.length).sum
    val indexRows = spark.read.parquet(s"$indexDir/bands").count()
    val verdicts = spark.read.parquet(outDir)
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    System.err.println(s"[streambench] incremental_dedup: $rows docs in " +
      s"${fmt(secs)} s = ${fmt(rows / secs)} docs/s over ${ps.length} batches; " +
      s"verdicts=$verdicts, index=$indexRows band rows, stateOps=$stateOps")
    s""""incremental_dedup":{"rows":$rows,"sec":${fmt(secs)},""" +
      s""""docs_per_sec":${fmt(rows / secs)},"batches":${ps.length},""" +
      s""""batch_sec":${perBatch.map(fmt).mkString("[", ",", "]")},""" +
      s""""index_band_rows":$indexRows,"executor_state_operators":$stateOps,""" +
      s""""kept":${verdicts.getOrElse("kept", 0L)},""" +
      s""""dup_history":${verdicts.getOrElse("dup_history", 0L)},""" +
      s""""dup_batch":${verdicts.getOrElse("dup_batch", 0L)}}"""
  }

  /** The synthetic event stream (see object doc for the shape). */
  def syntheticEvents(spark: SparkSession, rowsPerBatch: Long,
      nUsers: Int = 1000, burst: Int = 1000, msPerRow: Long = 100L) = {
    spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .load()
      .select(
        col("value").as("event_id"),
        timestamp_millis(lit(1700000000000L) + col("value") * msPerRow).as("ts"),
        ((col("value") / burst) % nUsers).cast("long").as("user_id"),
        when(col("value") % 3 === 0, "view")
          .when(col("value") % 3 === 1, "click").otherwise("purchase").as("event_type"),
        (col("value") % 97).cast("double").as("value"))
  }

  def main(args: Array[String]): Unit = {
    val rowsPerBatch = args.headOption.map(_.toLong).getOrElse(200000L)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(25)
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-streambench")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      (nBatches + 10).toString)
    EventStreams.rocksDbStateStoreConf.foreach { case (k, v) => spark.conf.set(k, v) }
    import spark.implicits._

    def runOne(name: String)(build: SparkSession => StreamingQuery): String = {
      val m = measure(spark, build(spark), nBatches)
      System.err.println(s"[streambench] $name: ${m.rows} rows in ${fmt(m.seconds)} s " +
        s"= ${fmt(m.rowsPerSec)} rows/s, state peak ${m.peakStateRows} final " +
        s"${m.finalStateRows} (${m.stateBytes} B), rocksdb=${m.rocksDb}")
      s""""$name":{"rows":${m.rows},"sec":${fmt(m.seconds)},""" +
        s""""rows_per_sec":${fmt(m.rowsPerSec)},"peak_state_rows":${m.peakStateRows},""" +
        s""""final_state_rows":${m.finalStateRows},"state_bytes":${m.stateBytes},""" +
        s""""batches":${m.batches},"rocksdb":${m.rocksDb},"output_rows":${m.outputRows}}"""
    }

    val sessionJson = runOne("sessionize") { s =>
      EventStreams.sessionize(
        syntheticEvents(s, rowsPerBatch).as[EventStreams.Event],
        watermarkDelay = "10 minutes")
        .writeStream.outputMode("append").format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("sb_sess").toString)
        .start()
    }
    val dedupJson = runOne("dedup") { s =>
      // every id arrives twice (value >> 1): half the input is duplicate
      EventStreams.dedupEvents(
        syntheticEvents(s, rowsPerBatch)
          .withColumn("event_id", (col("event_id") / 2).cast("long")),
        watermark = "10 minutes")
        .writeStream.outputMode("append").format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("sb_dedup").toString)
        .start()
    }
    val incJson = incrementalDedupBench(spark)

    val json = s"""{"metric":"stream_bench","rows_per_batch":$rowsPerBatch,""" +
      s""""n_batches":$nBatches,$sessionJson,$dedupJson,$incJson}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("streambench_out.json"), json + "\n")
    spark.stop()
    println(json)
  }
}
