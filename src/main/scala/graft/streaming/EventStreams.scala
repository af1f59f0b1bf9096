package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming twins of the batch event queries (q25/q27):
  * the same logical transforms lifted onto an unbounded source, plus a
  * stateful sessionizer via flatMapGroupsWithState.
  *
  * At scale: watermarks bound state (late events beyond the watermark are
  * dropped, closed windows/sessions are evicted), and all state is
  * hash-partitioned on the group key — the streaming query shuffles exactly
  * like its batch twin. */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionOut(user_id: Long, session_start: Timestamp,
      n_events: Long, session_value: Double)

  /** Session accumulator (public: Catalyst codegen instantiates it). */
  case class SessionState(start: Long, lastSeen: Long, n: Long, total: Double)

  /** Streaming latest-snapshot (running CDC upsert): the latest event per
    * user maintained as a complete/update-mode max(struct) aggregation —
    * the streaming twin of the batch q81 snapshot and the stateful half of
    * q90's changelog compaction. max is a combinable aggregate, so state
    * per key is ONE struct regardless of stream volume (partials merge
    * map-side within each micro-batch, then into the state store), which
    * is what makes a 100 TB/day changelog sustainable: the store holds
    * |keys| rows, never |events|. No watermark: an upsert view must accept
    * arbitrarily late rows (late data folds into the same max). */
  def latestSnapshot(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"), col("value"))).as("m"))
      .select(col("user_id"), col("m.ts").as("last_ts"),
        col("m.event_id").as("last_event_id"),
        col("m.event_type").as("last_type"), col("m.value").as("last_value"))

  /** Tumbling 1-hour counts per event type with a watermark for state GC —
    * streaming twin of Relational.q25Tumbling. */
  def tumblingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding 2h/1h average value — streaming twin of q26. */
  def slidingAvg(events: DataFrame, watermark: String = "3 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), round(avg("value"), 3).as("avg_value"))
      .select(col("w.start").as("window_start"), col("n"), col("avg_value"))

  /** Stateful sessionization (30-min inactivity gap) with
    * flatMapGroupsWithState — emits a session row when the gap closes it;
    * event-time timeout (watermark-driven) flushes idle users, so state is
    * bounded and batch-deterministic. Batch twin: q27. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              SessionOut(userId, new Timestamp(s.start), s.n, math.rint(s.total * 100) / 100))
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = scala.collection.mutable.ListBuffer.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  cur = Some(s.copy(lastSeen = t, n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  closed += SessionOut(userId, new Timestamp(s.start), s.n,
                    math.rint(s.total * 100) / 100)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** Streaming deduplication with bounded state: duplicate event ids are
    * dropped across micro-batches, and the watermark lets Spark EVICT ids
    * older than the delay from the dedup state — without it the id set
    * grows forever, the classic unbounded-state bug. The training-data
    * twin of exact dedup (q33) for the ingest path: at-least-once sources
    * (Kafka replays, retried batches) become exactly-once rows. */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase paired with the same
    * user's clicks in the preceding `lookback` — the streaming analogue
    * of the as-of/range family (q42/q45). Both sides are watermarked and
    * the join condition bounds the time skew, which is what lets Spark
    * bound BOTH join-state buffers (unbounded-condition stream joins
    * grow state forever). Inner join → append mode. */
  def clickPurchaseJoin(events: DataFrame, lookback: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"),
        col("value").as("click_value"))
      .withWatermark("click_ts", watermark)
    purchases.join(clicks,
      col("user_id") === col("click_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $lookback"))
      .select("purchase_id", "user_id", "purchase_ts", "purchase_value",
        "click_ts", "click_value")
  }

  case class AsOfOut(event_id: Long, user_id: Long, purchase_ts: Timestamp,
      click_ts: Option[Timestamp], click_value: Option[Double])

  /** As-of buffers (public: Catalyst codegen instantiates it).
    * rights = (ts, value) clicks; lefts = (ts, event_id) purchases. */
  case class AsOfState(rights: List[(Long, Double)], lefts: List[(Long, Long)])

  /** Streaming as-of join — the unbounded twin of q42/q46
    * ([[graft.operators.AsOfJoin]]): every purchase is paired with the
    * same user's most recent click at or before it (ASOF LEFT: no prior
    * click → nulls). A left row can only be emitted once its match is
    * FINAL, i.e. once the watermark passes its event time (no click at or
    * before it can still arrive) — so purchases buffer until the
    * watermark releases them, the emit-on-watermark discipline every
    * streaming as-of needs.
    *
    * State is bounded on both sides: purchases leave the buffer when
    * emitted, and of the clicks at or below the watermark only the
    * greatest (ts, value) survives — any future purchase has
    * ts > watermark, so that one click dominates every older one. The
    * (ts, value) tuple-max tie-break is the batch operator's
    * greatest-payload-at-shared-timestamp rule, so the streaming and
    * batch answers are identical row-for-row (EventStreamsSpec pins it).
    * Event-time timeouts flush buffered purchases of users who go quiet;
    * the single surviving click per idle user is the irreducible as-of
    * state (a purchase may arrive any time later), the streaming analogue
    * of the batch right side. */
  def asOfClickPurchase(events: Dataset[Event],
      watermarkDelay: String = "10 minutes"): Dataset[AsOfOut] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "click" || e.event_type == "purchase")
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfState, AsOfOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[AsOfState]) =>
          val prev = state.getOption.getOrElse(AsOfState(Nil, Nil))
          var rights = prev.rights
          var lefts = prev.lefts
          rows.foreach { e =>
            if (e.event_type == "click") rights = (e.ts.getTime, e.value) :: rights
            else lefts = (e.ts.getTime, e.event_id) :: lefts
          }
          val wm = state.getCurrentWatermarkMs()
          val (due, pending) = lefts.partition(_._1 <= wm)
          val out = due.sortBy(identity).map { case (lts, id) =>
            val candidates = rights.filter(_._1 <= lts)
            val m = if (candidates.isEmpty) None else Some(candidates.max)
            AsOfOut(id, userId, new Timestamp(lts),
              m.map(r => new Timestamp(r._1)), m.map(_._2))
          }
          val (live, dominated) = rights.partition(_._1 > wm)
          val keep = if (dominated.isEmpty) live else dominated.max :: live
          if (pending.isEmpty && keep.isEmpty) state.remove()
          else {
            state.update(AsOfState(keep, pending))
            // revisit this user when the watermark reaches its earliest
            // buffered purchase (all pending ts > wm, as required)
            if (pending.nonEmpty) state.setTimeoutTimestamp(pending.map(_._1).min)
          }
          out.iterator
      }
  }

  /** Funnel stage advance: user reached `stage` (1=view, 2=click,
    * 3=purchase) at event time `stage_ts`. */
  case class FunnelHit(user_id: Long, stage: Int, stage_ts: Timestamp)

  /** Timestamp ↔ epoch-micros (Timestamp.getTime is millis — using it
    * as the event-time key would truncate the fixture's microsecond
    * precision and diverge from the batch twin's strict comparisons). */
  private def tsMicros(t: Timestamp): Long =
    (t.getTime - t.getNanos / 1000000) * 1000L + t.getNanos / 1000
  private def microsTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  /** Funnel accumulator: ripe-ordered fold results + the not-yet-ripe
    * event buffer (public: Catalyst codegen instantiates it). */
  case class FunnelState(buffer: List[(Long, Long, String)],
      view: Option[Long], click: Option[Long], purchase: Option[Long])

  /** Streaming view→click→purchase funnel — the streaming twin of
    * AnalyticsQueries.q66Funnel, batch-identical regardless of how
    * events split into micro-batches or arrive out of order within the
    * watermark delay.
    *
    * Correct cross-batch semantics need ORDERED processing: a click in
    * batch 1 may be preceded by a view that only arrives in batch 2, so
    * events are buffered in state and folded in (ts, event_id) order
    * only once the watermark passes them — the same emit-on-watermark
    * discipline as [[asOfClickPurchase]]. The fold advances each stage
    * at its FIRST qualifying event (click strictly after the first
    * view, purchase strictly after that click — processing in event
    * order makes "first qualifying" ≡ the batch min-aggregation), and
    * emits a [[FunnelHit]] per advance: at most 3 rows per user ever.
    * State is the ripe fold (3 options) + only the sub-watermark-delay
    * event buffer — bounded by per-user event rate × delay, evicted by
    * event-time timeout. */
  def funnel(events: Dataset[Event],
      watermarkDelay: String = "10 minutes"): Dataset[FunnelHit] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "view" || e.event_type == "click" ||
        e.event_type == "purchase")
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          val prev = state.getOption.getOrElse(FunnelState(Nil, None, None, None))
          val buffer = prev.buffer ++
            rows.map(e => (tsMicros(e.ts), e.event_id, e.event_type))
          val wm = state.getCurrentWatermarkMs()
          // STRICTLY below the watermark: Spark still admits events at
          // ts >= wm, so an event at exactly wm could yet be preceded by
          // a same-millisecond arrival — folding it early would break
          // batch parity. Boundary events wait one more trigger.
          val (ripe, pending) = buffer.partition(_._1 / 1000 < wm)
          var (view, click, purchase) = (prev.view, prev.click, prev.purchase)
          val out = scala.collection.mutable.ListBuffer.empty[FunnelHit]
          ripe.sortBy(e => (e._1, e._2)).foreach { case (t, _, tpe) =>
            tpe match {
              case "view" if view.isEmpty =>
                view = Some(t); out += FunnelHit(userId, 1, microsTs(t))
              case "click" if click.isEmpty && view.exists(_ < t) =>
                click = Some(t); out += FunnelHit(userId, 2, microsTs(t))
              case "purchase" if purchase.isEmpty && click.exists(_ < t) =>
                purchase = Some(t); out += FunnelHit(userId, 3, microsTs(t))
              case _ => ()
            }
          }
          // the fold fields persist for the user's lifetime (3 longs —
          // the same state a batch re-aggregation would carry): removing
          // them after stage 3 would let a later view restart the funnel
          // and re-emit stages, diverging from the batch min-aggregation
          val keep = if (purchase.nonEmpty) Nil else pending // done: drop buffer
          state.update(FunnelState(keep, view, click, purchase))
          // revisit when the watermark reaches the earliest buffered
          // event (all pending ts > wm by construction; timeout is in ms
          // — round UP so the timeout really is past the buffered event)
          if (keep.nonEmpty) state.setTimeoutTimestamp(keep.map(_._1).min / 1000 + 1)
          out.iterator
      }
  }

  /** Streaming heavy hitters: a Misra-Gries summary of `itemCol`
    * maintained incrementally over the stream — the ingest-side twin of
    * the batch q58. Complete-mode aggregation: Spark keeps the MG
    * buffer (k counters, a few KB) as the ONLY state regardless of
    * stream volume and re-emits the current summary each trigger; no
    * per-item state, no watermark needed (nothing is ever late for a
    * running frequency summary). The sketch's mergeability (Agarwal et
    * al., PODS 2012) is exactly what makes it streaming-safe: arrival
    * order and micro-batch boundaries change WHICH non-heavy entries
    * linger, but never the guarantee — every item with true count >
    * n/(k+1) is present, every estimate undercounts by <= n/(k+1)
    * (pinned against exact counts in EventStreamsSpec). */
  def heavyHitters(events: DataFrame, itemCol: String, k: Int): DataFrame =
    events.agg(graft.functions.MisraGries(col(itemCol), k).as("mg"))

  /** RocksDB state store for large stateful queries: keeps per-key state
    * off-heap on local disk instead of the executor heap — at 100 TB a
    * sessionizer's state (every open session) dwarfs executor memory;
    * HDFS-backed in-memory state OOMs where RocksDB spills. Changelog
    * checkpointing ships only per-batch deltas to the checkpoint dir.
    * Apply to the session BEFORE starting stateful queries. */
  val rocksDbStateStoreConf: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")

  /** Exactly-once parquet sink via foreachBatch: micro-batch `b` lands in
    * `targetDir/batch_id=b` with OVERWRITE. Structured Streaming replays
    * an uncommitted batch after a crash with the SAME batch id, so the
    * retry overwrites the partial directory instead of appending next to
    * it — writes become idempotent on (batchId), which upgrades the
    * at-least-once foreachBatch contract to exactly-once observable
    * output. This is the plain-parquet equivalent of a transactional
    * sink's MERGE-on-key upsert; readers see the target as one
    * batch_id-partitioned parquet table. */
  def exactlyOnceParquetSink(out: DataFrame, targetDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    out.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$targetDir/batch_id=$batchId")
        ()
      }
      .start()
}
