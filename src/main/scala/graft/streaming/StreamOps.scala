package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.10): event-time windowed
  * aggregation with watermarks, and custom stateful sessionization via
  * flatMapGroupsWithState.
  *
  * The reference has no streaming at all (SURVEY §2.8); this is extension
  * surface. Correctness story: each streaming op has a batch twin in
  * [[graft.operators.EventOps]] and ScalaTest replays a bounded parquet
  * through the stream (memory sink, processAllAvailable) asserting
  * stream ≡ batch. No DuckDB oracle (SURVEY §7.4.8).
  */
object StreamOps {

  /** Tumbling 1-hour event-time window with a 10-minute watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("total_value"))

  case class Event(user_id: Long, ts: java.sql.Timestamp)
  case class SessionUpdate(user_id: Long, n_sessions: Long, n_events: Long)
  // NOT private: the state-store serializer is codegen'd in a real stream
  // and Janino can't link a Scala-private nested class (batch-mode
  // execution never hit this — the streaming replay does)
  case class SessionState(nSessions: Long, nEvents: Long,
                          lastUs: Long, buffer: Array[Long])

  /** Stateful sessionization, OUT-OF-ORDER SAFE: counts sessions per user
    * with a gap timeout — the streaming twin of
    * [[graft.operators.EventOps.sessionize]]'s n_sessions/n_events.
    *
    * Events buffer unsorted in state; nothing is counted until the
    * EVENT-TIME timeout fires (watermark > last buffered ts + gap), at
    * which point the buffer is sorted and folded into the running counts
    * and one cumulative update is emitted. Sound because the timeout
    * firing PROVES the watermark passed lastTs+gap: any future non-late
    * event must open a new session, and anything older is late beyond the
    * watermark — out of contract for every watermarked operator. State is
    * bounded by the watermark horizon (buffer holds one gap-window of
    * events per user, then folds to three numbers).
    *
    * Requires `withWatermark` on the input (EventTimeTimeout contract).
    * Emits ONLY on timeout — a bounded replay must append one sentinel
    * event past (maxTs + delay + gap) to flush final counts, exactly how
    * production streams see counts appear as users go idle. */
  def sessionCounts(events: Dataset[Event], gapMinutes: Int)
                   (implicit spark: SparkSession): Dataset[SessionUpdate] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastBuffered+gap: fold the buffer in order
            var st = state.get
            var (n, ne, last) = (st.nSessions, st.nEvents, st.lastUs)
            st.buffer.sorted.foreach { us =>
              if (last == Long.MinValue || us - last > gapUs) n += 1
              ne += 1
              last = us
            }
            state.update(SessionState(n, ne, last, Array.empty[Long]))
            Iterator(SessionUpdate(user, n, ne))
          } else {
            val st = state.getOption.getOrElse(
              SessionState(0L, 0L, Long.MinValue, Array.empty[Long]))
            // exact µs (getTime alone floors to ms and can flip a
            // gap-boundary decision vs the batch operator's unix_micros)
            val newUs = batch.map(e =>
              (e.ts.getTime / 1000L) * 1000000L + e.ts.getNanos / 1000L).toArray
            val buf = st.buffer ++ newUs
            state.update(st.copy(buffer = buf))
            // fire once the watermark proves the newest buffered event's
            // session can't grow; clamp above the current watermark (a
            // user whose events are already older than watermark−gap
            // times out at the next micro-batch, which is correct)
            val dueMs = buf.max / 1000L + gapMinutes * 60L * 1000L
            state.setTimeoutTimestamp(
              math.max(dueMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  case class PEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                    event_type: String)
  case class PEv(us: Long, id: Long, tpe: String)
  case class PathState(lastUs: Long, buffer: Array[PEv])
  case class PathUpdate(user_id: Long, path: String, n_events: Long)

  /** Streaming session-path mining, OUT-OF-ORDER SAFE: the stateful twin
    * of [[graft.operators.EventOps.sessionPaths]] — emits one
    * (user, path, n_events) row per CLOSED session as the watermark
    * advances. Same buffering contract as [[sessionCounts]]: events
    * buffer unsorted; the event-time timeout firing proves the watermark
    * passed lastBuffered+gap, so every buffered session is closed — the
    * buffer sorts by (ts, id) (the batch operator's exact order), splits
    * on the gap, and each session's path string is emitted. The split
    * seeds `last` with the PREVIOUS timeout's last timestamp: any event
    * that arrived since is non-late, hence newer than watermark >
    * last+gap, hence a new session — the same soundness argument as the
    * counts twin. State folds to one number per idle user. */
  def sessionPathUpdates(events: Dataset[PEvent], gapMinutes: Int)
                        (implicit spark: SparkSession): Dataset[PathUpdate] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[PathState, PathUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[PEvent], state: GroupState[PathState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            val evs = st.buffer.sortBy(e => (e.us, e.id))
            val sessions = scala.collection.mutable.ArrayBuffer
              .empty[scala.collection.mutable.ArrayBuffer[PEv]]
            var last = st.lastUs
            evs.foreach { e =>
              if (last == Long.MinValue || e.us - last > gapUs)
                sessions += scala.collection.mutable.ArrayBuffer(e)
              else sessions.last += e
              last = e.us
            }
            state.update(PathState(last, Array.empty[PEv]))
            sessions.iterator.map(s =>
              PathUpdate(user, s.map(_.tpe).mkString(">"), s.size.toLong))
          } else {
            val st = state.getOption.getOrElse(
              PathState(Long.MinValue, Array.empty[PEv]))
            val newEvs = batch.map(e => PEv(
              (e.ts.getTime / 1000L) * 1000000L + e.ts.getNanos / 1000L,
              e.event_id, e.event_type)).toArray
            val buf = st.buffer ++ newEvs
            state.update(st.copy(buffer = buf))
            val dueMs = buf.map(_.us).max / 1000L + gapMinutes * 60L * 1000L
            state.setTimeoutTimestamp(
              math.max(dueMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  case class VEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                    value: Double)
  case class EwmaEv(us: Long, id: Long, v: Double)
  case class EwmaState(s: Double, n: Long, buffer: Array[EwmaEv])
  case class EwmaUpdate(user_id: Long, n_events: Long, ewma: Double)

  /** Streaming EWMA, OUT-OF-ORDER SAFE: the stateful twin of
    * [[graft.operators.EventOps.ewma]] — per-user exponentially decayed
    * activity, emitted as the watermark advances. Same buffering contract
    * as [[sessionCounts]]: events buffer unsorted; the event-time timeout
    * firing proves the watermark passed everything buffered, so the
    * buffer is sorted by (ts, id) — the batch operator's exact order —
    * and folded into the running (s, n) with the IDENTICAL IEEE ops, so
    * a bounded replay matches the batch EWMA double-for-double. State
    * folds to two numbers per idle user; the buffer is bounded by the
    * watermark horizon. */
  def ewmaUpdates(events: Dataset[VEvent], alpha: Double)
                 (implicit spark: SparkSession): Dataset[EwmaUpdate] = {
    import spark.implicits._
    val beta = 1.0 - alpha
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, EwmaUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[VEvent], state: GroupState[EwmaState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            var s = st.s
            var n = st.n
            st.buffer.sortBy(e => (e.us, e.id)).foreach { e =>
              s = s * beta + alpha * e.v
              n += 1
            }
            state.update(EwmaState(s, n, Array.empty[EwmaEv]))
            Iterator(EwmaUpdate(user, n, s))
          } else {
            val st = state.getOption.getOrElse(
              EwmaState(0.0, 0L, Array.empty[EwmaEv]))
            // exact µs (getTime floors to ms — the sessionCounts lesson)
            val add = batch.map(e => EwmaEv(
              (e.ts.getTime / 1000L) * 1000000L + e.ts.getNanos / 1000L,
              e.event_id, e.value)).toArray
            val buf = st.buffer ++ add
            state.update(st.copy(buffer = buf))
            val dueMs = buf.map(_.us).max / 1000L + 1L
            state.setTimeoutTimestamp(
              math.max(dueMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Stream-stream inner join with bounded state: clicks ⋈ purchases per
    * user where the purchase lands within [click, click + windowMinutes).
    * Both sides carry watermarks and the join condition bounds event time
    * in BOTH directions, so Spark can expire state on each side at the
    * watermark — the state-bounding contract every production
    * stream-stream join needs (an unbounded-time join would buffer both
    * streams forever). Batch twin: the identical join condition on static
    * frames (StreamingSpec asserts equality on a bounded replay). */
  /** `joinType` "inner" emits matches as they arrive; "leftOuter" ALSO
    * emits unmatched clicks with null purchase columns — but only once
    * the watermark proves no in-window purchase can still arrive (the
    * interval bound on both event times is what lets Spark expire join
    * state and certify the non-match; an outer interval join without
    * both bounds would buffer forever). */
  def clickToPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
                          delay: String, windowMinutes: Int,
                          joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("ts", delay)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", delay)
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") < col("click_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
      joinType)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("lag_us"))
  }

  /** Streaming dedup on a content fingerprint with bounded state: rows
    * whose fingerprint was already seen (within the watermark horizon)
    * are dropped — the ingest-time twin of
    * [[graft.operators.Dedup.exact]]. State expires with the watermark,
    * so memory is bounded by the dedup horizon, not the stream length. */
  def streamingDedup(events: DataFrame, tsCol: String, fingerprintCol: String,
                     horizon: String): DataFrame =
    events
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(fingerprintCol)

  /** foreachBatch incremental-aggregate sink: each micro-batch is
    * partially aggregated and MERGED into the maintained result via
    * [[graft.operators.Evolve.mergeAggregates]] — the streaming form of
    * incremental view maintenance (refresh cost O(|batch|), never
    * O(|history|)). The batch twin is the full recompute; StreamingSpec
    * asserts multi-batch replay ≡ recompute.
    *
    * Exactly-once: foreachBatch is AT-LEAST-ONCE on failure recovery, and
    * a merge is not idempotent — so the sink keys application on the
    * framework-provided batchId and skips replays, the standard
    * idempotent-sink recipe (a durable deployment persists the applied-id
    * watermark with the result table, e.g. as a transactional write).
    * Each merge is localCheckpoint'ed EAGERLY — persist would cache the
    * data but leave the logical plan growing by one full-outer join per
    * micro-batch (linear analysis cost, eventual driver OOM on a
    * long-running stream), and a recompute after cache loss would chase
    * lineage back into expired foreachBatch source frames; checkpointing
    * truncates the plan to the materialized result every batch. */
  class IncrementalAggSink(key: String, aggOf: DataFrame => DataFrame)
      extends Serializable {
    @volatile private var state: Option[DataFrame] = None
    private val applied = scala.collection.mutable.Set[Long]()

    def apply(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (!applied.add(batchId)) return // replayed micro-batch: skip
      val delta = aggOf(batch).localCheckpoint(true)
      state = Some(state match {
        case None => delta
        case Some(cur) =>
          val merged = graft.operators.Evolve.mergeAggregates(cur, delta, key)
            .localCheckpoint(true)
          // the merge is materialized: the superseded state's and the
          // delta's checkpoint blocks are dead — drop them eagerly, or a
          // long-running stream accumulates one orphaned checkpoint per
          // micro-batch until driver GC happens to run (linear block-
          // manager growth; Dataset.unpersist can't free these).
          graft.plans.CheckpointBlocks.release(cur)
          graft.plans.CheckpointBlocks.release(delta)
          merged
      })
    }

    /** The maintained aggregate (after ≥ 1 applied batch). */
    def current: DataFrame = state.getOrElse(
      throw new IllegalStateException("IncrementalAggSink: no batch applied yet"))
  }

  /** Wire an [[IncrementalAggSink]] onto a stream. */
  def incrementalAggQuery(stream: DataFrame, sink: IncrementalAggSink): Unit = {
    val q = stream.writeStream.outputMode("append")
      .foreachBatch((df: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink.apply(df.toDF(), id))
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Replay a bounded parquet directory through a streaming query into a
    * memory sink; returns the sink table name. Used by tests and demos. */
  /** Native gap-session counts via Spark's `session_window` — the
    * DECLARATIVE counterpart of [[sessionCounts]]' custom
    * flatMapGroupsWithState state machine: same gap-merge semantics,
    * session state managed by the engine (RocksDB-ready at scale), and
    * the plan stays a streaming aggregation the optimizer understands.
    * Works batch and streaming; streaming callers must watermark
    * upstream (append emits a session only after the watermark passes
    * its close — the bounded-replay tail stays buffered, which the
    * equivalence spec accounts for by asserting containment). */
  def sessionWindowCounts(events: DataFrame, gap: String): DataFrame =
    events.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        col("n_events"))

  def replayToMemory(spark: SparkSession, df: DataFrame, name: String): Unit = {
    val q = df.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }
}
