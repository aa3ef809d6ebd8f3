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
  private case class SessionState(nSessions: Long, nEvents: Long, lastUs: Long)

  /** Stateful sessionization: counts sessions per user with a gap timeout,
    * emitting a running update per micro-batch — the streaming twin of
    * [[graft.operators.EventOps.sessionize]]'s n_sessions/n_events.
    * Requires events in event-time order per user within the replay (true
    * for the bounded test replay; production would use event-time timeouts
    * + out-of-order buffering). */
  def sessionCounts(events: Dataset[Event], gapMinutes: Int)
                   (implicit spark: SparkSession): Dataset[SessionUpdate] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(SessionState(0L, 0L, Long.MinValue))
          batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
            // exact µs (getTime alone floors to ms and can flip a
            // gap-boundary decision vs the batch operator's unix_micros)
            val us = (e.ts.getTime / 1000L) * 1000000L + e.ts.getNanos / 1000L
            val newSession = st.lastUs == Long.MinValue || us - st.lastUs > gapUs
            st = SessionState(st.nSessions + (if (newSession) 1 else 0),
              st.nEvents + 1, us)
          }
          state.update(st)
          Iterator(SessionUpdate(user, st.nSessions, st.nEvents))
      }
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

  /** Replay a bounded parquet directory through a streaming query into a
    * memory sink; returns the sink table name. Used by tests and demos. */
  def replayToMemory(spark: SparkSession, df: DataFrame, name: String): Unit = {
    val q = df.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }
}
