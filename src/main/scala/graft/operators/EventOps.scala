package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch operators (SURVEY.md §2.10): JSON extraction,
  * event-time windows, sessionization. The streaming (Structured
  * Streaming) variants live in [[graft.streaming.StreamOps]]; these batch
  * forms are their oracles (same semantics, replayable in ANSI SQL).
  */
object EventOps {

  /** JSON property extraction: props is a JSON string column. */
  def extractProp(df: DataFrame, propsCol: String, key: String): DataFrame =
    df.withColumn(key,
      get_json_object(col(propsCol), s"$$.$key").cast("int"))

  /** Tumbling event-time window aggregate (batch form of the streaming
    * windowed count). Window start kept as a formatted string for exact
    * oracle comparison. */
  def tumblingAgg(df: DataFrame, tsCol: String): DataFrame =
    df.groupBy(
      date_format(date_trunc("hour", col(tsCol)), "yyyy-MM-dd HH:mm:ss").as("hour"),
      col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))

  /** Sliding event-time window aggregate via Spark's window() —
    * demonstrates the built-in; overlapping windows (1h length, 30m
    * slide). */
  def slidingAgg(df: DataFrame, tsCol: String): DataFrame =
    df.groupBy(window(col(tsCol), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"))

  /** Gaps-and-islands sessionization: a session breaks after `gapMinutes`
    * of inactivity. Pure window functions — identical semantics in the
    * DuckDB oracle. Returns one row per user with session stats (span
    * in microseconds: exact integers, no float drift). */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
                 gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol))
    val withGap = df
      .withColumn("prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("prev_ts")) > gapMinutes * 60L * 1000000L, 1)
          .otherwise(0))
    val withId = withGap.withColumn("session_id",
      sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withId.groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol)))).as("span_us"))
      .groupBy(userCol)
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        sum(col("span_us")).as("total_span_us"))
  }

  /** Session-window aggregate via Spark's built-in session_window —
    * the engine-native form of [[sessionize]] (no SQL oracle; equivalence
    * asserted in ScalaTest). */
  def sessionWindowAgg(df: DataFrame, userCol: String, tsCol: String,
                       gapMinutes: Int): DataFrame =
    df.groupBy(session_window(col(tsCol), s"$gapMinutes minutes"), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol), col("session_window.start").as("session_start"),
        col("n_events"))
}
