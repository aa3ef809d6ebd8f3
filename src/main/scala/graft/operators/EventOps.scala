package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Session path mining — the "what do users actually do" table behind
    * funnel design: sessions cut by the same inactivity gap as
    * [[sessionize]], each session rendered as its (ts, id)-ordered
    * event-type path string, then a frequency table of paths seen ≥
    * `minCount` times. Everything is integer arithmetic + deterministic
    * string assembly, so the table is exact-oracle-able.
    *
    * Scale shape: one keyed window pass for session assignment (state =
    * one previous row), one session-keyed aggregate whose state is a
    * single session's events (bounded by session length, never a user's
    * history), one path-keyed count. */
  def sessionPaths(df: DataFrame, userCol: String, tsCol: String,
                   idCol: String, typeCol: String, gapMinutes: Int,
                   minCount: Long = 2L): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val withId = df
      .withColumn("prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("new_session", when(col("prev_ts").isNull ||
        unix_micros(col(tsCol)) - unix_micros(col("prev_ts")) >
          gapMinutes * 60L * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withId.groupBy(col(userCol), col("session_id"))
      .agg(sort_array(collect_list(
        struct(col(tsCol), col(idCol), col(typeCol)))).as("evs"))
      .select(array_join(transform(col("evs"),
        e => e.getField(typeCol)), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .filter(col("n_sessions") >= minCount)
  }

  /** Hourly gap-fill + cumulative count per user: time-series densification
    * for training pipelines (a model reading per-hour activity needs the
    * zero hours, which the raw event log omits by construction). Hours
    * are integer epoch-hour buckets (`µs div 3.6e9` — integer division,
    * bit-portable; float division could flip a floor at exact boundaries).
    * Missing hours inside each user's [min, max] hour get an explicit
    * n = 0 row; `cum_n` is the running total.
    *
    * Scale shape: one aggregation to per-(user, hour) counts, one tiny
    * per-user bounds aggregation, then `sequence`+`explode` generates the
    * dense hour spine DISTRIBUTED (each user's spine built on its own
    * executor — never a driver-side calendar), a left join fills, and one
    * window pass accumulates. Spine size is bounded by the time range,
    * not the event count. */
  def gapFillHourly(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    // true FLOOR division (`div` truncates toward zero, which would put
    // pre-1970 events in the wrong hour and diverge from the oracle's
    // floor(epoch/3600))
    val base = df.select(col(userCol).as("user_id"),
      unix_micros(col(tsCol)).as("us"))
      .select(col("user_id"),
        (expr("us div 3600000000") -
          when(expr("us % 3600000000") < 0, 1).otherwise(0)).as("h"))
    val counts = base.groupBy("user_id", "h").agg(count(lit(1)).as("n"))
    val bounds = counts.groupBy("user_id")
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val spine = bounds.select(col("user_id"),
      explode(sequence(col("h0"), col("h1"))).as("h"))
    spine.join(counts, Seq("user_id", "h"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("cum_n",
        sum(col("n")).over(Window.partitionBy("user_id").orderBy("h")))
      .select(col("user_id"), col("h").as("epoch_hour"), col("n"), col("cum_n"))
  }

  /** Ordered funnel: how many users performed `stages` IN ORDER, each
    * stage within `windowSec` of completing the previous one. Stage i's
    * completion time is the EARLIEST qualifying event (min ts ≥ previous
    * completion, ≤ previous + window) — the standard greedy funnel, which
    * maximizes the chance of completing later stages. Ties on ts count
    * (>= semantics). Returns one row per stage with the surviving user
    * count.
    *
    * Scale shape: one filtered aggregation per stage, chained by
    * equi-joins on user — |stages| keyed shuffles, no self-join blowup,
    * no per-user event lists (the classic collect_list funnel holds a
    * user's whole history in one row; this never does).
    *
    * A REPEATED stage name ("view → view" re-engagement) requires a
    * strictly LATER event — with `>=` the single event that anchored
    * stage i−1 would satisfy stage i too and every one-event user would
    * "complete" both. Distinct consecutive stages keep `>=` (ties
    * between different event types count). */
  def funnel(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
             stages: Seq[String], windowSec: Long): DataFrame = {
    require(stages.nonEmpty, "funnel: stages must be non-empty")
    val e = df.select(col(userCol).as("user_id"), col(typeCol).as("et"),
      unix_micros(col(tsCol)).as("us"))
    val first = e.filter(col("et") === stages.head)
      .groupBy("user_id").agg(min(col("us")).as("t"))
    val reached = stages.tail.zip(stages).scanLeft(first) {
      case (prev, (s, prevStage)) =>
        val after = if (s == prevStage) col("us") > col("t")
          else col("us") >= col("t")
        e.filter(col("et") === s).join(prev, Seq("user_id"))
          .filter(after && col("us") <= col("t") + windowSec * 1000000L)
          .groupBy("user_id").agg(min(col("us")).as("t"))
    }
    reached.zip(stages).zipWithIndex.map { case ((stage, name), i) =>
      stage.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(name).as("event_type"),
          col("n_users"))
    }.reduce(_.unionByName(_))
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

  /** Time-weighted average of a reading per key — the aggregate a
    * sampled sensor/price series needs (a plain avg() over-weights burst
    * periods): each value holds until the NEXT event (step
    * interpolation), so its weight is the exact microsecond interval to
    * that event. The last event per key carries no interval and drops
    * out; single-event keys produce no row.
    *
    * Portability discipline: weights are integer microseconds
    * (unix_micros), values go to 2⁻²⁰ fixed point BEFORE the multiply,
    * and the weighted mass accumulates in decimal(38,0) (fixed value ×
    * year-scale micros overflows Int64) — exact, associative, partition-
    * order-independent, bit-replayable in SQL. Only the final
    * (mass / 2²⁰) / span happens in doubles, in a fixed parenthesized
    * order, with the decimal→double hop STRING-mediated (both engines
    * parse digit strings correctly rounded; their native wide-decimal
    * casts double-round differently — the x_corr_stats lesson). Ties on
    * ts are totally ordered by the id column: with equal timestamps,
    * WHICH value gets the zero-length interval is otherwise
    * engine-dependent.
    *
    * Scale shape: ONE shuffle on the key (the lead window); the per-key
    * aggregate rides the same partitioning. */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
                      idCol: String, valCol: String): DataFrame = {
    val ord = Window.partitionBy("k").orderBy(col("ts_us"), col("tie"))
    df.select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("ts_us"),
        col(idCol).as("tie"), col(valCol).as("v"))
      .withColumn("dt", lead(col("ts_us"), 1).over(ord) - col("ts_us"))
      .filter(col("dt").isNotNull)
      .withColumn("wv", floor(col("v") * lit(1048576.0)).cast("long")
        .cast("decimal(38,0)") * col("dt"))
      .groupBy("k")
      .agg(sum("wv").cast("decimal(38,0)").as("swv"), sum("dt").as("sdt"),
        count(lit(1)).as("n_intervals"))
      .select(col("k"),
        ((col("swv").cast("string").cast("double") / lit(1048576.0)) /
          col("sdt").cast("double")).as("twa"),
        col("sdt").as("total_us"), col("n_intervals"))
  }

  /** Weekly cohort retention — the standard growth-analytics matrix:
    * users bucketed by first-active epoch week (the cohort), counted in
    * every later week they return. Epoch weeks are INTEGER arithmetic
    * (unix_micros div week-micros — no timezone/DST surface, no float
    * floor), offsets are week differences. Two shuffles: min-week per
    * user, then the (cohort, offset) count — both plain hash aggregates,
    * no windows, nothing per-user materialized beyond its first week. */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val ev = df.select(col(userCol).as("user_id"),
      expr(s"unix_micros($tsCol) div 604800000000").as("wk"))
    val first = ev.groupBy("user_id").agg(min("wk").as("cohort_week"))
    ev.join(first, Seq("user_id"))
      .select(col("user_id"), col("cohort_week"),
        (col("wk") - col("cohort_week")).as("week_offset"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order Markov transition matrix over per-key event sequences:
    * count (previous event type → event type) steps with a lag window
    * ordered by (ts, id) — ties totally ordered by the id column so the
    * sequence, and therefore the matrix, is engine- and
    * partitioning-independent — then row-normalize to transition
    * probabilities. The counts are exact integers and each probability
    * is a single two-integer division (correctly rounded IEEE in every
    * engine), so the whole matrix is exact-oracle-able.
    *
    * Scale shape: one shuffle on the key for the lag window (per-key
    * state = one previous row), one hash aggregate on the (from, to)
    * pair; the normalizer runs over the |types|² count frame — a
    * parameter-sized result, not the event log. */
  def markovTransitions(df: DataFrame, keyCol: String, tsCol: String,
                        idCol: String, typeCol: String): DataFrame = {
    val ord = Window.partitionBy("k").orderBy(col("ts"), col("tie"))
    val steps = df.select(col(keyCol).as("k"), col(tsCol).as("ts"),
        col(idCol).as("tie"), col(typeCol).as("to_state"))
      .withColumn("from_state", lag(col("to_state"), 1).over(ord))
      .filter(col("from_state").isNotNull)
    val counts = steps.groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
    counts.withColumn("p", col("n").cast("double") /
      sum(col("n")).over(Window.partitionBy("from_state")).cast("double"))
  }

  /** Per-key exponentially weighted moving average — the linear
    * recurrence s ← s·(1−α) + α·x over the key's events in time order,
    * reported at the final event (user recency scoring / decayed
    * activity in feature pipelines). A window can't express the
    * recurrence (each step multiplies the whole prefix), so the key's
    * values are collected ts-sorted (ties totally ordered by the id
    * column, the timeWeightedAvg lesson) and folded strictly left to
    * right — the same discipline that makes the doubles
    * partition-invariant also makes them replayable by DuckDB's
    * list_reduce over a 0.0-prepended list. 1−α is COMPUTED (1.0 − α)
    * rather than passed, so both engines derive the identical IEEE
    * constant.
    *
    * Scale shape: one shuffle on the key; state per key = its event
    * list — EWMA is inherently sequential per key, and keys are the
    * parallelism axis. For unbounded per-key streams the streaming
    * analogue is mapGroupsWithState carrying (s, last_ts). */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
           valCol: String, alpha: Double): DataFrame = {
    val beta = 1.0 - alpha
    df.select(col(keyCol).as("k"), col(tsCol).as("ts"),
        col(idCol).as("tie"), col(valCol).as("x"))
      .groupBy("k")
      .agg(sort_array(collect_list(struct(col("ts"), col("tie"), col("x"))))
        .as("xs"))
      .select(col("k").as(keyCol),
        size(col("xs")).cast("long").as("n_events"),
        aggregate(transform(col("xs"), p => p.getField("x")),
          lit(0.0), (a, x) => a * lit(beta) + lit(alpha) * x).as("ewma"))
  }

  /** One-sided (upper) CUSUM drift detector per key: the sequential
    * change-point statistic s_i = max(0, s_{i−1} + x_i − (target+slack)),
    * alarming when the cumulative positive drift exceeds `threshold` —
    * the metric-regression tripwire for per-entity monitoring.
    *
    * Same skeleton as [[ewma]]: CUSUM is inherently sequential per key,
    * so keys are the parallelism axis and the per-key ts-ordered fold is
    * a strict left-to-right `aggregate` over a sorted collect_list —
    * partition-order proof and replayable double-for-double by the
    * oracle's list_reduce. State per key = its event list. */
  def cusumDrift(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
                 valCol: String, target: Double, slack: Double,
                 threshold: Double): DataFrame = {
    val k = target + slack
    df.select(col(keyCol).as("k"), col(tsCol).as("ts"),
        col(idCol).as("tie"), col(valCol).as("x"))
      .groupBy("k")
      .agg(sort_array(collect_list(struct(col("ts"), col("tie"), col("x"))))
        .as("xs"))
      .select(col("k").as(keyCol),
        size(col("xs")).cast("long").as("n_events"),
        aggregate(transform(col("xs"), p => p.getField("x")),
          lit(0.0), (a, x) => greatest(lit(0.0), a + x - lit(k)))
          .as("cusum"))
      .withColumn("alarm", col("cusum") > lit(threshold))
  }

  /** Holt double-exponential smoothing per key (level + trend), the
    * forecasting step up from [[ewma]] for series with drift:
    *   l_i = α·x_i + (1−α)·(l_{i−1} + b_{i−1})
    *   b_i = β·(l_i − l_{i−1}) + (1−β)·b_{i−1}
    * initialized l_1 = x_1, b_1 = 0; emits the final state and the
    * one-step-ahead forecast l + b.
    *
    * Same skeleton and exactness contract as [[ewma]]/[[cusumDrift]]:
    * one shuffle on the key, a strict ts-ordered left fold per key —
    * the two-component state rides as a struct, which the oracle
    * replays with list_reduce over a struct-mapped list (DuckDB's
    * reduce takes no explicit zero, so element 1 IS the init — the
    * same l_1 = x_1, b_1 = 0 this side folds from). Keys are the
    * parallelism axis; state per key = its event list. */
  def holtSmooth(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
                 valCol: String, alpha: Double, beta: Double): DataFrame = {
    val sorted = df.select(col(keyCol).as("k"), col(tsCol).as("ts"),
        col(idCol).as("tie"), col(valCol).as("x"))
      .groupBy("k")
      .agg(sort_array(collect_list(struct(col("ts"), col("tie"), col("x"))))
        .as("xs"))
      .select(col("k"), size(col("xs")).cast("long").as("n_events"),
        transform(col("xs"),
          p => struct(p.getField("x").cast("double").as("l"),
            lit(0.0).as("b"))).as("sts"))
    sorted.select(col("k").as(keyCol), col("n_events"),
        aggregate(
          slice(col("sts"), lit(2), greatest(size(col("sts")) - 1, lit(0))),
          element_at(col("sts"), 1),
          (a, x) => {
            val lNew = lit(alpha) * x.getField("l") +
              lit(1.0 - alpha) * (a.getField("l") + a.getField("b"))
            struct(lNew.as("l"),
              (lit(beta) * (lNew - a.getField("l")) +
                lit(1.0 - beta) * a.getField("b")).as("b"))
          }).as("st"))
      .select(col(keyCol), col("n_events"),
        col("st.l").as("level"), col("st.b").as("trend"),
        (col("st.l") + col("st.b")).as("forecast_1"))
  }

  /** Last-touch attribution: every `targetType` event (purchase) is
    * credited to the SAME user's most recent `sourceType` event (click)
    * at-or-before it and within `horizonSec` — the marketing-attribution
    * primitive, and the event-stream face of an as-of join.
    *
    * Scale shape: one shuffle on the user key, one ordered window pass
    * (explicit ROWS frame; a running last-non-null carry, state = one
    * struct), then a narrow filter. No self-join of the event table.
    * Out-of-horizon targets keep a NULL source (they're "organic"). */
  def lastTouch(df: DataFrame, userCol: String, tsCol: String, idCol: String,
                typeCol: String, sourceType: String, targetType: String,
                horizonSec: Long): DataFrame = {
    val w = Window.partitionBy("u").orderBy("ts", "id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(userCol).as("u"), col(tsCol).as("ts"),
        col(idCol).as("id"), col(typeCol).as("t"))
      .where(col("t").isin(sourceType, targetType))
      .withColumn("src", last(
        when(col("t") === sourceType,
          struct(col("ts").as("sts"), col("id").as("sid"))),
        ignoreNulls = true).over(w))
      .where(col("t") === targetType)
      .select(col("u").as(userCol), col("id").as("target_id"),
        col("ts").as("target_ts"),
        when(col("src").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("src.sts")) <=
            horizonSec * 1000000L, col("src.sid")).as("source_id"),
        when(col("src").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("src.sts")) <=
            horizonSec * 1000000L,
          unix_micros(col("ts")) - unix_micros(col("src.sts")))
          .as("lag_us"))
  }

  /** Hourly gap-fill with LINEAR interpolation (the numeric twin of
    * [[gapFillHourly]]'s LOCF): per (user, hour) the mean observed value
    * (decimal-exact sum / count), missing hours interpolated between the
    * nearest observed neighbors, edges extended flat (leading backfill /
    * trailing carry). `src` labels the fill provenance.
    *
    * Scale shape: gapFill's — one aggregation, a distributed
    * sequence+explode spine, one left join, two ordered window passes
    * (backward carry + forward probe, each a single struct of state).
    * The interpolation itself is straight-line double arithmetic on
    * neighbor values — portable and oracle-replayable. */
  def interpolateHourly(df: DataFrame, userCol: String, tsCol: String,
                        valCol: String): DataFrame = {
    def dbl(c: org.apache.spark.sql.Column) = c.cast("string").cast("double")
    val base = df.select(col(userCol).as("user_id"),
        unix_micros(col(tsCol)).as("us"),
        col(valCol).cast("decimal(18,2)").as("v"))
      .select(col("user_id"), col("v"),
        (expr("us div 3600000000") -
          when(expr("us % 3600000000") < 0, 1).otherwise(0)).as("h"))
    val hourly = base.groupBy("user_id", "h")
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
      .select(col("user_id"), col("h"),
        (dbl(col("sv")) / dbl(col("n"))).as("v"))
    val bounds = hourly.groupBy("user_id")
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val spine = bounds.select(col("user_id"),
      explode(sequence(col("h0"), col("h1"))).as("h"))
    val joined = spine.join(hourly, Seq("user_id", "h"), "left")
    val back = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("user_id").orderBy("h")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obs = when(col("v").isNotNull, struct(col("h").as("oh"), col("v").as("ov")))
    joined
      .withColumn("p", last(obs, ignoreNulls = true).over(back))
      .withColumn("nx", first(obs, ignoreNulls = true).over(fwd))
      .select(col("user_id"), col("h").as("epoch_hour"),
        when(col("v").isNotNull, col("v"))
          .when(col("p").isNotNull && col("nx").isNotNull,
            col("p.ov") + (col("nx.ov") - col("p.ov")) *
              (col("h") - col("p.oh")).cast("double") /
              (col("nx.oh") - col("p.oh")).cast("double"))
          .when(col("p").isNotNull, col("p.ov"))
          .otherwise(col("nx.ov")).as("value"),
        when(col("v").isNotNull, "observed")
          .when(col("p").isNotNull && col("nx").isNotNull, "interp")
          .when(col("p").isNotNull, "carry")
          .otherwise("backfill").as("src"))
  }

  /** GSP-style length-3 sequential pattern mining: every run of THREE
    * consecutive events of one key where BOTH inter-event gaps are
    * within `maxGapSec` forms an occurrence of the pattern
    * (a → b → c); patterns are reported with their occurrence count
    * and their SUPPORT (distinct keys exhibiting the pattern), pruned
    * at `minKeys`. The support metric — not the raw count — is what
    * makes this sequence MINING rather than a transition matrix
    * ([[markovTransitions]] is the length-2 count/probability view;
    * this is the "which multi-step behaviors are widespread"
    * question, the Srikant–Agrawal GSP primitive with a sliding
    * window constraint).
    *
    * Scale shape: one shuffle on the key for the lead window (per-key
    * ordered state = two look-ahead rows), a narrow gap filter, then
    * one hash aggregate on the (a, b, c) pattern — count and
    * count(distinct key) collapse map-side per pattern×key. The
    * result frame is ≤ |types|³ rows, parameter-sized. Exact: counts
    * are integers; the gap test is integer microseconds. */
  def seqPatterns3(df: DataFrame, keyCol: String, tsCol: String,
                   idCol: String, typeCol: String,
                   maxGapSec: Long, minKeys: Long): DataFrame = {
    val ord = Window.partitionBy("k").orderBy(col("us"), col("tie"))
    val runs = df.select(col(keyCol).as("k"),
        unix_micros(col(tsCol)).as("us"), col(idCol).as("tie"),
        col(typeCol).as("a"))
      .withColumn("b", lead(col("a"), 1).over(ord))
      .withColumn("c", lead(col("a"), 2).over(ord))
      .withColumn("us_b", lead(col("us"), 1).over(ord))
      .withColumn("us_c", lead(col("us"), 2).over(ord))
      .where(col("c").isNotNull &&
        col("us_b") - col("us") <= maxGapSec * 1000000L &&
        col("us_c") - col("us_b") <= maxGapSec * 1000000L)
    runs.groupBy("a", "b", "c")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("k")).as("n_keys"))
      .where(col("n_keys") >= minKeys)
  }

  /** Linear multi-touch attribution — the fair-share companion to
    * [[lastTouch]]: every `targetType` event splits one unit of credit
    * EQUALLY across all of the same user's `sourceType` events within
    * the horizon before it. Output is the per-source credit ledger
    * (how much conversion each click actually drove).
    *
    * Exactness: the equal share is the INTEGER floor(2²⁰/n) fixed-point
    * weight — identical arithmetic on every engine, and per-source
    * credit sums stay exact integers until one final division.
    *
    * Scale shape: one user-keyed equi-join bounded by the horizon
    * predicate (per-user activity is the fanout, never the cross
    * product), one target-keyed count window, one source-keyed final
    * aggregate. */
  def multiTouchLinear(df: DataFrame, userCol: String, tsCol: String,
                       idCol: String, typeCol: String, sourceType: String,
                       targetType: String, horizonSec: Long): DataFrame = {
    val src = df.filter(col(typeCol) === sourceType)
      .select(col(userCol).as("u"), unix_micros(col(tsCol)).as("sus"),
        col(idCol).as("source_id"))
    val tgt = df.filter(col(typeCol) === targetType)
      .select(col(userCol).as("u"), unix_micros(col(tsCol)).as("tus"),
        col(idCol).as("target_id"))
    val pairs = tgt.join(src, Seq("u"))
      .filter(col("sus") <= col("tus") &&
        col("tus") - col("sus") <= horizonSec * 1000000L)
    val w = Window.partitionBy("target_id")
    pairs
      .withColumn("n_touch", count(lit(1)).over(w))
      .withColumn("credit_fp",
        call_function("div", lit(1048576L), col("n_touch")))
      .groupBy(col("u").as(userCol), col("source_id"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("credit_fp")).as("credit_fp"))
      .withColumn("credit",
        col("credit_fp").cast("double") / lit(1048576.0))
  }

  /** Cohort lifetime-value curve — revenue per user by cohort age, the
    * money twin of [[cohortRetention]]: users cohort by the epoch-week
    * of their first event, every `revenueType` event's cents land in
    * the (cohort, age-in-weeks) cell, and the running cumulative per
    * cohort divides by the cohort's size. Integer epoch-week and cents
    * arithmetic throughout; the cumulative window runs per cohort over
    * the bounded week spine. Cents accumulate in decimal(38,0) (a 100 TB
    * cohort's lifetime cents can pass 2⁶³); the final readout casts to
    * BIGINT — exact while cum_cents < 2⁶³, i.e. total revenue per cohort
    * under ~9.2×10¹⁶ currency units, comfortably past any real ledger. */
  def ltvCurve(df: DataFrame, userCol: String, tsCol: String,
               typeCol: String, revenueType: String,
               valueCol: Column): DataFrame = {
    val wk = (c: Column) => floor(unix_seconds(c) / lit(604800L))
    val firsts = df.groupBy(col(userCol).as("u"))
      .agg(min(wk(col(tsCol))).as("cohort"))
    val sizes = firsts.groupBy("cohort").agg(count(lit(1)).as("n_users"))
    val rev = df.filter(col(typeCol) === revenueType)
      .select(col(userCol).as("u"), wk(col(tsCol)).as("w"),
        floor(valueCol * lit(100.0)).cast("decimal(38,0)").as("cents"))
      .join(firsts, Seq("u"))
      .groupBy(col("cohort"), (col("w") - col("cohort")).as("age"))
      .agg(sum(col("cents")).as("cents"))
    val cum = Window.partitionBy("cohort").orderBy("age")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.withColumn("cum_cents", sum(col("cents")).over(cum))
      .join(sizes, Seq("cohort"))
      .select(col("cohort"), col("age"), col("n_users"),
        col("cents").cast("long").as("cents"),
        col("cum_cents").cast("long").as("cum_cents"),
        (col("cum_cents").cast("string").cast("double") /
          lit(100.0) / col("n_users").cast("double")).as("ltv_per_user"))
  }

  /** Wald's Sequential Probability Ratio Test over the event stream —
    * the "stop the experiment as soon as the evidence is in" companion
    * to the fixed-horizon [[graft.operators.Stats.abTest]]: per
    * md5-half variant, trials (conversion Bernoullis) accumulate hour
    * by hour, the log-likelihood ratio s·ln(p₁/p₀) + f·ln((1−p₁)/(1−p₀))
    * walks between the decision boundaries ln((1−β)/α) (accept H₁) and
    * ln(β/(1−α)) (accept H₀), and the first decisive hour is reported.
    *
    * Float discipline: the four ln constants are DRIVER-precomputed
    * literal doubles (the Ranking-discount pattern — the SQL replay
    * reads identical literals), the LLR is two exact int→double
    * products added in fixed order, boundary compares are therefore
    * bit-replayable.
    *
    * Scale shape: one filtered count aggregate to the (variant, hour)
    * grain; the cumulative window runs per variant over the HOURLY
    * spine (calendar-bounded, never event-sized); a k-variant summary
    * aggregate ends it. */
  def sprt(df: DataFrame, userCol: String, tsCol: String,
           typeCol: String, successType: String, trialTypes: Seq[String],
           p0: Double, p1: Double, alpha: Double,
           beta: Double): DataFrame = {
    val c1 = math.log(p1 / p0)
    val c2 = math.log((1.0 - p1) / (1.0 - p0))
    val bndA = math.log((1.0 - beta) / alpha)
    val bndB = math.log(beta / (1.0 - alpha))
    val hourly = df.filter(col(typeCol).isin(trialTypes: _*))
      .select(
        (conv(substring(md5(col(userCol).cast("string")), 1, 4), 16, 10)
          .cast("long") % 2).as("variant"),
        date_trunc("hour", col(tsCol)).as("h"),
        when(col(typeCol) === successType, 1L).otherwise(0L).as("s"))
      .groupBy("variant", "h")
      .agg(count(lit(1)).as("th"), sum(col("s")).as("sh"))
    val w = Window.partitionBy("variant").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hourly
      .withColumn("ct", sum(col("th")).over(w))
      .withColumn("cs", sum(col("sh")).over(w))
      .withColumn("llr", col("cs").cast("double") * lit(c1) +
        (col("ct") - col("cs")).cast("double") * lit(c2))
      .withColumn("decision",
        when(col("llr") >= lit(bndA), "accept_h1")
          .when(col("llr") <= lit(bndB), "accept_h0")
          .otherwise("continue"))
    cum.groupBy("variant")
      .agg(max(col("ct")).as("n_trials"), max(col("cs")).as("n_success"),
        min(when(col("decision") =!= "continue",
          struct(col("h"), col("decision")))).as("first"))
      .select(col("variant"), col("n_trials"), col("n_success"),
        unix_seconds(col("first.h")).as("decided_at_s"),
        col("first.decision").as("decision"))
  }
}
