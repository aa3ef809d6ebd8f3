package graft

import org.apache.spark.sql.functions._
import graft.operators.EventOps
import graft.streaming.StreamOps

/** Streaming ≡ batch equivalence (SURVEY.md §7.4.8): bounded replay of the
  * events parquet through Structured Streaming must reproduce the batch
  * operators' results. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streaming windowed counts == batch tumbling aggregate") {
    val batchEv = Tables.load(spark, sf, "events")
    // FileStreamSource needs a directory: stage the single parquet there
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    // streaming source needs an explicit schema; reuse the batch one
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$sf/events.parquet").schema)
      .parquet(dir.toString)
    val ev = raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    StreamOps.replayToMemory(spark, StreamOps.windowedCounts(ev), "win_stream")
    val streamed = spark.table("win_stream")
    val batch = batchEv.groupBy(
      date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
      col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0)
  }

  test("stateful session counts == batch sessionize") {
    implicit val s = spark
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("ts"))
    val batch = EventOps.sessionize(Tables.load(spark, sf, "events"),
      "user_id", "ts", 30).select("user_id", "n_sessions", "n_events")
    // bounded replay: single batch through flatMapGroupsWithState
    val typed = ev.as[StreamOps.Event]
    val got = StreamOps.sessionCounts(typed, 30).toDF()
    assert(got.exceptAll(batch).count() == 0 &&
      batch.exceptAll(got).count() == 0)
  }
}
