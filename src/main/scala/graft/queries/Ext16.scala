package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-9 wave — the graded STREAMING surface (VERDICT r08 item 7):
  * the streaming operators in [[graft.streaming.StreamOps]] were
  * ScalaTest-covered but carried no driver-graded query; this wave runs
  * a real Structured Streaming pipeline inside a graded entry — file
  * source → watermark → stateful dedup → memory sink — and grades its
  * final state against a batch-SQL oracle. The stream replays the SAME
  * driver parquet as every batch query, so the oracle is an ordinary
  * DuckDB aggregate.
  */
object Ext16 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ingest-time exact dedup as an actual streaming job:
    // readStream(events) → withWatermark(1h) →
    // dropDuplicatesWithinWatermark(fingerprint) → append memory sink.
    // The kept-row SET is arrival-order-dependent in its non-key
    // columns, so the GRADED output is the order-INVARIANT census: rows
    // surviving dedup per event_type == distinct fingerprints per
    // event_type (fp = user|type), which DuckDB computes as a plain
    // COUNT(DISTINCT). The whole file arrives in one micro-batch
    // (watermark still at epoch), so no row can be late-dropped and the
    // census is deterministic. 100 TB shape: dedup state is bounded by
    // the 1 h watermark horizon, not stream length — the
    // dropDuplicatesWithinWatermark contract (StreamingSpec pins
    // eviction); the memory sink stands in for the production
    // parquet/Delta append sink.
    "x_stream_dedup" -> ((s, d) => {
      val path = s"$d/events.parquet"
      val schema = s.read.parquet(path).schema
      // the file source wants a DIRECTORY; the testdata table is a bare
      // file, so stream the parent dir with a glob filter on the table
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        // watermarks require TIMESTAMP (tz-aware); the testdata's ts is
        // TIMESTAMP_NTZ — cast under the pinned UTC session zone
        .withColumn("ts", col("ts").cast("timestamp"))
        .withColumn("fp", concat(col("user_id").cast("string"),
          lit("|"), col("event_type")))
      val deduped = graft.streaming.StreamOps.streamingDedup(
        src, "ts", "fp", "1 hour")
      val sink = "x_stream_dedup_mem"
      // a prior run's memory-sink view would collide; drop it first
      s.catalog.dropTempView(sink)
      val q = deduped.select(col("event_type"), col("fp"))
        .writeStream.outputMode("append")
        .format("memory").queryName(sink).start()
      try { q.processAllAvailable() } finally { q.stop() }
      s.table(sink).groupBy("event_type")
        .agg(count(lit(1)).as("n_kept"))
    }),
  )

  // ---------------------------------------------------------------- SQL

  val oracle: Map[String, String] = Map(

    // the streamed dedup's survivors per type ARE the distinct
    // (user, type) fingerprints per type — a batch aggregate
    "x_stream_dedup" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_kept
         FROM events GROUP BY event_type""",
  )
}
