package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md / FIXTURES.md §B).
  *
  * Each table is a single parquet file under an sf directory; the parquet
  * footer carries the schema, so no StructType is needed here (contrast
  * [[Schemas]], which declares the insurance-domain schemas the reference
  * infers from CSV — /root/reference/scripts/bronze/load_bronze.py:35).
  *
  * `events.ts` has shipped in two physical layouts across driver testdata
  * generations: parquet TIMESTAMP(NANOS) (which Spark 4 rejects outright
  * with [PARQUET_TYPE_ILLEGAL] unless read as a nanosecond long via the
  * legacy conf) and plain TIMESTAMP(MICROS) (isAdjustedToUTC=false, loaded
  * as TIMESTAMP_NTZ). The loader adapts to whichever the footer declares
  * and normalizes both to a session-zone (UTC) microsecond TimestampType —
  * exactly the value DuckDB's µs-precision TIMESTAMP yields from the same
  * file, so oracles agree in either generation.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** NOTE: reading a NANOS-generation `events` file requires
    * `spark.sql.legacy.parquet.nanosAsLong=true` set at SESSION BUILD time
    * (Bench/Verify/tools/test builders all set it). The loader deliberately
    * does NOT mutate session conf — a loader with a global side effect is a
    * race at minimum and a surprise always. A session missing the conf
    * fails fast with Spark's own [PARQUET_TYPE_ILLEGAL] pointing at the
    * nanos column. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") normalizeEventTs(spark.read.parquet(s"$sfDir/events.parquet"))
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize an `events`-shaped frame's `ts` to a session-zone (UTC)
    * microsecond TimestampType, whatever physical generation produced it.
    * Also applied by the streaming specs to a FileStreamSource over the
    * same file, so batch and stream agree on the instant. */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // nanos-as-long generation: integer `div`, NOT `/` (double
        // division drops µs precision at ~1.7e18 ns magnitudes)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // micros generation: NTZ wall-clock reinterpreted in the session
        // zone (UTC everywhere in this repo) — same instant DuckDB reads
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
}
