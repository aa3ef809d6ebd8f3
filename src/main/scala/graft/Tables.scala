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
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects outright
  * ([PARQUET_TYPE_ILLEGAL]); we read it as a nanosecond long (legacy conf)
  * and floor-convert to a microsecond timestamp — exactly what DuckDB's
  * µs-precision TIMESTAMP does with the same file, so oracles agree.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** NOTE: reading `events` requires `spark.sql.legacy.parquet.nanosAsLong
    * =true` set at SESSION BUILD time (Bench/Verify/tools/test builders all
    * set it). The loader deliberately does NOT mutate session conf — a
    * loader with a global side effect is a race at minimum and a surprise
    * always. A session missing the conf fails fast with Spark's own
    * [PARQUET_TYPE_ILLEGAL] pointing at the nanos column. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      spark.read.parquet(s"$sfDir/events.parquet")
        // integer `div`, NOT `/` (double division drops µs precision at
        // ~1.7e18 ns magnitudes)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
