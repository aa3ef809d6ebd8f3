package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Warehouse-layout sinks for the 100 TB design point (SURVEY.md §4):
  * hive-style partitioned parquet (partition pruning at the scan) and
  * bucketed tables (co-located joins/aggregations with NO shuffle on the
  * bucket key). The reference writes flat single-object parquet
  * (load_bronze.py:55-62) — at cluster scale, layout IS the optimization.
  */
object Warehouse {

  /** Partitioned parquet: directory per partition value; scans with a
    * partition predicate read only matching directories. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Bucketed + sorted table: rows hash-bucketed by the (join/agg) key.
    * Two tables bucketed the same way join with zero Exchange — the
    * shuffle happens once at WRITE time, then every downstream join/agg
    * on that key is narrow. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
