package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata tables (TESTDATA.md / FIXTURES.md §B).
  *
  * Each table is a single parquet file under an sf directory; the parquet
  * footer carries the schema, so no StructType is needed here (contrast
  * [[Schemas]], which declares the insurance-domain schemas the reference
  * infers from CSV — /root/reference/scripts/bronze/load_bronze.py:35).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
