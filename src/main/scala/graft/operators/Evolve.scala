package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dimension/table maintenance operators (SURVEY.md §2.10): SCD Type 1
  * upsert (MERGE INTO semantics without a table format) and snapshot diff
  * (CDC between two loads). The reference rebuilds its dimensions from
  * scratch every run; an engine its users switch to needs the incremental
  * forms.
  *
  * Scale shape: both are single full-outer shuffles on the key — the
  * minimum any merge semantics permits. On a real deployment the current
  * side is a bucketed table ([[graft.sources.Warehouse]]), making the
  * shuffle one-sided (updates are typically ≪ current).
  */
object Evolve {

  /** SCD Type 1 upsert: rows present in `updates` REPLACE current rows
    * wholesale (null update values overwrite too — MERGE semantics, which
    * a naive per-column coalesce gets wrong); unmatched update rows
    * insert; unmatched current rows persist. Schemas must match. */
  def upsertScd1(current: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = current.columns.filter(_ != key).toSeq
    val u = updates.select(
      (col(key) +: cols.map(c => col(c).as(s"_u_$c"))) :+ lit(true).as("_present"): _*)
    current.join(u, Seq(key), "full_outer")
      .select(col(key) +: cols.map(c =>
        when(col("_present"), col(s"_u_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** Snapshot diff (CDC): classify every key as added / removed / changed
    * between two loads of the same schema; unchanged rows drop out.
    * Comparison is null-safe per column (struct equality over <=>). */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: String): DataFrame = {
    val cols = before.columns.filter(_ != key).toSeq
    val b = before.select(col(key),
      struct(cols.map(col): _*).as("_b"), lit(true).as("_in_b"))
    val a = after.select(col(key),
      struct(cols.map(col): _*).as("_a"), lit(true).as("_in_a"))
    b.join(a, Seq(key), "full_outer")
      .withColumn("change_type",
        when(col("_in_b").isNull, "added")
          .when(col("_in_a").isNull, "removed")
          .when(!(col("_b") <=> col("_a")), "changed"))
      .filter(col("change_type").isNotNull)
      .select(col(key), col("change_type"))
  }
}
