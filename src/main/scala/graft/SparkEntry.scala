package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the graded surface: one entry per implemented operator from
  * SURVEY.md §2 (reference parity, [[graft.queries.Parity]]) plus the
  * LLM-data-pipeline extension surface §2.10 ([[graft.queries.Ext]]).
  * `oracleSql` carries the DuckDB-equivalent SQL for the driver's
  * differential correctness gate; queries without an entry get the weaker
  * rows-only check (non-SQL-expressible ops: seeded MinHash/SimHash, LSH).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full gold fact pipeline: 2 hash aggregates + FK join + 3-way left
    * join onto the distinct customer spine with guarded ratio columns. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_fact_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Parity.queries ++ graft.queries.Ext.queries ++
      graft.queries.Ext2.queries ++ graft.queries.Ext3.queries ++
      graft.queries.Ext4.queries ++ graft.queries.Ext5.queries ++
      graft.queries.Ext6.queries ++ graft.queries.Ext7.queries ++
      graft.queries.Ext8.queries ++ graft.queries.Ext9.queries ++
      graft.queries.Ext10.queries ++ graft.queries.Ext11.queries ++
      graft.queries.Ext12.queries ++ graft.queries.Ext13.queries ++
      graft.queries.Ext14.queries ++
      graft.queries.Ext15.queries ++ graft.queries.Ext16.queries

  def oracleSql: Map[String, String] =
    graft.queries.Parity.oracle ++ graft.queries.Ext.oracle ++
      graft.queries.Ext2.oracle ++ graft.queries.Ext3.oracle ++
      graft.queries.Ext4.oracle ++ graft.queries.Ext5.oracle ++
      graft.queries.Ext6.oracle ++ graft.queries.Ext7.oracle ++
      graft.queries.Ext8.oracle ++ graft.queries.Ext9.oracle ++
      graft.queries.Ext10.oracle ++ graft.queries.Ext11.oracle ++
      graft.queries.Ext12.oracle ++ graft.queries.Ext13.oracle ++
      graft.queries.Ext14.oracle ++
      graft.queries.Ext15.oracle ++ graft.queries.Ext16.oracle
}
