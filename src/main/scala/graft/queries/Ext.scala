package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Extension surface (SURVEY.md §2.10) — LLM-data-pipeline operators over
  * documents/embeddings/events. Filled in incrementally; split from
  * [[Parity]] so the reference-parity surface stays self-contained. */
object Ext {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracle: Map[String, String] = Map()
}
