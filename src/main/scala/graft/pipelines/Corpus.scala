package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.operators.{Dedup, Graphs}

/** The LLM-corpus cleaning pipeline (SURVEY.md §2.10) — the composition
  * every training-data run executes, assembled from the engine's own
  * operators so each stage keeps its audited scale shape:
  *
  *   1. quality gate    — [[Text.qualityScore]] ≥ threshold (narrow)
  *   2. exact dedup     — keep min doc id per identical text (1 shuffle)
  *   3. near-dup drop   — [[Dedup.ngramJaccard]] pairs →
  *                        [[Graphs.dedupClusters]] → keep each cluster's
  *                        representative, pass unclustered docs through
  *
  * Deterministic end to end (min-id representatives, exact Jaccard), so
  * the WHOLE pipeline carries a DuckDB oracle — the gate certifies the
  * composition, not just the stages.
  */
object Corpus {

  /** Surviving doc ids after quality gate + exact dedup + near-dup
    * cluster drop. */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            minQuality: Double = 0.5, n: Int = 3,
            jaccardThreshold: Double = 0.5): DataFrame = {
    val gated = docs
      .filter(Text.qualityScore(col(textCol)) >= minQuality)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val exactKept = gated.groupBy("text").agg(min(col("doc_id")).as("doc_id"))
    val pairs = Dedup.ngramJaccard(exactKept, "doc_id", "text",
      n = n, threshold = jaccardThreshold)
    val clusters = Graphs.dedupClusters(pairs, "doc_a", "doc_b")
    exactKept.join(clusters, Seq("doc_id"), "left")
      .filter(col("cluster_rep").isNull || col("cluster_rep") === col("doc_id"))
      .select("doc_id")
  }
}
