package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline ranking-quality metrics (NDCG@k, MRR / precision / recall
  * @k) — the evaluation half of the retrieval stack next to
  * [[Retrieval]]'s scoring half. A curation pipeline that ranks
  * training documents (by BM25, classifier margin, embedding
  * similarity…) needs these to measure whether the ranking puts the
  * right documents first; they are the standard IR readouts
  * (Järvelin & Kekäläinen 2002 for NDCG).
  *
  * Float discipline: position discounts 1/log₂(i+1) are precomputed on
  * the DRIVER into literal doubles (k of them, k bounded) — nothing
  * transcendental runs per row, and the SQL replay reads the identical
  * literals out of [[discountCaseSql]]. Per-query DCG folds in strict
  * rank order (the x_lm_score recipe), so partitioning never reorders
  * the float adds.
  *
  * Scale shape: both metrics are per-query top-k — a row_number window
  * partitioned by the query key, which Spark executes as a pre-shuffle
  * WindowGroupLimit (only k rows per query survive each map task). One
  * shuffle on the query key; the fold state is ≤ k structs. No global
  * window, no driver action.
  */
object Ranking {

  /** 1/log₂(i+1) for i = 1..k — THE constant table; both the Column
    * plan and the SQL replay are generated from it. */
  private[graft] def discounts(k: Int): Seq[Double] =
    (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))

  /** Lossless double literal for the SQL side (string-mediated: a bare
    * 17-digit literal would be DECIMAL and double-round). */
  private def d(x: Double): String = s"CAST('${x.toString}' AS DOUBLE)"

  /** `CASE <posCol> WHEN 1 THEN <disc₁> … ELSE 0.0 END` for the oracle. */
  def discountCaseSql(posCol: String, k: Int): String =
    s"CASE $posCol " + discounts(k).zipWithIndex.map { case (v, i) =>
      s"WHEN ${i + 1} THEN ${d(v)}"
    }.mkString(" ") + " ELSE 0.0 END"

  /** `CASE <posCol> WHEN 1 THEN 1.0 WHEN i THEN 1/i … ELSE 0.0 END` —
    * reciprocal-rank literals for the oracle side. */
  def reciprocalCaseSql(posCol: String, k: Int): String =
    s"CASE $posCol " + (1 to k).map { i =>
      s"WHEN $i THEN ${d(1.0 / i)}"
    }.mkString(" ") + " ELSE 0.0 END"

  private def discountCol(pos: Column, k: Int): Column =
    discounts(k).zipWithIndex.foldLeft(when(lit(false), lit(0.0))) {
      case (w, (v, i)) => w.when(pos === (i + 1), lit(v))
    }.otherwise(lit(0.0))

  private def reciprocalCol(pos: Column, k: Int): Column =
    (1 to k).foldLeft(when(lit(false), lit(0.0))) {
      case (w, i) => w.when(pos === i, lit(1.0 / i))
    }.otherwise(lit(0.0))

  /** Strict rank-ordered left fold of `term` over rows grouped to one
    * output row — Σ taken in ascending `ord` order regardless of
    * partitioning. `term` must be NULL for rows that don't participate
    * (collect_list drops them), so the fold state stays ≤ k structs. */
  private def orderedSum(ord: Column, term: Column): Column =
    aggregate(
      transform(sort_array(collect_list(
        when(term.isNotNull, struct(ord.as("o"), term.as("t"))))),
        x => x.getField("t")),
      lit(0.0), (a, x) => a + x)

  /** NDCG@k per query over a candidate frame of
    * (query, doc, score, gain): rank candidates by (score DESC, doc ASC
    * — a total order), take the top k, and compare the discounted gain
    * sum against the ideal ordering (gain DESC) of the SAME candidate
    * set. Graded gains supported (gain is any non-negative numeric);
    * binary relevance is gain ∈ {0,1}.
    *
    * Output: (query, n_cand, n_gain, dcg, idcg, ndcg) — ndcg NULL when
    * the query has no gainful candidate (idcg = 0). */
  def ndcgAtK(cands: DataFrame, queryCol: String, docCol: String,
              scoreCol: String, gainCol: String, k: Int): DataFrame = {
    val byScore = Window.partitionBy(queryCol)
      .orderBy(col(scoreCol).desc, col(docCol).asc)
    val byGain = Window.partitionBy(queryCol)
      .orderBy(col(gainCol).desc, col(scoreCol).desc, col(docCol).asc)
    cands
      .withColumn("rn", row_number().over(byScore))
      .withColumn("rn_ideal", row_number().over(byGain))
      .groupBy(col(queryCol).as("query"))
      .agg(count(lit(1)).as("n_cand"),
        sum(when(col(gainCol) > 0, 1L).otherwise(0L)).as("n_gain"),
        orderedSum(col("rn"),
          when(col("rn") <= k,
            col(gainCol).cast("double") * discountCol(col("rn"), k)))
          .as("dcg"),
        orderedSum(col("rn_ideal"),
          when(col("rn_ideal") <= k,
            col(gainCol).cast("double") * discountCol(col("rn_ideal"), k)))
          .as("idcg"))
      .withColumn("ndcg", col("dcg") / nullif(col("idcg"), lit(0.0)))
  }

  /** MRR / precision@k / recall@k per query over the same candidate
    * frame with BINARY relevance `relCol`: rank by (score DESC, doc
    * ASC), find the first relevant position within k, count relevant
    * hits in the top k against the query's total relevant set.
    *
    * Output: (query, n_rel, first_pos, rr, p_at_k, r_at_k) — first_pos
    * NULL (rr = 0) when no relevant candidate makes the top k; r_at_k
    * NULL when the query has no relevant candidate at all. */
  def mrrAtK(cands: DataFrame, queryCol: String, docCol: String,
             scoreCol: String, relCol: String, k: Int): DataFrame = {
    val byScore = Window.partitionBy(queryCol)
      .orderBy(col(scoreCol).desc, col(docCol).asc)
    cands
      .withColumn("rn", row_number().over(byScore))
      .groupBy(col(queryCol).as("query"))
      .agg(sum(when(col(relCol), 1L).otherwise(0L)).as("n_rel"),
        min(when(col(relCol) && col("rn") <= k, col("rn"))).as("first_pos"),
        sum(when(col(relCol) && col("rn") <= k, 1L).otherwise(0L)).as("hits"))
      .select(col("query"), col("n_rel"), col("first_pos"),
        coalesce(reciprocalCol(col("first_pos"), k), lit(0.0)).as("rr"),
        (col("hits").cast("double") / lit(k.toDouble)).as("p_at_k"),
        (col("hits").cast("double") /
          nullif(col("n_rel"), lit(0L)).cast("double")).as("r_at_k"))
  }

  /** Classifier confusion matrix with per-cell row/column fractions:
    * each (actual, predicted) cell carries its count, its share of the
    * actual class (the diagonal cell's row_frac IS that class's
    * recall) and its share of the predicted class (diagonal col_frac =
    * precision). One hash aggregate to the label-pair cells, then two
    * windows over the cell frame — bounded by the label-domain square,
    * never by rows. Fractions are single divisions of exact counts. */
  def confusionMatrix(df: DataFrame, actualCol: Column,
                      predCol: Column): DataFrame = {
    val cells = df.groupBy(actualCol.as("actual"), predCol.as("pred"))
      .agg(count(lit(1)).as("n"))
    cells
      .withColumn("n_actual",
        sum(col("n")).over(Window.partitionBy("actual")))
      .withColumn("n_pred",
        sum(col("n")).over(Window.partitionBy("pred")))
      .select(col("actual"), col("pred"), col("n"),
        (col("n").cast("double") / col("n_actual").cast("double"))
          .as("row_frac"),
        (col("n").cast("double") / col("n_pred").cast("double"))
          .as("col_frac"))
  }
}
