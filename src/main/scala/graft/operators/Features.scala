package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Pmath

/** Categorical feature engineering for model training: target encoding
  * and weight-of-evidence — the two standard "turn a high-cardinality
  * category into a number the model can use" recipes (CatBoost-style
  * smoothed statistics; credit-scoring WOE/IV). Both follow the house
  * float discipline: integers until a single final division (or the
  * portable-ln chain), so every output is exact-oracle-able.
  */
object Features {

  /** Leave-one-out target encoding with additive smoothing toward the
    * global prior (Micci-Barreca 2001):
    * te_i = (S_c − y_i + m·p) / (n_c − 1 + m), with S_c/n_c the
    * category's label sum/count, p the global positive rate and `m`
    * the pseudo-count weight. Leave-one-out removes the row's own
    * label from its feature (the train-time leakage guard); smoothing
    * shrinks rare categories toward the prior.
    *
    * Exactness: S_c, n_c, y are integers; p is one division of two
    * integer casts; the numerator/denominator are short identical IEEE
    * chains on both engines and te is one final division.
    *
    * Scale shape: one hash aggregate to the category statistics frame
    * (≤ |categories| rows), one 1-row global aggregate broadcast, one
    * equi-join of the statistics back onto the rows (AQE broadcasts
    * the small side when |categories| is bounded; the plain shuffle
    * join it falls back to is still the scale-correct shape). No
    * windows, no per-row state. */
  def targetEncodeLoo(df: DataFrame, catCol: String, idCol: Column,
                      labelCol: Column, m: Double): DataFrame = {
    require(m > 0, s"targetEncodeLoo: smoothing m must be positive, got $m")
    val base = df.select(col(catCol).as("cat"), idCol.as("id"),
      when(labelCol, 1L).otherwise(0L).as("y"))
    val per = base.groupBy("cat")
      .agg(sum(col("y")).as("sy"), count(lit(1)).as("nc"))
    val glob = base.agg(sum(col("y")).as("gy"), count(lit(1)).as("gn"))
    base.join(per, Seq("cat")).crossJoin(broadcast(glob))
      .select(col("id"), col("cat"), col("y"),
        (((col("sy") - col("y")).cast("double") +
          lit(m) * (col("gy").cast("double") / col("gn").cast("double"))) /
          ((col("nc") - lit(1L)).cast("double") + lit(m))).as("te"))
  }

  /** Weight of evidence and information-value terms per category
    * (the credit-scoring / feature-screening staple): with half-count
    * (Laplace ½) smoothing,
    * woe_c = ln[(pos_c+½)/(pos_t+½) ÷ (neg_c+½)/(neg_t+½)], reported
    * with the category's IV term
    * iv_c = (pos_c/pos_t − neg_c/neg_t)·woe_c (total IV = Σ iv_c).
    *
    * Float discipline: the ln runs over INTEGER arguments — woe_c =
    * ln[(2·pos_c+1)(2·neg_t+1)] − ln[(2·neg_c+1)(2·pos_t+1)] (the ½s
    * cleared by doubling; both products are ≥ 1 integers inside
    * [[Pmath.lnColumn]]'s [1, 2⁴⁰) domain for totals up to ~5·10⁵ —
    * beyond that, pre-aggregate or bucket the category frame) — so
    * both engines replay the identical portable-ln chain, and the
    * share difference is two integer divisions and a subtract.
    *
    * Scale shape: one hash aggregate to (category, pos, neg), one
    * 1-row total broadcast, map-side arithmetic — the result frame is
    * |categories|-sized. */
  def woeIv(df: DataFrame, catCol: String, labelCol: Column): DataFrame = {
    val base = df.select(col(catCol).as("cat"),
      when(labelCol, 1L).otherwise(0L).as("y"))
    val per = base.groupBy("cat")
      .agg(sum(col("y")).as("pos"), (count(lit(1)) - sum(col("y"))).as("neg"))
    val tot = base.agg(sum(col("y")).as("pt"),
      (count(lit(1)) - sum(col("y"))).as("nt"))
    per.crossJoin(broadcast(tot))
      .select(col("cat"), col("pos"), col("neg"), col("pt"), col("nt"),
        (Pmath.lnColumn(((lit(2L) * col("pos") + 1L) *
            (lit(2L) * col("nt") + 1L)).cast("double")) -
          Pmath.lnColumn(((lit(2L) * col("neg") + 1L) *
            (lit(2L) * col("pt") + 1L)).cast("double"))).as("woe"))
      .withColumn("iv_term",
        (col("pos").cast("double") / col("pt").cast("double") -
          col("neg").cast("double") / col("nt").cast("double")) * col("woe"))
      .drop("pt", "nt")
  }
}
