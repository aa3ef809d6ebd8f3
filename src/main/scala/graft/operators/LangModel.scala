package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Pmath, Text}

/** Statistical language-model scoring (SURVEY.md §2.10 extension
  * surface): the CCNet-style quality filter — score each document by the
  * average log-probability of its bigrams under an MLE bigram model of
  * the corpus itself (add-one smoothed). Low-probability documents are
  * gibberish / boilerplate / wrong-language candidates; the score is the
  * standard perplexity knob of corpus curation, here end-to-end inside
  * the engine.
  *
  * Scale shape: positional bigram explode (narrow) → two hash aggregates
  * for the model counts (shuffles keyed on bigram / context word) → one
  * broadcast of the single-row vocab size → per-doc aggregation. The
  * model "training" and the scoring are the same two scans; nothing is
  * ever collected to the driver.
  *
  * Float discipline: ln comes from [[Pmath.lnColumn]] (portable IEEE
  * series — replayable by the SQL oracle bit-for-bit), and the per-doc
  * sum folds a POSITION-SORTED array strictly left-to-right (the
  * x_vector_features recipe) — a plain sum() over shuffled doubles would
  * be partition-order-dependent. */
object LangModel {

  /** (doc_id, n_bigrams, avg_lnp) for every document with ≥ 2 tokens.
    * avg_lnp = mean over positions of ln P(w₂|w₁), with
    * P = (C(w₁w₂)+1)/(C(w₁·)+V). Always ≤ 0; closer to 0 = more
    * predictable text. ln P is computed as −ln(1/P): 1/P ≥ 1 keeps the
    * portable series in its reduction domain. */
  def bigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = df.select(col(idCol).as("doc"),
      Text.explodePositionalShingles(col(textCol), 2).as(Seq("pos", "b")))
      .withColumn("w1", substring_index(col("b"), " ", 1))
    val cb = bg.groupBy("b").agg(count(lit(1)).as("cbg"))
    val cw = bg.groupBy("w1").agg(count(lit(1)).as("ctx"))
    val vocab = df.select(explode(Text.tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t")).as("vsz"))
    val scored = bg.join(cb, Seq("b")).join(cw, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("lnp", -Pmath.lnColumn(
        (col("ctx") + col("vsz")).cast("double") / (col("cbg") + lit(1))))
    scored.groupBy("doc")
      .agg(sort_array(collect_list(struct(col("pos"), col("lnp")))).as("ps"))
      .select(col("doc").as("doc_id"),
        size(col("ps")).cast("long").as("n_bigrams"),
        (aggregate(transform(col("ps"), p => p.getField("lnp")),
          lit(0.0), (a, x) => a + x) / size(col("ps"))).as("avg_lnp"))
  }
}
