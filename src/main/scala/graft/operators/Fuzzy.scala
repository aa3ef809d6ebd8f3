package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy key matching (SURVEY.md §2.10): edit-distance-1 pair detection
  * via deletion-neighborhood blocking — the record-linkage primitive
  * (misspelled ids, OCR'd keys, near-identical entity names).
  *
  * Blocking fact: two strings at Levenshtein distance ≤ 1 always share a
  * member of their deletion neighborhoods (the string itself plus every
  * single-character deletion): a substitution at i collides after both
  * delete i; an insertion/deletion collides with the shorter string
  * directly. So candidates come from ONE equi-join on the variant key —
  * |key|+1 variants per key, never an all-pairs comparison — then exact
  * `levenshtein` verifies (shared-variant is necessary, not sufficient:
  * deleting different positions from two distance-2 strings can
  * coincide). The FastSS scheme, standard for spell-check at scale.
  */
object Fuzzy {

  /** Distinct unordered pairs of `keyCol` values at Levenshtein
    * distance exactly 1 (equal keys are not pairs). Scale shape:
    * distinct keys → narrow variant explode (L+1 rows per key) → one
    * shuffle on the variant → bounded bucket self-join → codegen'd
    * levenshtein verify on candidates only. */
  def editDistance1Pairs(df: DataFrame, keyCol: String): DataFrame = {
    val keys = df.select(col(keyCol).as("k")).filter(col("k").isNotNull).distinct()
    // deletion neighborhood: the key itself (pos 0) + delete char i
    val variants = keys.select(col("k"), explode(concat(
      array(col("k")),
      transform(sequence(lit(1), length(col("k"))), i =>
        concat(col("k").substr(lit(1), i - 1),
          col("k").substr(i + 1, length(col("k")))))))
      .as("variant"))
    val a = variants.select(col("variant"), col("k").as("key_a"))
    val b = variants.select(col("variant"), col("k").as("key_b"))
    a.join(b, Seq("variant"))
      .filter(col("key_a") < col("key_b"))
      .select("key_a", "key_b").distinct()
      .filter(levenshtein(col("key_a"), col("key_b")) === 1)
  }
}
