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
    * distinct keys → narrow variant explode (L+1 rows per key) → ONE
    * shuffle grouping keys per variant → pairs streamed out of each
    * posting list (chained generators, same shape as
    * [[Dedup.ngramJaccard]]) → codegen'd levenshtein verify on
    * candidates only.
    *
    * `maxBucket` is the hot-variant frequency cap: a variant shared by b
    * keys emits O(b²) candidates, and near-identical key populations —
    * precisely the record-linkage use case — produce exactly such hot
    * variants (every "Item#00011…" key collides after one digit
    * deletion). A variant in > maxBucket keys is dropped, bounding any
    * bucket's pair fanout at maxBucket²; coverage semantics: a pair is
    * missed only if EVERY shared variant is hotter than the cap, which
    * at the default 1000 means both keys sit in a ≥1000-key near-clone
    * neighborhood — raise the cap (or pre-partition the key space) if
    * that population is genuinely of interest. */
  def editDistance1Pairs(df: DataFrame, keyCol: String,
                         maxBucket: Int = 1000): DataFrame = {
    val keys = df.select(col(keyCol).as("k")).filter(col("k").isNotNull).distinct()
    // deletion neighborhood: the key itself (pos 0) + delete char i
    val variants = keys.select(col("k"), explode(concat(
      array(col("k")),
      transform(sequence(lit(1), length(col("k"))), i =>
        concat(col("k").substr(lit(1), i - 1),
          col("k").substr(i + 1, length(col("k")))))))
      .as("variant"))
    // posting list per variant (capped); pairs stream via posexplode +
    // slice/explode — the largest materialized value is one ≤maxBucket
    // posting list, never a bucket's O(b²) pair set
    val postings = variants.groupBy("variant")
      .agg(collect_list(col("k")).as("ks"))
      .filter(size(col("ks")) >= 2 && size(col("ks")) <= maxBucket)
    postings
      .select(col("ks"), posexplode(col("ks")))
      .select(col("col").as("x"),
        explode(slice(col("ks"), col("pos") + lit(2), size(col("ks")))).as("y"))
      .select(least(col("x"), col("y")).as("key_a"),
        greatest(col("x"), col("y")).as("key_b"))
      .distinct()
      .filter(levenshtein(col("key_a"), col("key_b")) === 1)
  }
}
