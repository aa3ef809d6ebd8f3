package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column library (SURVEY.md §2.10): dot product, norms,
  * cosine similarity over `array<float>` columns.
  *
  * Everything is computed in DOUBLE with a strict left-to-right fold
  * (zip_with + aggregate), which matches DuckDB's list_dot_product over a
  * double-cast list element-for-element — IEEE ops on identical inputs in
  * identical order are bit-identical, so cosine scores are exact-oracle-
  * able with no tolerance.
  *
  * Scale note: these are per-row expressions (no shuffle). For 100 TB ANN
  * the plan shape matters more than the kernel — see
  * [[graft.operators.Similarity]] for the bucketed LSH variant that avoids
  * the full cross join.
  */
object Vectors {

  private def asDouble(v: Column): Column =
    transform(v, x => x.cast("double"))

  /** Σ aᵢ·bᵢ, double accumulation, left-to-right. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a,b), null-guarded against zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = l2Norm(a) * l2Norm(b)
    when(d =!= 0.0, dot(a, b) / d)
  }

  /** Squared L2 distance (for IVF-style assignment). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Sign bit of a deterministic pseudo-random hyperplane projection —
    * the random-hyperplane LSH bit. Plane j's component for dimension i is
    * derived from xxhash64(i, j, seed) mapped to [-1, 1). */
  def rhpBit(v: Column, plane: Int, seed: Long): Column = {
    val proj = aggregate(
      zip_with(asDouble(v),
        transform(sequence(lit(0), size(v) - 1),
          i => pmod(xxhash64(i, lit(plane), lit(seed)), lit(2000000L)).cast("double") / 1000000.0 - 1.0),
        (x, h) => x * h),
      lit(0.0), (acc, x) => acc + x)
    when(proj >= 0, 1).otherwise(0)
  }

  /** k-bit random-hyperplane signature as an int (bucket key for LSH). */
  def rhpSignature(v: Column, bits: Int, seed: Long): Column =
    (0 until bits).map(j => rhpBit(v, j, seed) * (1 << j)).reduce(_ + _)
}
