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

  /** Σ aᵢ·bᵢ, double accumulation, left-to-right — a native codegen
    * Expression ([[graft.plans.ArrayDot]]); ~10× the interpreted
    * zip_with+aggregate fold it replaced, bit-identical results.
    * (Spark 4 Columns are ColumnNode-backed; ExpressionUtils is the
    * classic-mode bridge both ways.) */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.ArrayDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

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

  /** Deterministic pseudo-random hyperplane components in [-1, 1),
    * generated DRIVER-SIDE (splitmix64) and shipped as array literals —
    * deriving them per-row inside the plan re-hashed bits×dim values for
    * every vector scored. */
  private def splitmix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def planeMatrix(bits: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(bits, dim) { (j, i) =>
      (splitmix64(seed * 1000003L + j.toLong * 65537L + i).toDouble /
        Long.MaxValue.toDouble).max(-1.0).min(1.0)
    }

  /** k-bit random-hyperplane signature as an int (bucket key for LSH):
    * bit j = sign of v · plane_j, planes as broadcast-able literals,
    * projections via the codegen [[graft.plans.ArrayDot]]. */
  def rhpSignature(v: Column, bits: Int, dim: Int, seed: Long): Column = {
    val planes = planeMatrix(bits, dim, seed)
    (0 until bits).map { j =>
      when(dot(v, typedlit(planes(j))) >= 0, 1 << j).otherwise(0)
    }.reduce(_ + _)
  }

  /** Vector dimensionality from the data: one bounded single-row action
    * (like the IVF centroid sample — parameter-sized, never O(data)).
    * Null vectors are skipped (their size is NULL and would NPE the
    * driver-side read); empty/all-null input returns 1 (any dim works
    * when no vector ever reaches the guard). */
  def deriveDim(df: org.apache.spark.sql.DataFrame, vecCol: String): Int =
    df.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol)).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(1)

  /** Symmetric int8 quantization scale: max|xᵢ|/127 (0 for a zero/empty
    * vector — the dequantize side maps everything back to 0). */
  def int8Scale(v: Column): Column =
    coalesce(array_max(transform(asDouble(v), x => abs(x))), lit(0.0)) / 127.0

  private def quantizeWithScale(v: Column, s: Column): Column =
    when(s === 0.0, transform(asDouble(v), _ => lit(0).cast("int")))
      .otherwise(transform(asDouble(v), x =>
        floor(x / s + lit(0.5)).cast("int")))

  /** Quantize a float vector to int8 codes: qᵢ = ⌊xᵢ/scale + 0.5⌋,
    * i.e. round-half-toward-+∞ expressed as an explicit floor — `round`
    * half-way semantics differ subtly across engines, floor does not, so
    * the codes replay bit-exactly in portable SQL. The max|x| element
    * maps to exactly ±127 (⌊127.5⌋ on the positive side, ⌊-126.5⌋ = -127
    * on the negative); a zero vector quantizes to all zeros. The 4×
    * shrink is the standard embedding-storage/bandwidth trade at corpus
    * scale; reconstruction error is bounded by scale/2 per element.
    * The scale is let-bound ([[Pmath.bind]]) so the array_max reduction
    * behind it runs once per row, not once per use site. */
  def quantizeInt8(v: Column): Column =
    Pmath.bind(int8Scale(v))(s => quantizeWithScale(v, s))

  /** Max absolute reconstruction error of [[quantizeInt8]]:
    * max|qᵢ·scale − xᵢ| — the quality metric a pipeline logs next to the
    * quantized table (bounded by scale/2). */
  def int8MaxError(v: Column): Column =
    Pmath.bind(int8Scale(v)) { s =>
      coalesce(array_max(zip_with(quantizeWithScale(v, s), asDouble(v),
        (q, x) => abs(q.cast("double") * s - x))), lit(0.0))
    }

  /** Fail-fast dimension guard: passes `v` through unchanged when its
    * length equals `dim`, raises otherwise. Without this a mismatched
    * vector makes every plane projection null → every row lands in one
    * LSH bucket and the bucket self-join silently degenerates to the
    * O(n²) cross join the blocking exists to avoid. NULL vectors pass
    * through as null (they hash to bucket 0 and are dropped by the
    * zero-norm cosine verify, as before this guard existed) — only a
    * present-but-mis-sized vector is a hard error. */
  def requireDim(v: Column, dim: Int, op: String): Column =
    when(v.isNull, v)
      .otherwise(when(assert_true(size(v) === dim,
        concat(lit(s"$op: vector length "), size(v).cast("string"),
          lit(s" != expected dim $dim"))).isNull, v))
}
