package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Pmath

/** Deterministic sketch structures whose CONTENT (not just their
  * estimates) replays bit-exactly in a SQL oracle — the same md5-derived
  * portability trick the winnowing fingerprints established. The
  * engine's other sketches (Misra-Gries, HLL, KLL) carry engine-specific
  * bytes and grade rows-only; these two are built from portable
  * primitives end to end, so the differential gate covers the sketch
  * itself:
  *
  *  - [[kmvDistinct]]: the K-Minimum-Values distinct sketch (the
  *    bottom-k of a uniform hash). The k smallest md5 hex strings of the
  *    distinct values are a pure order statistic — any engine that can
  *    md5 and sort replays them exactly.
  *  - [[ddsketchBuckets]]: relative-error log-bucketed histogram
  *    (DDSketch-style). The bucket index floor(ln x / ln γ) runs on the
  *    portable ln with the γ constant emitted from ONE Scala value, so
  *    bucket boundaries agree across engines bit-for-bit.
  */
object Sketches {

  /** K-Minimum-Values distinct-count sketch per group (Bar-Yossef et
    * al. 2002): hash every distinct value, keep the k smallest hashes;
    * if fewer than k distinct values exist the sketch IS the exact
    * distinct set, otherwise the kth hash's position estimates the
    * distinct count as (k−1)/F(h_k) with F the hash's fraction of the
    * hash space.
    *
    * Mergeable by construction (bottom-k of a union = bottom-k of the
    * merged bottom-k sets — SketchesSpec proves it); the 100 TB shape
    * is one distinct + one per-group top-k (WindowGroupLimit pushes the
    * rank filter pre-shuffle, nothing concentrates more than k rows per
    * group past the scan).
    *
    * The estimate divides exact integers (the first 13 hex chars = 52
    * bits of the hash, the 2⁵² space constant) in a fixed order, so it
    * replays exactly. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int = 64): DataFrame = {
    require(k >= 2, s"kmvDistinct: k must be >= 2, got $k")
    val dv = df.select(col(groupCol).as("g"),
      col(valueCol).cast("string").as("v")).distinct()
    val h = dv.select(col("g"), md5(col("v")).as("h"))
    val rk = row_number().over(Window.partitionBy("g").orderBy("h"))
    val sketch = h.withColumn("rk", rk).where(col("rk") <= k)
      .groupBy("g")
      .agg(count(lit(1)).as("n_in_sketch"), max(col("h")).as("kth"))
    val hx = conv(substring(col("kth"), 1, 13), 16, 10).cast("long")
    sketch.select(col("g"), col("n_in_sketch"),
      when(col("n_in_sketch") < k, col("n_in_sketch").cast("double"))
        .otherwise(lit((k - 1).toDouble) /
          (hx.cast("double") / lit(4503599627370496.0)))
        .as("est_distinct"))
  }

  /** ln γ for [[ddsketchBuckets]], computed ONCE here and emitted into
    * both engines as the same literal (the Benford convention). */
  def lnGamma(gamma: Double): Double = math.log(gamma)

  /** DDSketch-style relative-error histogram (Masson et al., VLDB'19):
    * values bucket by floor(ln x / ln γ), so every bucket spans a
    * constant RELATIVE width — the quantile sketch monitoring systems
    * ship because a q99 read off the bucket boundaries is within γ−1
    * relative error at any scale, and bucket counts merge by addition.
    *
    * This form returns the full (bucket, n) table — the sketch content
    * itself, exact-oracle-able because ln is the portable series and
    * ln γ is a shared literal. Quantile reads are a cumulative scan over
    * ≤ a few hundred buckets (SketchesSpec derives q50/q95/q99 and
    * bounds them against the exact percentiles). Values below 1 (outside
    * the portable ln domain) are clamped into bucket 0 — fine for the
    * price/amount domains this targets. One narrow projection + one
    * bucket-keyed hash aggregate; merging shards is `GROUP BY bucket`
    * again. */
  def ddsketchBuckets(df: DataFrame, valueCol: Column,
                      gamma: Double = 1.02): DataFrame = {
    require(gamma > 1.0, s"ddsketchBuckets: gamma must be > 1, got $gamma")
    val lnx = Pmath.lnColumn(greatest(valueCol.cast("double"), lit(1.0)))
    val bucket = floor(lnx / lit(lnGamma(gamma))).cast("long")
    df.select(bucket.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
  }
}
