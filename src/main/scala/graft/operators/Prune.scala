package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.plans.{BloomSketchAgg, MightContainBloom}

/** Scan-side pruning operators: cut the expensive side of a join BEFORE
  * its shuffle, using compact summaries of the cheap side. */
object Prune {

  /** Normalize a key column to the sketch's two supported key types:
    * strings stay strings (probed as UTF-8 bytes), everything integral
    * goes through long. */
  private def asKey(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case org.apache.spark.sql.types.StringType => c
      case _ => c.cast("long")
    }

  /** Column form of the bloom membership probe. `key` must be the same
    * type (string vs integral) the sketch was built over. */
  def mightContain(key: Column, bloomBytes: Array[Byte]): Column =
    ColumnBridge.column(MightContainBloom(
      ColumnBridge.expression(key), bloomBytes))

  /** Build a bloom filter over `keys`' single column (integral → long
    * probes, string → UTF-8-byte probes), distributed, collected to the
    * driver as serialized bytes. One pass, mergeable — the classic
    * "publish the key sketch of this job for the next job to prune with"
    * primitive. `expectedItems <= 0` triggers a sizing count() first
    * (acceptable on the DIM side by contract). */
  def buildBloom(keys: DataFrame, keyCol: String,
                 fpp: Double = 0.01, expectedItems: Long = -1L): Array[Byte] = {
    val dt = keys.schema(keyCol).dataType
    val k = keys.select(asKey(col(keyCol), dt).as("k"))
      .where(col("k").isNotNull)
    val n = if (expectedItems > 0) expectedItems else math.max(k.count(), 1L)
    val agg = ColumnBridge.column(
      BloomSketchAgg(ColumnBridge.expression(col("k")), n, fpp)
        .toAggregateExpression())
    k.agg(agg.as("bloom")).head().getAs[Array[Byte]](0)
  }

  /** Semi-join `big` against `small`'s key set with a bloom pre-filter:
    *
    *   1. sketch `small`'s keys (one aggregate; bytes to driver — the
    *      sketch is MBs even when the key set is GBs);
    *   2. scan-filter `big` with the codegen'd membership probe — the
    *      false-positive-free rows never reach a shuffle;
    *   3. residual LeftSemi join removes the ~fpp false positives.
    *
    * At 100 TB this is the difference between shuffling the whole fact
    * table and shuffling `selectivity + fpp` of it; the residual join's
    * build side is the same small key set, so AQE typically broadcasts
    * it. Setting `exact = false` skips step 3 for fpp-tolerant consumers
    * (candidate generation, pre-aggregation pruning). */
  def bloomSemiJoin(big: DataFrame, bigKey: String,
                    small: DataFrame, smallKey: String,
                    fpp: Double = 0.01, exact: Boolean = true): DataFrame = {
    val bytes = buildBloom(small, smallKey, fpp)
    val pruned = big.where(mightContain(
      asKey(col(bigKey), big.schema(bigKey).dataType), bytes))
    if (!exact) pruned
    else pruned.join(
      small.select(col(smallKey).as("__bloom_k")).distinct(),
      col(bigKey) === col("__bloom_k"), "leftsemi")
  }
}
