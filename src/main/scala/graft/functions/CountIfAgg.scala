package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's single custom aggregate — the pandas lambda
  * `('status', lambda x: (x == 'Activa').sum())` at
  * /root/reference/scripts/gold/load_gold.py:108 — as a Spark-native typed
  * `Aggregator` (SURVEY.md §2.9). Semantically identical to
  * [[Exact.countIf]]'s `count(when(cond, 1))` form (which stays the
  * default: pure built-ins codegen better than any UDAF); this exists to
  * exercise the engine's custom-aggregate surface, verified against the
  * built-in form by the a2_countif_udaf oracle. */
object CountIfAgg extends Aggregator[Boolean, Long, Long] {
  override def zero: Long = 0L
  override def reduce(acc: Long, cond: Boolean): Long =
    acc + (if (cond) 1L else 0L)
  override def merge(a: Long, b: Long): Long = a + b
  override def finish(acc: Long): Long = acc
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
