package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) extraction — "the offers no other offer
  * beats on both price and quality": rows (x, y) where no other row has
  * x' ≥ x ∧ y' ≤ y with at least one strict.
  *
  * Distributed shape is the two-phase local/global scheme (Börzsönyi et
  * al., "The Skyline Operator", ICDE'01): every partition reduces to its
  * LOCAL skyline first — correctness is order-free because dominance is
  * transitive and any point dominated locally is dominated globally —
  * then the union of local skylines (tiny: frontiers are O(√n)-ish on
  * real data, never the table) collapses in one task. The per-partition
  * sweep is genuinely imperative (sort + running min), which is the
  * mapPartitions escape hatch's intended use; everything stays typed
  * primitives (no Row boxing in the hot loop).
  *
  * Duplicate rows of a frontier point are all kept (equal points don't
  * dominate each other) — exactly the NOT EXISTS oracle's semantics. */
object Skyline {

  /** Sweep a partition: sort by (x desc, y asc) and keep each x-group's
    * min-y rows while y strictly undercuts the best y of all larger x.
    * O(p log p) local, emits only the partition's frontier. */
  private def sweep(it: Iterator[(Double, Double)]): Iterator[(Double, Double)] = {
    val pts = it.toArray
    if (pts.isEmpty) Iterator.empty
    else {
      java.util.Arrays.sort(pts, Ordering.by[(Double, Double), (Double, Double)] {
        case (x, y) => (-x, y)
      })
      val out = ArrayBuffer.empty[(Double, Double)]
      var bestY = Double.PositiveInfinity // min y among strictly larger x
      var i = 0
      while (i < pts.length) {
        val x = pts(i)._1
        val minY = pts(i)._2 // group sorted y-asc: first is the min
        if (minY < bestY) {
          // all duplicates of (x, minY) are frontier points
          var j = i
          while (j < pts.length && pts(j)._1 == x && pts(j)._2 == minY) {
            out += pts(j); j += 1
          }
        }
        // advance past the whole x group; its min-y tightens the bound
        while (i < pts.length && pts(i)._1 == x) i += 1
        if (minY < bestY) bestY = minY
      }
      out.iterator
    }
  }

  /** 2-D skyline: maximize `xCol`, minimize `yCol`. Null measures are
    * excluded (dominance is undefined on null). Output columns `x`, `y`. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val enc = Encoders.product[(Double, Double)]
    val pts = df
      .select(col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      .as(enc)
    // phase 1: per-partition frontier (parallel, output tiny);
    // phase 2: one task folds the surviving points. coalesce (not
    // repartition) so phase 2 adds NO shuffle — local frontiers flow in.
    pts.mapPartitions(sweep)(enc)
      .coalesce(1)
      .mapPartitions(sweep)(enc)
      .toDF("x", "y")
  }
}
