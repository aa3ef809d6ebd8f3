package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

/** Global window over a PARAMETER-BOUNDED frame, spelled so the engine's
  * intent is visible in the plan (VERDICT r11 item 2).
  *
  * `Window.orderBy(...)` with no partition key is correct on the frames
  * the engine feeds it — per-`_pid` shuffle-partition totals (≤
  * `spark.sql.shuffle.partitions` rows), calendar spines, parameter-
  * bounded stat tables — but WindowExec cannot see that boundedness and
  * logs `No Partition Defined for Window operation` on every execution,
  * which drowned the bench tail in hundreds of false alarms and left
  * each site's safety argument living in a comment.
  *
  * Partitioning by an ALWAYS-ZERO key is semantically identical (every
  * row is in the one partition, ordered the same, so every window
  * function returns bit-identical results — [[graft.BoundedWindowSpec]]
  * pins that) while making the single partition an EXPLICIT choice
  * WindowExec doesn't warn about. The key is `pmod(hash(orderCols), 1)`
  * rather than `lit(0)` because a foldable key does not survive
  * optimization: Spark 4's `EliminateWindowPartitions` rule strips
  * foldable window partitions and the empty-spec warning comes straight
  * back (BoundedWindowSpec pins the survival, so a future optimizer
  * learning to fold `pmod(hash(x), 1)` fails the suite loudly instead
  * of silently re-drowning the bench tail). The exchange it plans is
  * hashpartitioning(always-zero) — the same all-rows-to-one-task
  * movement the empty spec planned, no better and no worse, which is
  * exactly why every caller must be parameter-bounded: this helper is
  * an annotation, not an optimization. A DATA-sized frame must never
  * ride it — use [[Rank.withCumSums]] / [[graft.plans.TopKPerKey]] for
  * distributed ranking instead (the StatsPlanSpec single-partition-
  * window guard enforces that for the rank-statistic family).
  */
object BoundedWindow {

  /** The partition key must be a plain value expression: `orderBy` cols
    * are often SortOrder-wrapped (`col("x").desc`), and hashing a
    * SortOrder is unevaluable — unwrap to its child first. */
  private def zeroKey(cols: Seq[Column]): Column =
    pmod(hash(cols.map(
      org.apache.spark.sql.graftbridge.ColumnBridge.stripSortOrder): _*),
      lit(1))

  def orderBy(cols: Column*): WindowSpec =
    Window.partitionBy(zeroKey(cols)).orderBy(cols: _*)

  def orderBy(colName: String, colNames: String*): WindowSpec =
    Window.partitionBy(zeroKey((colName +: colNames).map(col)))
      .orderBy(colName, colNames: _*)
}
