package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.BoundedWindow

/** Pins for [[graft.operators.BoundedWindow]] (VERDICT r11 item 2): the
  * constant-partition spelling must be bit-identical to the bare global
  * window for every window-function class the engine uses over its
  * parameter-bounded frames, and the constant must SURVIVE optimization
  * (a Catalyst rule folding it back to an empty partition spec would
  * silently resurrect the WindowExec warning). */
class BoundedWindowSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1 to 500).map { i =>
    (i.toLong, (i * 37 % 97).toLong, (i * 61 % 89).toDouble)
  }.toDF("id", "k", "v").repartition(7)

  test("every window-function class matches the bare global window bit-for-bit") {
    val bare = Window.orderBy(col("k"), col("id"))
    val bounded = BoundedWindow.orderBy(col("k"), col("id"))
    val bareCum = bare.rowsBetween(Window.unboundedPreceding, 0)
    val boundedCum = bounded.rowsBetween(Window.unboundedPreceding, 0)
    def all(w: org.apache.spark.sql.expressions.WindowSpec,
            wc: org.apache.spark.sql.expressions.WindowSpec) =
      rows.select(col("id"),
          row_number().over(w).as("rn"),
          lead(col("v"), 1).over(w).as("ld"),
          lag(col("v"), 1).over(w).as("lg"),
          sum(col("k")).over(wc).as("cs"),
          min_by(col("v"), col("k")).over(wc).as("mb"))
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(all(bounded, boundedCum) == all(bare, bareCum),
      "BoundedWindow diverged from the bare global window")
    // SortOrder-wrapped cols (col.desc) must unwrap for the hash key —
    // hashing a SortOrder is unevaluable (caught live on x_bm25)
    val bareD = Window.orderBy(col("v").desc, col("id").asc)
    val boundedD = BoundedWindow.orderBy(col("v").desc, col("id").asc)
    def rn(w: org.apache.spark.sql.expressions.WindowSpec) =
      rows.select(col("id"), row_number().over(w).as("rn"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rn(boundedD) == rn(bareD),
      "BoundedWindow diverged on a desc ordering")
  }

  test("the always-zero partition key survives optimization: no empty-spec WindowExec") {
    val planned = rows
      .select(row_number().over(BoundedWindow.orderBy("k", "id")).as("rn"))
    val plan = planned.queryExecution.executedPlan.toString
    // a folded-away key plans Exchange SinglePartition under the Window
    // (exactly what lit(0) did — Spark 4's EliminateWindowPartitions
    // strips foldable window partitions); the surviving key plans a
    // hashpartitioning exchange instead
    assert(plan.contains("Window"), s"expected a Window node:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"partition key was optimized away — the 'No Partition Defined' " +
        s"warning is back:\n$plan")
    assert(plan.contains("hashpartitioning"),
      s"expected the always-zero hashpartitioning exchange:\n$plan")
    // and the result is still the single global ordering
    val rns = planned.collect().map(_.getInt(0)).sorted.toSeq
    assert(rns == (1 to 500), "global ordering broken")
  }
}
