package graft

import org.apache.spark.sql.functions._

import graft.queries.Ext7

/** Physical-plan guards for the round-6 session-3 waves: the spine
  * queries must rank through the distributed recipe (no
  * single-partition Exchange feeding a Window over data-sized input),
  * and the parameter-bounded fit frames (Shapley coalitions, FS
  * patterns, BT pairs) must join via broadcast, never shuffle. */
class Wave10PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    Ext7.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** A Window consuming an Exchange SinglePartition whose input is NOT
    * the parameter-bounded `_pid` offsets frame — the one shape that
    * cannot survive 100×. */
  private def singlePartitionWindow(plan: String): Boolean = {
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex.exists { case (l, i) =>
      l.contains("Exchange SinglePartition") &&
        lines.slice(math.max(0, i - 4), i).exists(_.contains("Window")) &&
        !lines.slice(i, math.min(lines.size, i + 3))
          .exists(_.contains("_pid"))
    }
  }

  test("wasserstein / pr_curve / qq_plot / bradley_terry spines avoid single-partition data-sized windows") {
    Seq("x_wasserstein", "x_pr_curve", "x_qq_plot", "x_bradley_terry")
      .foreach { q =>
        val plan = planOf(q)
        assert(!singlePartitionWindow(plan),
          s"$q funnels a data-sized spine through one task:\n$plan")
      }
  }

  test("shapley / fellegi_sunter / coec join their bounded fit frames via broadcast") {
    Seq("x_shapley", "x_fellegi_sunter", "x_coec_debias").foreach { q =>
      val plan = planOf(q)
      assert(plan.contains("BroadcastExchange") ||
        plan.contains("BroadcastNestedLoopJoin"),
        s"$q must broadcast its parameter-bounded frame:\n$plan")
    }
  }

  test("kendall_tau's pair work is the bounded grid self-join, not a row-level join") {
    // the row-scale work must be hash aggregates; the only join input
    // is the (x, y) grid (two aggregates below any join)
    val plan = planOf("x_kendall_tau")
    val lines = plan.linesIterator.toVector
    val firstJoin = lines.indexWhere(l => l.contains("Join"))
    assert(firstJoin >= 0)
    assert(lines.drop(firstJoin).exists(_.contains("HashAggregate")),
      s"join must consume aggregated grids, not raw lineitem rows:\n$plan")
  }
}
