package graft

/** Physical-plan guards for the round-7 wave: the ordinal-statistic
  * spines (Cliff's δ, Jonckheere, Ansari–Bradley) must cum-sum through
  * the distributed [[graft.operators.Rank]] recipe — the only
  * permitted single-partition Exchange feeds the parameter-bounded
  * `_pid` offsets frame — and the per-key drift/series ops
  * (Page–Hinkley, Hurst) must window key-partitioned only. */
class Wave11PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    graft.queries.Ext8.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  private def singlePartitionWindow(plan: String): Boolean = {
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex.exists { case (l, i) =>
      l.contains("Exchange SinglePartition") &&
        lines.slice(math.max(0, i - 4), i).exists(_.contains("Window")) &&
        !lines.slice(i, math.min(lines.size, i + 3))
          .exists(_.contains("_pid"))
    }
  }

  test("rank-spine ordinal statistics avoid single-partition data-sized windows") {
    Seq("x_cliffs_delta", "x_jonckheere", "x_ansari_bradley").foreach { q =>
      val plan = planOf(q)
      assert(!singlePartitionWindow(plan),
        s"$q funnels a data-sized spine through one task:\n$plan")
    }
  }

  test("per-key series ops window key-partitioned, never globally") {
    Seq("x_page_hinkley", "x_hurst", "x_lmoments", "x_span_corruption")
      .foreach { q =>
        val plan = planOf(q)
        assert(!plan.contains("Exchange SinglePartition"),
          s"$q must keep every window partitioned by its key:\n$plan")
      }
  }
}
