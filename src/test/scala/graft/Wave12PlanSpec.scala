package graft

/** Physical-plan guards for the round-7/8 Ext9 wave, mirroring
  * [[Wave11PlanSpec]]: the association/agreement statistics must keep
  * their pair geometry on the BOUNDED cell grid (a nested-loop join
  * over O(cells²) is the design; a CartesianProduct over row-scale
  * frames is the failure), the keyness top-k must be a
  * TakeOrderedAndProject (never a global Sort of the full term frame),
  * and every data-scale reduction must carry a map-side partial
  * aggregate so the shuffle moves group cells, not rows. */
class Wave12PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    graft.queries.Ext9.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  test("Ext9 statistics never materialize a row-scale cartesian product") {
    Seq("x_ordinal_assoc", "x_gtest_terms", "x_fleiss_kappa", "x_icc")
      .foreach { q =>
        val plan = planOf(q)
        assert(!plan.contains("CartesianProduct"),
          s"$q pairs row-scale frames instead of bounded cells:\n$plan")
      }
  }

  test("ordinal pair census joins the bounded bin grid, not the rows") {
    // the concordant/discordant census must sit ABOVE a HashAggregate
    // (the 20×20 bin grid) — i.e. the non-equi pair join's inputs are
    // aggregates, so its cost is O(cells²) regardless of row count
    val plan = planOf("x_ordinal_assoc")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected the bounded-grid pair join:\n$plan")
    val aggBeforeJoin = plan.linesIterator.toVector
    val joinIdx = aggBeforeJoin.indexWhere(_.contains("BroadcastNestedLoopJoin"))
    assert(aggBeforeJoin.drop(joinIdx).exists(_.contains("HashAggregate")),
      s"pair join must consume aggregated bin cells, not raw rows:\n$plan")
  }

  test("keyness top-20 is TakeOrderedAndProject, never a full global sort") {
    val plan = planOf("x_gtest_terms")
    assert(plan.contains("TakeOrderedAndProject"),
      s"x_gtest_terms must top-k with a bounded heap per partition:\n$plan")
  }

  test("data-scale reductions carry map-side partial aggregation") {
    Seq("x_fleiss_kappa", "x_icc", "x_ordinal_assoc").foreach { q =>
      val plan = planOf(q)
      assert(plan.contains("partial"),
        s"$q must combine map-side before shuffling:\n$plan")
    }
  }

  test("round-8 breadth ops keep bounded-top-k, product-free plans") {
    // kCenterSelect: the selection rounds run eagerly (bounded driver
    // collects) during plan construction; the RETURNED census plan
    // must be a hash aggregate over broadcast-literal scoring — no
    // cartesian product, no global sort (k rows only)
    val kc = planOf("x_kcenter_select")
    assert(!kc.contains("CartesianProduct"),
      s"x_kcenter_select census must not pair frames:\n$kc")
    assert(kc.contains("HashAggregate"),
      s"x_kcenter_select census must reduce via hash aggregate:\n$kc")
    // wordpieceUsage: distinct-word hash agg → mapPartitions walk →
    // hash agg → TakeOrderedAndProject(topK); never a full global sort
    val wp = planOf("x_wordpiece_segment")
    assert(!wp.contains("CartesianProduct"),
      s"x_wordpiece_segment must not pair frames:\n$wp")
    assert(wp.contains("TakeOrderedAndProject"),
      s"x_wordpiece_segment top-k must be a bounded heap:\n$wp")
  }
}
