package graft

import org.apache.spark.sql.functions._
import graft.operators.{Features, LangModel, Privacy, Sampling, Spatial}

/** Physical-plan shape of the round-6 waves — the properties that make
  * each operator survive a 100 TB input: no cartesian products behind
  * blocked joins, literal-bounded group limits, single map-side-partial
  * aggregates, broadcast-sized model/statistics frames. */
class Wave7PlanSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("gridRadiusJoin plans a cell-keyed equi-join, never a cartesian product") {
    val pts = (1L to 500L).map(i => (i, i % 97, i % 89)).toDF("id", "x", "y")
    val plan = planOf(Spatial.gridRadiusJoin(pts, "id", "x", "y", 10L))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"radius join must block on cells, not cross-join:\n$plan")
    assert(plan.contains("Join"), s"expected an equi-join on the cell key:\n$plan")
  }

  test("classBalance plans WindowGroupLimit (literal bound -> pre-shuffle top-k)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = planOf(Sampling.classBalance(docs, "lang", "doc_id"))
    assert(plan.contains("WindowGroupLimit"),
      s"the literal min-count bound must push a group limit below the window:\n$plan")
  }

  test("kAnonymityAudit is ONE hash aggregate (partial+final), no window, no join") {
    val cust = Tables.load(spark, "/root/testdata/sf0.001", "customer")
    val plan = planOf(Privacy.kAnonymityAudit(cust,
      Seq("c_nationkey", "c_mktsegment"), col("c_acctbal"), 5L, 3L))
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"the audit is a single keyed aggregation:\n$plan")
  }

  test("vocabCoverage cuts the vocab with TakeOrderedAndProject and broadcasts it") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = planOf(LangModel.vocabCoverage(docs, "doc_id", "text", 100))
    assert(plan.contains("TakeOrderedAndProject"),
      s"the top-N vocab cut must be a bounded heap, not a global sort:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the N-row vocab must broadcast to the token probe:\n$plan")
  }

  test("targetEncodeLoo broadcasts the 1-row prior; no window anywhere") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val plan = planOf(Features.targetEncodeLoo(orders, "o_orderpriority",
      col("o_orderkey"), col("o_orderstatus") === "F", 20.0))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"the global prior must arrive by broadcast:\n$plan")
    assert(!plan.contains("Window"),
      s"per-row encoding must come from the stats join, not a window:\n$plan")
  }
}
