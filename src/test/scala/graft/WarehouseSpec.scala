package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Warehouse

/** Warehouse layout features: partition pruning and shuffle-free bucketed
  * joins — the write-time optimizations that matter at 100 TB. */
class WarehouseSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("partitioned sink prunes at the scan") {
    val dir = Files.createTempDirectory("graft_part").toString
    val events = Tables.load(spark, sf, "events")
    Warehouse.writePartitioned(events, dir, "event_type")
    val clicks = spark.read.parquet(dir).filter(col("event_type") === "click")
    assert(clicks.count() ==
      events.filter(col("event_type") === "click").count())
    // pruning: the predicate lands in the scan's PartitionFilters (the
    // relation's inputFiles listing is pre-pruning, so inspect the plan)
    val plan = clicks.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^\\]]*event_type.*"),
      s"no partition pruning in plan:\n$plan")
  }

  test("bucketed tables join with zero Exchange") {
    val dir = Files.createTempDirectory("graft_bucket").toString
    val orders = Tables.load(spark, sf, "orders")
    val lineitem = Tables.load(spark, sf, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Warehouse.writeBucketed(orders, "b_orders", s"$dir/orders", "o_orderkey", 4)
    Warehouse.writeBucketed(lineitem, "b_lineitem", s"$dir/lineitem", "o_orderkey", 4)
    // force the sort-merge path (tiny test data would broadcast, and
    // BroadcastExchange would muddy the no-shuffle assertion); AQE off so
    // the executed plan is inspectable pre-execution
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() == Tables.load(spark, sf, "lineitem").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }
}
