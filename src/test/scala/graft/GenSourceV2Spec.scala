package graft

import org.apache.spark.sql.functions._

/** DataSource V2 generator: determinism, partition independence,
  * column pruning, and source-side range pushdown. */
class GenSourceV2Spec extends SparkSpec {

  private def read(rows: Long, parts: Int) =
    spark.read.format("graft.sources.GenSourceV2")
      .option("rows", rows).option("seed", 7)
      .option("numPartitions", parts).load()

  test("rows are deterministic and independent of partition count") {
    val a = read(5000, 3).collect().map(_.toString).sorted
    val b = read(5000, 11).collect().map(_.toString).sorted
    assert(a.length == 5000 && a.sameElements(b))
  }

  test("column pruning reaches the source: un-projected fields never generate") {
    val df = read(1000, 2).select("event_id", "value")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("event_id") && scan.contains("value"))
    // the physical read schema must have dropped the string column
    assert(!df.queryExecution.executedPlan.toString.contains("event_type"),
      s"event_type survived pruning:\n$scan")
    assert(df.distinct().count() == 1000)
  }

  test("event_id range predicates push into the source and shrink the scan") {
    val df = read(100000, 8)
      .where(col("event_id") >= 90000L && col("event_id") < 90100L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual") || plan.contains("RuntimeFilters") ||
      plan.toLowerCase.contains("pushedfilters"),
      s"no pushdown evidence in plan:\n$plan")
    assert(df.count() == 100)
    // the generated values must match the unfiltered read bit-for-bit
    val full = read(100000, 8)
      .where(col("event_id") >= 90000L && col("event_id") < 90100L)
      .collect().map(_.toString).sorted
    val pushed = df.collect().map(_.toString).sorted
    assert(full.sameElements(pushed))
  }

  test("value field is exact cents in (0, 500]") {
    read(2000, 4).select("value").collect().foreach { r =>
      val v = r.getDouble(0)
      assert(v > 0.0 && v <= 500.0)
      // v was built as k/100.0: recovering k by rounding and re-dividing
      // must reproduce v bit-for-bit
      assert(math.rint(v * 100.0) / 100.0 == v,
        s"value $v is not an exact cent amount")
    }
  }
}
