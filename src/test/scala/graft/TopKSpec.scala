package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopKPerKey

/** Custom TopKPerKey plan ≡ window row_number idiom, without the sort. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val scored = spark.range(20000).select(
    ($"id" % 100).as("key"),
    (xxhash64($"id") % 1000).cast("double").as("score"),
    $"id".as("row_id"))

  test("TopKPerKey matches window row_number exactly (incl. rank)") {
    val w = Window.partitionBy("key").orderBy($"score".desc, $"row_id".asc)
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
    val viaCustom = TopKPerKey(scored, Seq("key"),
      Seq("score" -> false, "row_id" -> true), 5)
    assert(viaCustom.columns.toSeq == viaWindow.columns.toSeq)
    assert(viaCustom.exceptAll(viaWindow).count() == 0 &&
      viaWindow.exceptAll(viaCustom).count() == 0)
  }

  test("TopKPerKey plans without a Sort operator") {
    val viaCustom = TopKPerKey(scored, Seq("key"),
      Seq("score" -> false, "row_id" -> true), 5)
    val plan = viaCustom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Sort "), s"unexpected sort:\n$plan")
  }

  test("keys with fewer than k rows emit all rows, ranked") {
    val tiny = Seq((1L, 10.0, 1L), (1L, 5.0, 2L), (2L, 7.0, 3L))
      .toDF("key", "score", "row_id")
    val got = TopKPerKey(tiny, Seq("key"), Seq("score" -> false), 5)
      .orderBy("key", "rank").collect()
    assert(got.map(r => (r.getLong(0), r.getDouble(1), r.getInt(3))).toSeq ==
      Seq((1L, 10.0, 1), (1L, 5.0, 2), (2L, 7.0, 1)))
  }
}
