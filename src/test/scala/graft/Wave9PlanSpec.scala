package graft

import org.apache.spark.sql.functions._
import graft.operators.{Keywords, Ranking, Sketches, Stats}
import graft.functions.Text

/** Physical-plan shape of the round-6 eval wave: every rank/median
  * window consumes a HASH-partitioned exchange (the only
  * SinglePartition exchanges are parameter-bounded scalar reduces),
  * and the Count-Min probe join broadcasts the tiny cell frame. */
class Wave9PlanSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Every Window node's input exchange (the first Exchange printed
    * below it) must be hashpartitioning — a Window fed by
    * SinglePartition would serialize data-sized rows through one task. */
  private def windowsKeyPartitioned(plan: String, what: String): Unit = {
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex.filter(_._1.contains("Window [")).foreach {
      case (_, i) =>
        lines.drop(i + 1).find(_.contains("Exchange")).foreach { ex =>
          assert(!ex.contains("SinglePartition"),
            s"$what: window fed by a single-partition exchange:\n$plan")
        }
    }
  }

  private lazy val docs =
    Tables.load(spark, "/root/testdata/sf0.001", "documents")

  private def irCands = docs
    .select(col("doc_id"), col("lang"),
      explode(Text.tokens(col("text"))).as("term"))
    .filter(col("term").isin("join", "merge"))
    .groupBy("term", "doc_id")
    .agg(count(lit(1)).as("tf"),
      max(when(col("lang") === "en", 1L).otherwise(0L)).as("gain"))

  test("ndcg/mrr rank windows are query-partitioned") {
    for ((name, df) <- Seq(
      "ndcgAtK" -> Ranking.ndcgAtK(irCands, "term", "doc_id", "tf",
        "gain", 10),
      "mrrAtK" -> Ranking.mrrAtK(
        irCands.withColumn("rel", col("gain") === 1L),
        "term", "doc_id", "tf", "rel", 10))) {
      val plan = planOf(df)
      windowsKeyPartitioned(plan, name)
      assert(plan.contains("windowspecdefinition(term"),
        s"$name window must partition by the query key:\n$plan")
    }
  }

  test("countMin probe joins the cell frame as the broadcast side") {
    val plan = planOf(Sketches.countMinEstimates(
      docs.select(explode(Text.tokens(col("text"))).as("t")),
      col("t"), depth = 4, width = 256, topK = 20))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      s"probe x cells must broadcast, never shuffle the corpus:\n$plan")
  }

  test("rake and brown-forsythe windows stay key-partitioned") {
    windowsKeyPartitioned(planOf(Keywords.rakeKeywords(docs, "doc_id",
      "text", Seq("a", "the"), 3, 20)), "rakeKeywords")
    windowsKeyPartitioned(planOf(Stats.brownForsythe(
      Tables.load(spark, "/root/testdata/sf0.001", "lineitem"),
      "l_returnflag", col("l_quantity"))), "brownForsythe")
  }

  test("naive bayes needs no window at all") {
    val plan = planOf(graft.operators.LangModel.naiveBayesMargin(
      docs, "doc_id", "text", col("lang") === "en",
      pmod(col("doc_id"), lit(10)) < 8))
    assert(!plan.contains("Window ["),
      s"NB is aggregates + joins only:\n$plan")
  }
}
