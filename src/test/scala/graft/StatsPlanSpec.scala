package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sketches, Stats}

/** Physical-plan shape of the stats/sketch wave — the properties that
  * decide whether these operators survive a 100 TB input: pre-shuffle
  * group limits, map-side partial aggregation of fanouts, bucket-keyed
  * single shuffles, and windows that run over aggregated spines rather
  * than raw rows. */
class StatsPlanSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("kmvDistinct ranks through WindowGroupLimit (pre-shuffle top-k, no full sort survives)") {
    val df = (1 to 5000).map(v => (s"g${v % 3}", v)).toDF("g", "v")
    val plan = planOf(Sketches.kmvDistinct(df, "g", "v", k = 64))
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k must push a group limit below the window:\n$plan")
  }

  test("ddsketchBuckets is ONE hash aggregate over a narrow projection") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val plan = planOf(Sketches.ddsketchBuckets(orders, col("o_totalprice")))
    assert(plan.sliding("HashAggregate".length).count(_ == "HashAggregate")
      == 2, // partial + final = one logical aggregation, one shuffle
      s"expected exactly partial+final HashAggregate:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("SortAggregate"),
      s"no window/sort may appear in the bucket path:\n$plan")
  }

  test("bootstrapMeanCi folds the replicate fanout map-side (partial agg under the explode)") {
    val df = (1 to 500).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "id", "amt")
    val plan = planOf(Stats.bootstrapMeanCi(df, "g", col("id"), col("amt")))
    // the (g, b) aggregate must have a partial phase BELOW its exchange:
    // the generator's 32x row fanout never crosses the wire raw
    val lines = plan.linesIterator.toVector
    val genIdx = lines.indexWhere(_.contains("Generate explode"))
    val partialAbove = lines.take(genIdx).exists(l =>
      l.contains("HashAggregate") && l.contains("partial_"))
    assert(genIdx >= 0 && partialAbove,
      s"expected partial HashAggregate directly consuming the explode:\n$plan")
  }

  test("rocAuc windows over the distinct-score spine, not raw rows") {
    val df = (1 to 2000).map(i => ((i % 40).toDouble, i % 3 == 0)).toDF("s", "y")
    val plan = planOf(Stats.rocAuc(df, col("s"), col("y")))
    val lines = plan.linesIterator.toVector
    val wIdx = lines.indexWhere(_.contains("Window"))
    assert(wIdx >= 0, s"cumulative window missing:\n$plan")
    // below the window there must be an aggregate collapsing ties first
    assert(lines.drop(wIdx).exists(_.contains("HashAggregate")),
      s"the window must consume the per-score aggregate, not raw rows:\n$plan")
  }

  test("rank-statistic spines plan NO single-partition Exchange over a data-sized spine") {
    // the exact failure mode this guards: Window.orderBy with no
    // partition key plans Exchange SinglePartition feeding a Window —
    // one task ranks the whole spine. After Rank.withCumSums, the only
    // SinglePartition exchanges allowed are those feeding 1-row/
    // parameter-bounded aggregates (the offsets window runs over
    // <= shuffle-partition rows and is hash-partitioned on _pid).
    def singlePartitionWindow(plan: String): Boolean = {
      val lines = plan.linesIterator.toVector
      lines.zipWithIndex.exists { case (l, i) =>
        l.contains("Exchange SinglePartition") &&
          // a Window ABOVE this exchange consumes it if it appears
          // within the few operators between them (sort + window)
          lines.slice(math.max(0, i - 4), i).exists(_.contains("Window")) &&
          // except the parameter-bounded offsets window, which sits on
          // a HashAggregate of _pid (partition totals), never raw rows
          !lines.slice(i, math.min(lines.size, i + 3))
            .exists(_.contains("_pid"))
      }
    }
    val rows = (1 to 4000).map(i =>
      (i.toLong, (i * 37 % 997).toDouble, (i * 61 % 991).toDouble,
        i % 2 == 0, i % 3 == 0, s"g${i % 5}"))
      .toDF("id", "x", "y", "a", "b", "g")
    val plans = Seq(
      "spearman" -> planOf(Stats.spearmanRho(rows, col("x"), col("y"))),
      "mannwhitney" -> planOf(Stats.mannWhitneyU(rows, col("a"), col("b"), "x")),
      "kruskal" -> planOf(Stats.kruskalWallis(rows, "g", "x")),
      "ks" -> planOf(Stats.ksTwoSample(rows, "x", col("a"), col("b"))),
      "auc" -> planOf(Stats.rocAuc(rows, col("x"), col("a"))),
      "theilsen" -> planOf(Stats.theilSenSlope(rows, col("id"), col("x"), col("y"))),
      "quantilenorm" -> planOf(Stats.quantileNormalize(rows, "g", col("x"))),
      "conformal" -> planOf(Stats.conformalInterval(rows, col("id"), col("x"), col("y"))),
      "concentration" -> planOf(Stats.concentration(rows, col("g"), col("x"))),
      "wasserstein" -> planOf(Stats.wassersteinPairs(rows, "g", col("id"),
        Seq(("g0", "g1"), ("g1", "g2")))))
    plans.foreach { case (name, plan) =>
      assert(!singlePartitionWindow(plan),
        s"$name ranks a data-sized spine through ONE task:\n$plan")
    }
  }

  test("psiDrift / chi2Terms broadcast their 1-row totals (no shuffle join)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val chi2Plan = planOf(Stats.chi2Terms(docs, "doc_id", "text",
      col("lang") === "en", minDf = 2L, topK = 10))
    assert(chi2Plan.contains("BroadcastNestedLoopJoin")
      || chi2Plan.contains("BroadcastExchange"),
      s"totals must broadcast:\n$chi2Plan")
    assert(chi2Plan.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrderedAndProject, not a global sort:\n$chi2Plan")
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val psiPlan = planOf(Stats.psiDrift(orders,
      floor(col("o_totalprice") / lit(20000.0)).cast("long"),
      col("o_orderstatus") === "F", col("o_orderstatus") === "O"))
    assert(psiPlan.contains("BroadcastNestedLoopJoin")
      || psiPlan.contains("BroadcastExchange"),
      s"totals must broadcast:\n$psiPlan")
  }
}
