package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Rank

/** Regression pin for the round-10 sf0.1 finding: Rank's range-
  * partitioned spine MUST be materialized before `_pid` fans out to its
  * two consumers. Un-pinned, each consumer planned its own range
  * exchange (column pruning defeats ReuseExchange) whose
  * RangePartitioner sampled with its own rdd.id seed — boundaries could
  * disagree between the window rows and the offset table, and
  * x_conformal's k-th order statistic landed thousands of ranks off at
  * sf0.1 (nondeterministically per run: 48491.66, then 48306.81, vs the
  * true 46848.71). The pin: the distributed rank must equal the
  * single-partition window on a spine big enough for several range
  * partitions, repeatedly, INCLUDING duplicate order keys.
  *
  * The original failure needed a specific evaluation environment to
  * fire (it passed 5/5 in-suite while failing under `runMain
  * graft.Verify` at local[4]), so this spec is a contract pin, not a
  * guaranteed reproducer; the structural fix (Rank.pinned) is what
  * closes the race, and RankPinSpec asserts the persist is present.
  */
class RankPinSpec extends SparkSpec {

  test("distributed row_number == single-partition window (duplicate keys, 3 trials)") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      import spark.implicits._
      // 60k rows, many duplicate r values (r = id % 977), dup tiebreaks
      val spine = spark.range(0L, 60000L, 1L, 8)
        .select((col("id") % 977L).cast("double").as("r"),
          (col("id") % 9973L).cast("string").as("id"))
      val single = spine.withColumn("rk",
          row_number().over(Window.orderBy(col("r"), col("id"))))
        .groupBy("rk").agg(min("r").as("rs"))
      for (trial <- 1 to 3) {
        val dist = Rank.withRowNumber(spine, Seq("r", "id"), "rk")
          .groupBy("rk").agg(min(col("r")).as("rd"))
        val diff = dist.join(single, Seq("rk"))
          .filter(col("rd") =!= col("rs")).count()
        assert(diff == 0L, s"trial $trial: $diff rank positions disagree")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("fused withCumSumsLead1 == withCumSums then withLead1, bit for bit") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      // distinct-value spine with two sum sources, enough rows for
      // several range partitions
      val spine = spark.range(0L, 5000L, 1L, 8)
        .select((col("id") * 3L).as("v"), (col("id") % 7L).as("ca"),
          (col("id") % 5L).as("cb"))
      val chained = Rank.withLead1(
        Rank.withCumSums(spine, Seq("v"),
          Seq("ca" -> "cuma", "cb" -> "cumb")), "v", "v", "v_next")
      val fused = Rank.withCumSumsLead1(spine, "v",
        Seq("ca" -> "cuma", "cb" -> "cumb"), "v", "v_next")
      assert(fused.columns.toSeq == chained.columns.toSeq,
        s"column sets diverge: ${fused.columns.toSeq} vs ${chained.columns.toSeq}")
      assert(fused.exceptAll(chained).isEmpty && chained.exceptAll(fused).isEmpty,
        "fused cum+lead pass disagrees with the chained operators")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("distributed rank is AQE-invariant (Bench runs AQE on, Verify runs it off)") {
    // the two driver mains run the SAME queries under different
    // adaptive-execution settings; AQE may coalesce the range exchange's
    // partitions, which changes _pid values — correctness relies on the
    // concatenation invariant (adjacent range partitions stay ordered
    // under coalescing), so pin that both modes produce identical ranks
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = spark.conf.getOption(aqeKey)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "6")
    try {
      val spine = spark.range(0L, 30000L, 1L, 8)
        .select((col("id") % 613L).cast("double").as("r"),
          (col("id") % 7919L).cast("string").as("id"))
      // COLLECT inside the conf scope: AQE is consulted at execution
      // time, so a lazily-returned frame would run under whatever the
      // conf says later, not what it said at construction
      def ranksWith(aqe: Boolean): Map[Long, Double] = {
        spark.conf.set(aqeKey, aqe.toString)
        Rank.withRowNumber(spine, Seq("r", "id"), "rk")
          .groupBy("rk").agg(min("r").as("rv"))
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      }
      val off = ranksWith(aqe = false)
      val on = ranksWith(aqe = true)
      assert(on.size == off.size, "AQE on/off row counts differ")
      assert(on == off, "AQE on/off disagree on rank positions")
    } finally {
      prevAqe.fold(spark.conf.unset(aqeKey))(spark.conf.set(aqeKey, _))
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }

  test("Rank pins one materialization of the range spine (InMemoryRelation in plan)") {
    import spark.implicits._
    val spine = Seq((1.0, "a"), (2.0, "b"), (3.0, "c")).toDF("r", "id")
    for (df <- Seq(
      Rank.withRowNumber(spine, Seq("r", "id"), "rk"),
      Rank.withCumMax(spine, Seq("r"), "r", "mx"),
      Rank.withCumSumsLead1(spine.withColumn("one", lit(1L)), "r",
        Seq("one" -> "cum"), "r", "nxt"),
      Rank.withLead1(spine.select(col("r")).distinct(), "r", "r", "nxt"))) {
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("InMemoryRelation"),
        s"range spine not persisted — the _pid fan-out race is open:\n$plan")
      df.sparkSession.sharedState.cacheManager // touch to keep lint quiet
    }
    graft.plans.CheckpointBlocks.releaseAll(spark)
  }
}
