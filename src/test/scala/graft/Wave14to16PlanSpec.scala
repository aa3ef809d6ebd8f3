package graft

/** Physical-plan guards for the round-8 iterative-fit waves (VERDICT r08
  * item 6, mirroring Wave11PlanSpec): the IRLS/EM/Cox/HMM/power-iter
  * fits are built as a FIXED number of whole-data scan+aggregate rounds
  * folded into one lazy plan — each round's parameter row re-enters via
  * crossJoin(broadcast(1-row frame)) — so the plan must show exactly
  * the bounded round count's worth of source scans and NO driver-side
  * collect of a data-sized frame. A refactor that silently turned a
  * bounded-round fit into a collect-and-fit (or let the round count
  * grow with data) would keep the numbers right at test SF and fall
  * over at 100 TB; these pins make that a build failure. */
class Wave14to16PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def queryFn(name: String) = SparkEntry.queries(name)

  private def plan(name: String): String = {
    val df = queryFn(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  private def scans(p: String): Int =
    p.linesIterator.count(l => l.contains("Scan parquet") ||
      l.contains("FileScan parquet"))

  /** Data-sized rows entering the driver show up as CollectLimit only
    * for limit-collects; the fits must not have any (their only driver
    * value is the broadcast 1-row parameter frame). */
  private def hasCollect(p: String): Boolean = p.contains("CollectLimit")

  // expected source-scan counts: seed pass + one pass per Newton/EM
  // round (2 rounds everywhere), plus operator-specific extra passes
  // documented in each operator's scaladoc. An upper BOUND is pinned,
  // not equality — AQE/scan-reuse may legally reduce the count, while a
  // round-count regression (rounds growing or a per-round double-scan)
  // pushes it UP, which is what must fail loudly.
  private val fitScanBudget: Map[String, Int] = Map(
    // measured healthy shapes at r09 (scan-reuse/persist may keep some
    // below the naive seed+rounds arithmetic)
    "x_logistic_irls" -> 3, // seed count + 2 IRLS rounds
    "x_poisson_glm" -> 6,   // seed + 2 IRLS rounds + dispersion passes
    "x_cox_newton" -> 3,    // seed + 2 Newton rounds (spine persisted)
    "x_gmm_em" -> 3,        // moment seed + 2 EM rounds
    "x_garch_filter" -> 1,  // one pass: spine agg + sequential fold
    "x_power_iter" -> 1,    // one cov pass, iteration unrolled on 1 row
    "x_mahalanobis" -> 2,   // moment pass + distance pass
    "x_hmm_regimes" -> 2,   // spine pass + decode pass
    "x_hmm_posterior" -> 2, // spine pass + smooth pass
    "x_ransac" -> 10,       // hashed frame + 8 hypothesis + consensus
    "x_kde_grid" -> 2,      // stats pass + grid evaluation
    "x_loess_grid" -> 2,    // stats pass + grid evaluation
    "x_iforest" -> 2)       // tree-build pass + census walk

  test("iterative fits stay bounded-round: scan counts inside budget") {
    val over = fitScanBudget.toSeq.sortBy(_._1).flatMap { case (q, budget) =>
      val p = plan(q)
      val n = scans(p)
      info(f"$q%-18s scans=$n (budget $budget)")
      if (n > budget) Some(s"$q: $n scans > budget $budget") else None
    }
    assert(over.isEmpty, over.mkString("; "))
  }

  test("iterative fits never collect data-sized frames to the driver") {
    fitScanBudget.keys.toSeq.sorted.foreach { q =>
      val p = plan(q)
      assert(!hasCollect(p),
        s"$q plan contains CollectLimit (driver-side data collect):\n$p")
    }
  }

  test("constructing the fits runs ZERO Spark jobs (no hidden construction-time collects)") {
    // ADVICE r09: the CollectLimit grep above only sees the RETURNED
    // frame's plan — a refactor that calls .collect()/.head() while
    // BUILDING the query (to fit parameters on the driver) never
    // appears there. Every one of these fits is documented as one lazy
    // plan, so building it must launch no job at all; this instruments
    // that directly. Job-start events are delivered async, so the
    // counter gets a bounded settle wait before each assertion.
    // one job class is exempt: `spark.read.parquet` runs a one-task
    // "parquet at ..." schema-inference job per read (footer metadata,
    // O(files) bytes, no table data) — every Tables.load pays it. A
    // driver-side DATA action names its stage after the action
    // ("collect at", "head at", "count at", ...), so counting only
    // non-"parquet at" jobs keeps the guard aimed at the regression
    // class while tolerating unavoidable metadata I/O.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val names = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (!js.stageInfos.forall(_.name.startsWith("parquet at "))) {
          jobs.incrementAndGet()
          names.add(js.stageInfos.map(_.name).mkString("; "))
        }
        ()
      }
    }
    def settled(): Int = {
      var (prev, cur, spins) = (-1, jobs.get(), 0)
      while (prev != cur && spins < 40) {   // ≤2 s; stable after one gap
        prev = cur; Thread.sleep(50); cur = jobs.get(); spins += 1
      }
      cur
    }
    spark.sparkContext.addSparkListener(l)
    try {
      fitScanBudget.keys.toSeq.sorted.foreach { q =>
        val before = settled()
        queryFn(q)(spark, sf)               // construction ONLY — no action
        val after = settled()
        assert(after == before,
          s"$q launched ${after - before} Spark job(s) during CONSTRUCTION " +
            "— a driver-side fit collect the plan grep cannot see; stages: " +
            names.toArray.mkString(" | "))
      }
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("iterative fits broadcast the parameter row, never shuffle-join it") {
    // every round folds the 1-row parameter frame back via a broadcast
    // nested-loop/cross join; a SortMergeJoin in these plans would mean
    // the parameter row became a shuffle side — a plan regression
    Seq("x_logistic_irls", "x_poisson_glm", "x_gmm_em").foreach { q =>
      val p = plan(q)
      assert(!p.contains("SortMergeJoin"),
        s"$q must not shuffle-join the parameter frame:\n$p")
    }
  }
}
