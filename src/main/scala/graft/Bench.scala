package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract, BASELINE.md): runs every SparkEntry
  * query against SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is forced through the `noop` sink, not `.count()` — count()
  * lets Catalyst prune every computed column (an expression-heavy query
  * would "benchmark" a bare scan); noop executes the full plan and
  * discards rows at the sink, which is the honest cost.
  * EACH query runs once untimed (codegen compile, footer caches), then
  * TWICE timed, reporting the MIN — single timed runs in this container
  * swing 2× on GC/scheduling noise, which drowned round-over-round
  * per-query deltas; min-of-2 is the standard noise floor.
  * A query that throws is OMITTED from the queries map (a sentinel like
  * -1 would corrupt naive sums) and reported in the "failed" list, with
  * "n_failed" flagging that the total excludes those queries.
  * AFTER every run the session's block-manager state is reset
  * (CheckpointBlocks.releaseAll): iterative queries leave checkpointed
  * results pinned until driver GC, and in a shared JVM those surviving
  * blocks contaminated later measurements by 2–40× (BENCH_r03/r04
  * showed alphabetically-adjacent queries inheriting the previous
  * query's storage pressure). Isolation per run makes each number the
  * query's own cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runNoop(name: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        Left(s"${e.getClass.getSimpleName}")
      } finally {
        // reset storage between measurements — leaked checkpoint/persist
        // blocks from one run must not tax the next (see scaladoc)
        graft.plans.CheckpointBlocks.releaseAll(spark)
      }
    }

    // optional args = subset of query names (focused measurement)
    val names = if (args.nonEmpty) args.toSeq.filter(SparkEntry.queries.contains)
      else SparkEntry.queries.keys.toSeq.sorted

    val results = names.map { n =>
      runNoop(n) match {                 // warm-up: codegen, footer caches
        case Right(_) =>                 // min of two timed runs
          n -> (for (a <- runNoop(n); b <- runNoop(n)) yield math.min(a, b))
        case left     => n -> left       // failed warm-up: don't re-run
      }
    }
    val qs = results.collect { case (k, Right(v)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, Left(err)) => s"\"$k: $err\"" }
      .mkString("[", ",", "]")
    val nFailed = results.count(_._2.isLeft)
    val total = results.map(_._2.getOrElse(0.0)).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_failed":$nFailed,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
