package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract, BASELINE.md): runs every SparkEntry
  * query against SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is forced through the `noop` sink, not `.count()` — count()
  * lets Catalyst prune every computed column (an expression-heavy query
  * would "benchmark" a bare scan); noop executes the full plan and
  * discards rows at the sink, which is the honest cost.
  * A small untimed warm-up absorbs one-time session/codegen init so
  * per-query numbers measure the plan, not JVM warm-up.
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runNoop(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }

    // optional args = subset of query names (focused measurement)
    val names = if (args.nonEmpty) args.toSeq.filter(SparkEntry.queries.contains)
      else SparkEntry.queries.keys.toSeq.sorted

    // untimed warm-up: session init, codegen, parquet footer caches
    names.headOption.foreach(runNoop)

    val results = names.map(n => n -> runNoop(n))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
