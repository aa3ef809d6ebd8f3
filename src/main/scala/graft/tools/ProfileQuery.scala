package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic per-query micro-profiler (round 13): run named graded
  * queries repeatedly under optional SQL-conf overrides and print each
  * timing — the diagnostic harness behind the codegen-blow-up recipe
  * in the verify skill notes (a fixed cost that survives warm-up but
  * vanishes under `spark.sql.codegen.wholeStage=false` is a whole-stage
  * compile blow-up, not data cost). Not part of the graded surface.
  *
  * Usage: runMain graft.tools.ProfileQuery [key=value ...] name [name ...]
  * (args containing '=' are session conf overrides, the rest are
  * SparkEntry.queries keys; each query runs 3×, storage reset between
  * runs exactly like Bench).
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (confs, names) = args.partition(_.contains("="))
    confs.foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
      println(s"[profile] conf $k = $v")
    }
    val (flags, qNames) = names.partition(_ == "explain")
    qNames.filter(graft.SparkEntry.queries.contains).foreach { n =>
      if (flags.nonEmpty) {
        // plan mode: print the formatted physical plan instead of timing
        println(s"[profile] ==== $n plan ====")
        println(graft.SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        graft.plans.CheckpointBlocks.releaseAll(spark)
      } else (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[profile] $n%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        graft.plans.CheckpointBlocks.releaseAll(spark)
      }
    }
    spark.stop()
  }
}
