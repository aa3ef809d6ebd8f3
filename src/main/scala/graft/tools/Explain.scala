package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspection CLI: prints the formatted physical plan of named
  * SparkEntry queries (all parity queries by default) so shuffle count,
  * broadcast choices, PushedFilters and WholeStageCodegen spans can be
  * audited. Usage: runMain graft.tools.Explain [sfDir] [query...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_fact_summary", "j2_fk_join", "e1_titlecase", "x_cos_topk",
        "x_winnow_fingerprint", "x_corr_stats", "x_funnel", "x_pack_chunks",
        "x_bloom_join", "x_reservoir", "x_sorted_neighborhood",
        "x_attribution", "x_ppjoin", "x_weighted_median")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
