package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Scratch micro-profiler for operator stages (not part of the graded
  * surface; used to attribute bench time before optimizing). */
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
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.write.format("noop").mode("overwrite").save()

    val w = split(col("text"), " ")
    val rawShingles = transform(sequence(lit(1), size(w) - 2),
      i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))
    for (round <- 1 to 2) {
      time(s"r$round explode split") {
        docs.select(explode(split(col("text"), " ")).as("s")).count()
      }
      time(s"r$round explode transform-nodistinct-noguard") {
        docs.select(explode(rawShingles).as("s")).count()
      }
      time(s"r$round explode with distinct") {
        docs.select(explode(array_distinct(rawShingles)).as("s")).count()
      }
      time(s"r$round explode full wordShingles") {
        docs.select(explode(Text.wordShingles(col("text"), 3)).as("s")).count()
      }
      time(s"r$round explode cached arr") {
        val c = docs.select(col("doc_id"), Text.wordShingles(col("text"), 3).as("arr")).cache()
        c.count()
        val n = c.select(explode(col("arr")).as("s")).count()
        c.unpersist()
        n
      }
    }
    val sh = docs.select(col("doc_id").as("doc"),
      explode(Text.wordShingles(col("text"), 3)).as("sh"))
    time("sizes agg") { sh.groupBy("doc").count().count() }
    val postings = sh.groupBy("sh")
      .agg(collect_list(col("doc")).as("ds"))
      .filter(size(col("ds")) <= 1000 && size(col("ds")) >= 2)
    time("postings agg") { postings.count() }
    // streamed pair emit (the production shape in Dedup.ngramJaccard):
    // chained generators, never an O(b²) in-row array
    val pairs = postings
      .select(col("ds"), posexplode(col("ds")))
      .select(col("col").as("x"),
        explode(slice(col("ds"), col("pos") + lit(2), size(col("ds")))).as("y"))
    time("pair expansion (streamed)") { pairs.count() }
    time("pair groupBy") {
      pairs.select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
        .groupBy("a", "b").count().count()
    }
    time("full query") {
      graft.SparkEntry.queries("x_dedup_ngram_jaccard")(spark, sfDir).count()
    }
    spark.stop()
  }
}
