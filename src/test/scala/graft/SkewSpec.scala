package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salting must never change results — only placement. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // power-law left side: one key owns 90% of rows
  private lazy val left = spark.range(10000)
    .select(when($"id" % 10 < 9, lit(1L)).otherwise($"id").as("k"),
      ($"id" % 100).cast("double").as("v"))
  private lazy val right = spark.range(50)
    .select($"id".as("k"), concat(lit("dim_"), $"id").as("name"))

  test("saltedJoin == plain join (inner)") {
    val plain = left.join(right, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(left, right, "k", 8).select("k", "v", "name")
    assert(salted.exceptAll(plain).count() == 0 &&
      plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin == plain join (left outer keeps unmatched rows)") {
    val plain = left.join(right, Seq("k"), "left").select("k", "v", "name")
    val salted = Skew.saltedJoin(left, right, "k", 8, "left").select("k", "v", "name")
    assert(salted.exceptAll(plain).count() == 0 &&
      plain.exceptAll(salted).count() == 0)
  }

  test("saltedSumCount == plain groupBy sum/count") {
    val plain = left.groupBy("k").agg(
      sum($"v".cast("decimal(18,2)")).cast("double").as("sum_v"),
      count($"v").as("count_v"))
    val salted = Skew.saltedSumCount(left, "k", "v", 8)
    assert(salted.exceptAll(plain).count() == 0 &&
      plain.exceptAll(salted).count() == 0)
  }
}
