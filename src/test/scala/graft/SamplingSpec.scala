package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Systematic PPS invariants: k picks under uniform weights, heavy rows
  * are certain picks, zero-weight rows are never picked. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("uniform weights pick exactly k; heavy row always picked; zero never") {
    val uniform = (1 to 100).map(i => ("g", i.toLong, 100L)).toDF("g", "id", "cents")
    val gotU = Sampling.systematicPps(uniform, "g", "id", col("cents"), 10)
    assert(gotU.count() == 10, "uniform weights must yield exactly k rows")

    // one row carries >1/k of total weight -> spans a boundary for sure
    val skewed = ((1 to 50).map(i => ("g", i.toLong, 10L)) :+ (("g", 99L, 400L)))
      .toDF("g", "id", "cents")
    val gotS = Sampling.systematicPps(skewed, "g", "id", col("cents"), 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotS.contains(99L), "row heavier than W/k must always be selected")

    val withZero = Seq(("g", 1L, 0L), ("g", 2L, 100L), ("g", 3L, 0L))
      .toDF("g", "id", "cents")
    val gotZ = Sampling.systematicPps(withZero, "g", "id", col("cents"), 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotZ == Set(2L), "zero-weight rows occupy no segment")

    // an ALL-zero-weight group yields no picks — and must not kill the
    // other groups with an ANSI divide-by-zero
    val mixed = Seq(("dead", 1L, 0L), ("dead", 2L, 0L), ("live", 3L, 10L))
      .toDF("g", "id", "cents")
    val gotM = Sampling.systematicPps(mixed, "g", "id", col("cents"), 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotM == Set(3L), s"got $gotM")
  }

  test("selection frequency tracks weight share on the orders fixture") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val got = Sampling.systematicPps(
      orders, "o_orderstatus", "o_orderkey",
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"), 10)
    val counts = got.groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // each status group returns k rows, minus boundary-collapse slack
    assert(counts.values.forall(n => n >= 8 && n <= 10), s"got $counts")
    // and the sampled mean price must exceed the population mean (PPS
    // favors heavy rows by construction)
    val sampled = got.agg(avg("o_totalprice")).head.getDouble(0)
    val pop = orders.agg(avg("o_totalprice")).head.getDouble(0)
    assert(sampled > pop, s"sampled mean $sampled <= population mean $pop")
  }

  test("hash split: deterministic, partition-independent, near target proportions") {
    import graft.operators.Sampling
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id")
    val a = Sampling.hashSplit(docs, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Sampling.hashSplit(docs.repartition(7), "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b, "split must not depend on partitioning")
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05 &&
      math.abs(frac("val") - 0.1) < 0.03 &&
      math.abs(frac("test") - 0.1) < 0.03, s"proportions off: $frac")
  }
}
