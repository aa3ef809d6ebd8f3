package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sketches, Stats}

/** Portable-sketch guarantees: KMV accuracy + mergeability, DDSketch
  * relative-error quantile bound, bootstrap CI statistical sanity. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct: exact below k, within 3/sqrt(k) above; partition-proof") {
    // group "small" has 40 distinct values (< k=64 → exact count);
    // group "big" has 5000 (estimator regime)
    val rows = (1 to 40).map(v => ("small", v)) ++
      (1 to 5000).map(v => ("big", v)) ++
      (1 to 5000).map(v => ("big", v)) // duplicates must not matter
    for (parts <- Seq(1, 7)) {
      val got = Sketches.kmvDistinct(rows.toDF("g", "v").repartition(parts),
        "g", "v", k = 64)
        .collect().map(r => r.getAs[String]("g") ->
          (r.getAs[Long]("n_in_sketch"), r.getAs[Double]("est_distinct"))).toMap
      assert(got("small") == ((40L, 40.0)), s"parts=$parts: ${got("small")}")
      val (nk, est) = got("big")
      assert(nk == 64L)
      // KMV relative error is ~1/sqrt(k-2) = 12.7%; allow 3 sigma
      assert(math.abs(est - 5000.0) / 5000.0 < 0.38,
        s"parts=$parts: estimate $est too far from 5000")
    }
  }

  test("kmvDistinct merges: sketch(A ∪ B) == merge of sketch(A), sketch(B)") {
    val a = (1 to 3000).map(v => ("g", v)).toDF("g", "v")
    val b = (2000 to 6000).map(v => ("g", v)).toDF("g", "v")
    val whole = Sketches.kmvDistinct(a.union(b), "g", "v", k = 32)
      .collect().head.getAs[Double]("est_distinct")
    // merge = bottom-k of the union of the two bottom-k hash sets;
    // rebuild by re-sketching the union of the value sets that survive
    // each sketch is NOT available (hashes are one-way), so prove the
    // order-statistic identity directly on the hashes
    def bottomK(df: org.apache.spark.sql.DataFrame) =
      df.select(col("v").cast("string").as("v")).distinct()
        .select(md5(col("v")).as("h"))
        .orderBy("h").limit(32).as[String].collect().toSeq
    val merged = (bottomK(a) ++ bottomK(b)).distinct.sorted.take(32)
    val wholeK = bottomK(a.union(b))
    assert(merged == wholeK,
      "bottom-k of merged bottom-k sets must equal bottom-k of the union")
    assert(whole > 4000 && whole < 6500, s"union estimate $whole implausible")
  }

  test("ddsketchBuckets: derived quantiles within the gamma relative-error bound") {
    val orders = Tables.load(spark, "/root/testdata/sf0.01", "orders")
    val gamma = 1.02
    val buckets = Sketches.ddsketchBuckets(orders, col("o_totalprice"), gamma)
      .orderBy("bucket")
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n")))
    val total = buckets.map(_._2).sum
    // quantile read: first bucket where the cumulative count crosses qN;
    // the bucket's upper boundary gamma^(b+1) over-estimates the true
    // value by at most a factor gamma^2 (value >= gamma^b)
    def readQ(q: Double): Double = {
      var cum = 0L
      val target = math.ceil(q * total).toLong
      val b = buckets.find { case (_, n) => cum += n; cum >= target }.get._1
      math.pow(gamma, b.toDouble + 0.5) // mid-bucket representative
    }
    val exact = orders.stat.approxQuantile("o_totalprice",
      Array(0.5, 0.95, 0.99), 0.0) // relativeError 0 → exact
    for (((q, e), i) <- Seq(0.5, 0.95, 0.99).zip(exact).zipWithIndex) {
      val est = readQ(q)
      assert(math.abs(est - e) / e < (gamma - 1.0) * 1.5 + 0.001,
        s"q$q: est $est vs exact $e exceeds the relative-error bound")
    }
    assert(total == orders.count())
  }

  test("kmvSetOps: estimates within 3/sqrt(k) of true union/intersection; exact when union fits; partition-proof") {
    import spark.implicits._
    // A = 1..3000, B = 2001..5000 → |A∪B| = 5000, |A∩B| = 1000, J = 0.2
    val a = (1 to 3000).map(_.toLong).toDF("v")
    val b = (2001 to 5000).map(_.toLong).toDF("v")
    val k = 256
    val row = graft.operators.Sketches.kmvSetOps(a, b, "v", k).collect().head
    val eps = 3.0 / math.sqrt(k) // ~0.1875 relative
    val eu = row.getAs[Double]("est_union")
    val ei = row.getAs[Double]("est_intersection")
    assert(math.abs(eu - 5000.0) / 5000.0 < eps, s"union est $eu")
    // intersection compounds union + Jaccard noise: double the band
    assert(math.abs(ei - 1000.0) / 1000.0 < 2 * eps, s"intersection est $ei")
    // deterministic under repartition
    val row2 = graft.operators.Sketches.kmvSetOps(
      a.repartition(7), b.repartition(3), "v", k).collect().head
    assert(row.toSeq == row2.toSeq)
    // tiny populations: sketch holds everything → exact, J exact
    val ex = graft.operators.Sketches.kmvSetOps(
      Seq(1L, 2L, 3L).toDF("v"), Seq(3L, 4L).toDF("v"), "v", 64)
      .collect().head
    assert(ex.getAs[Double]("est_union") == 4.0 &&
      ex.getAs[Double]("est_intersection") == 1.0)
  }

  test("bootstrapMeanCi: boot mean near full mean, SE near s/sqrt(m)") {
    val rnd = new scala.util.Random(23)
    // one group, value ~ Uniform(0, 1000): mean 500, sd ~ 288.7
    val rows = (1 to 4000).map(i => ("g", i.toLong, rnd.nextInt(1000).toDouble))
    val got = Stats.bootstrapMeanCi(rows.toDF("g", "id", "amt"),
      "g", col("id"), col("amt"), b = 32).collect().head
    val full = got.getAs[Double]("mean_full")
    assert(got.getAs[Long]("n") == 4000 && got.getAs[Long]("n_reps") == 32)
    assert(math.abs(got.getAs[Double]("boot_mean") - full) < 15.0,
      "replicate means must center on the full mean")
    // each replicate has m ~ 2000 rows → SE of its mean ~ 288.7/sqrt(2000)
    // ~ 6.5; subsampling halves the sample so SE is sqrt(2)x the full-
    // sample SE. Wide tolerance: this is a sanity band, not a bound.
    val se = got.getAs[Double]("boot_se")
    assert(se > 2.0 && se < 20.0, s"bootstrap SE $se outside sanity band")
  }
}
