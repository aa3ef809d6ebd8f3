package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graphs, Stats, Temporal}

/** Round-8 wave: differential tests for the nonparametric/fold
  * operators — each distributed result replayed by a plain-Scala
  * sequential reference on seeded data. The fold operators (Kalman,
  * Croston, competing risks) must match BIT-EXACTLY: the operator
  * contract is "same IEEE ops in the same order as a single-threaded
  * loop", which is also what their recursive-CTE oracles replay. */
class Wave13Spec extends SparkSpec {
  import spark.implicits._

  test("brunnerMunzel matches the plain-Scala placement formula (ties included)") {
    val rnd = new scala.util.Random(11)
    val a = (1 to 180).map(_ => rnd.nextInt(25).toLong)
    val b = (1 to 240).map(_ => rnd.nextInt(25).toLong + 3L)
    val df = (a.map((_, "a")) ++ b.map((_, "b"))).toDF("v", "g")
    val row = Stats.brunnerMunzel(df, col("g") === "a", "v").collect().head

    // reference: midranks over the pooled sample and within groups
    def midranks(xs: Seq[Long], pool: Seq[Long]): Seq[Double] =
      xs.map(x => (pool.count(_ < x) + 1 + pool.count(_ <= x)) / 2.0)
    val pool = a ++ b
    val ra = midranks(a, pool); val rb = midranks(b, pool)
    val raw = midranks(a, a); val rbw = midranks(b, b)
    val (n1, n2) = (a.size.toDouble, b.size.toDouble)
    val m1 = ra.sum / n1; val m2 = rb.sum / n2
    def s2(r: Seq[Double], rw: Seq[Double], n: Double, m: Double) =
      r.zip(rw).map { case (x, y) => math.pow(x - y - m + (n + 1) / 2, 2) }
        .sum / (n - 1)
    val v1 = s2(ra, raw, n1, m1); val v2 = s2(rb, rbw, n2, m2)
    val pHat = (m2 - (n2 + 1) / 2) / n1
    val w = n1 * n2 * (m2 - m1) / ((n1 + n2) * math.sqrt(n1 * v1 + n2 * v2))
    val dfh = math.pow(n1 * v1 + n2 * v2, 2) /
      (math.pow(n1 * v1, 2) / (n1 - 1) + math.pow(n2 * v2, 2) / (n2 - 1))

    assert(row.getAs[Long]("n1") == a.size && row.getAs[Long]("n2") == b.size)
    assert(math.abs(row.getAs[Double]("p_hat") - pHat) < 1e-12)
    assert(math.abs(row.getAs[Double]("w_stat") - w) < 1e-9)
    assert(math.abs(row.getAs[Double]("df_hat") - dfh) < 1e-6)
    // dominance direction: b was shifted up, so p̂ = P(A < B) > 1/2
    assert(row.getAs[Double]("p_hat") > 0.5)
  }

  test("kalman1d is bit-identical to the sequential scalar filter") {
    val rnd = new scala.util.Random(23)
    val zs = (0 until 40).map(i => (i.toLong, rnd.nextInt(2000) / 100.0))
    val out = Temporal.kalman1d(zs.toDF("k", "z"), "k", "z",
        q = 2.0, r = 30.0, p0 = 500.0)
      .orderBy("k").collect()
    var x = 0.0; var p = 500.0
    zs.zip(out).foreach { case ((k, z), row) =>
      val ppred = p + 2.0
      val kg = ppred / (ppred + 30.0)
      x = x + kg * (z - x)
      p = (1.0 - kg) * ppred
      assert(row.getAs[Long]("k") == k)
      assert(row.getAs[Double]("z") == z)
      assert(row.getAs[Double]("x_filt") == x, s"x at $k")
      assert(row.getAs[Double]("p_var") == p, s"p at $k")
      assert(row.getAs[Double]("k_gain") == kg, s"kg at $k")
    }
    // steady state: gain must have converged into (0, 1)
    val lastK = out.last.getAs[Double]("k_gain")
    assert(lastK > 0.0 && lastK < 1.0)
  }

  test("croston is bit-identical to the sequential reference; zero days only stretch intervals") {
    val demands = Seq[Long](0, 0, 4, 0, 0, 0, 6, 2, 0, 5, 0, 0, 0, 0, 3)
    val df = demands.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("k", "d")
    val out = Temporal.croston(df, "k", "d", alpha = 0.2)
      .orderBy("k").collect()
    var seen = false; var zh = 0.0; var ph = 0.0; var qq = 1.0
    val expected = demands.zipWithIndex.flatMap { case (d, i) =>
      if (d > 0) {
        if (seen) { zh = zh + 0.2 * (d.toDouble - zh)
                    ph = ph + 0.2 * (qq - ph) }
        else { zh = d.toDouble; ph = qq; seen = true }
        qq = 1.0
        Some((i.toLong, d, zh, ph, zh / ph))
      } else { qq = qq + 1.0; None }
    }
    assert(out.length == expected.size)
    out.zip(expected).foreach { case (row, (k, d, z, p, f)) =>
      assert(row.getAs[Long]("k") == k && row.getAs[Long]("demand") == d)
      assert(row.getAs[Double]("z_hat") == z)
      assert(row.getAs[Double]("p_hat") == p)
      assert(row.getAs[Double]("forecast") == f)
    }
  }

  test("competingRisks: single-cause input reduces to kaplanMeier bit-exactly; CIFs account for all exits") {
    val rnd = new scala.util.Random(31)
    val units = (1 to 400).map { _ =>
      val t = rnd.nextInt(50).toLong
      val u = rnd.nextInt(10)
      (t, u < 4, u >= 4 && u < 6) // 40% cause1, 20% cause2, 40% censored
    }
    val df = units.toDF("t", "c1", "c2")
    val cr = Stats.competingRisks(df, col("t"), col("c1"), col("c2"))
      .orderBy("t_dur").collect()
    // sequential reference
    val byT = units.groupBy(_._1).map { case (t, xs) =>
      (t, xs.size.toLong, xs.count(_._2).toLong, xs.count(_._3).toLong)
    }.toSeq.sortBy(_._1)
    var atRisk = units.size.toLong
    var s = 1.0; var cif1 = 0.0; var cif2 = 0.0
    val exp = byT.flatMap { case (t, nAll, d1, d2) =>
      val out = if (d1 + d2 > 0) {
        cif1 = cif1 + s * (d1.toDouble / atRisk.toDouble)
        cif2 = cif2 + s * (d2.toDouble / atRisk.toDouble)
        s = s * (1.0 - (d1 + d2).toDouble / atRisk.toDouble)
        Some((t, atRisk, d1, d2, cif1, cif2, s))
      } else None
      atRisk -= nAll
      out
    }
    assert(cr.length == exp.size)
    cr.zip(exp).foreach { case (row, (t, n, d1, d2, c1, c2, sv)) =>
      assert(row.getAs[Long]("t_dur") == t && row.getAs[Long]("n_risk") == n)
      assert(row.getAs[Long]("d_cause1") == d1 &&
        row.getAs[Long]("d_cause2") == d2)
      assert(row.getAs[Double]("cif_cause1") == c1, s"cif1 at $t")
      assert(row.getAs[Double]("cif_cause2") == c2, s"cif2 at $t")
      assert(row.getAs[Double]("surv_all") == sv, s"surv at $t")
    }
    // single-cause degenerate case: surv_all must equal the KM curve
    val solo = df.withColumn("c2", lit(false))
    val crSolo = Stats.competingRisks(solo, col("t"), col("c1"), col("c2"))
      .select(col("t_dur"), col("surv_all")).orderBy("t_dur").collect()
    val km = Stats.kaplanMeier(df.select(col("t"), col("c1")), col("t"),
        col("c1")).select(col("t_dur"), col("surv")).orderBy("t_dur")
      .collect()
    assert(crSolo.length == km.length)
    crSolo.zip(km).foreach { case (a, b) =>
      assert(a.getAs[Long]("t_dur") == b.getAs[Long]("t_dur"))
      assert(a.getAs[Double]("surv_all") == b.getAs[Double]("surv"))
    }
  }

  test("pageRankWeighted with unit weights agrees with pageRank; weights shift mass") {
    val rnd = new scala.util.Random(41)
    // canonical a < b: pageRank's union+distinct collapses a reciprocal
    // input pair to one undirected edge while the weighted variant sums
    // its multiplicity — the unit-weight equivalence is defined on
    // simple undirected graphs, so feed one
    val edges = (1 to 60).map(_ =>
      (s"n${rnd.nextInt(12)}", s"n${rnd.nextInt(12)}"))
      .filter { case (a, b) => a < b }.distinct
    val df = edges.toDF("s", "d")
    val pr = Graphs.pageRank(df, "s", "d", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val prw = Graphs.pageRankWeighted(df.withColumn("w", lit(1L)),
        "s", "d", "w", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr.keySet == prw.keySet)
    // rank/outdeg vs rank*(1/wdeg) differ by ≤1 ulp pre-floor, so each
    // quantized contribution can differ by one 2^-40 step: tolerance is
    // maxdeg·2^-40, comfortably under 1e-10 on this 12-node fixture
    pr.foreach { case (k, v) =>
      assert(math.abs(prw(k) - v) < 1e-10, s"node $k: $v vs ${prw(k)}")
    }
    // mass conservation (no dangling nodes after symmetrization)
    assert(math.abs(prw.values.sum - 1.0) < 1e-9)
    // a heavily-weighted edge pulls rank toward its endpoints
    val heavy = Graphs.pageRankWeighted(
      df.withColumn("w",
        when(col("s") === "n1" || col("d") === "n1", lit(50L))
          .otherwise(lit(1L))),
      "s", "d", "w", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(heavy("n1") > prw("n1"))
  }
}
