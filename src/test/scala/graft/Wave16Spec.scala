package graft

import java.math.{BigDecimal => JBD, MathContext}

import org.apache.spark.sql.functions._

import graft.operators.Stats

/** Round-8 wave: differential tests for the multivariate / robust
  * operators — scalar replays with exact integer/decimal accumulation,
  * asserting bit-equality like the DuckDB oracles do. */
class Wave16Spec extends SparkSpec {
  import spark.implicits._

  private def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)

  test("powerIterCov4 is bit-identical to the scalar unrolled iteration") {
    val rnd = new scala.util.Random(71)
    val rows = (1 to 800).map { _ =>
      val b = rnd.nextInt(100).toLong
      Array(b + rnd.nextInt(10), b + rnd.nextInt(20),
        rnd.nextInt(50).toLong, b / 2 + rnd.nextInt(5))
    }
    val df = rows.map(r => (r(0), r(1), r(2), r(3))).toDF("a", "b", "c", "d")
    val got = Stats.powerIterCov4(df,
      Seq(col("a"), col("b"), col("c"), col("d")), iters = 3)
      .collect().head

    val n = rows.size
    def s(a: Int) = rows.map(r => BigInt(r(a))).sum
    def p(a: Int, b: Int) = rows.map(r => BigInt(r(a)) * BigInt(r(b))).sum
    val m = (0 until 4).map(a => s(a).toString.toDouble / n.toDouble)
    val cMat = Array.tabulate(4, 4) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      p(lo, hi).toString.toDouble / n.toDouble - m(lo) * m(hi)
    }
    var v = Array(0.5, 0.5, 0.5, 0.5)
    var lam = 0.0
    (1 to 3).foreach { _ =>
      val u = (0 until 4).map { a =>
        (1 until 4).foldLeft(cMat(a)(0) * v(0)) { (acc, b) =>
          acc + cMat(a)(b) * v(b)
        }
      }
      lam = math.sqrt((1 until 4).foldLeft(u(0) * u(0)) { (acc, a) =>
        acc + u(a) * u(a)
      })
      v = u.map(_ / lam).toArray
    }
    assert(got.getAs[Long]("n") == n.toLong)
    assert(bits(got.getAs[Double]("lambda1")) == bits(lam))
    Seq("ev1", "ev2", "ev3", "ev4").zip(v).foreach { case (c, ref) =>
      assert(bits(got.getAs[Double](c)) == bits(ref), s"$c")
    }
    // the dominant direction loads on the correlated a/b/d block
    assert(math.abs(v(0)) > math.abs(v(2)))
  }

  test("mahalanobis2d is bit-identical to the scalar quantized replay") {
    val rnd = new scala.util.Random(73)
    val pts = (1 to 2000).map { i =>
      val x = rnd.nextInt(1000) / 10.0
      val y = 2.0 * x + rnd.nextInt(200) / 10.0 +
        (if (i % 97 == 0) 400.0 else 0.0) // planted joint outliers
      (x, y)
    }
    val got = Stats.mahalanobis2d(pts.toDF("x", "y"),
      col("x"), col("y"), d2Threshold = 9.21034).collect().head

    val q = 1048576.0
    def qs(ts: Seq[Double]) = {
      val b = ts.map(t => BigInt(math.floor(t * q).toLong)).sum
      b.toString.toDouble / q
    }
    val n = pts.size.toDouble
    val mx = qs(pts.map(_._1)) / n; val my = qs(pts.map(_._2)) / n
    val vx = qs(pts.map(p => p._1 * p._1)) / n - mx * mx
    val vy = qs(pts.map(p => p._2 * p._2)) / n - my * my
    val cxy = qs(pts.map(p => p._1 * p._2)) / n - mx * my
    val det = vx * vy - cxy * cxy
    val d2s = pts.map { case (x, y) =>
      val zx = x - mx; val zy = y - my
      (vy * (zx * zx) - 2.0 * (cxy * (zx * zy)) + vx * (zy * zy)) / det
    }
    assert(bits(got.getAs[Double]("mean_x")) == bits(mx))
    assert(bits(got.getAs[Double]("cov_xy")) == bits(cxy))
    assert(got.getAs[Long]("n_outliers") ==
      d2s.count(_ > 9.21034).toLong)
    assert(bits(got.getAs[Double]("max_d2")) == bits(d2s.max))
    // the planted joint outliers are found
    assert(got.getAs[Long]("n_outliers") >= (pts.size / 97 - 2).toLong)
  }

  test("isolationCensus matches the scalar tree walk; outliers isolate") {
    val rnd = new scala.util.Random(83)
    // dense cluster at 1000±20 plus a few extreme outliers
    val xs = (1 to 1500).map(_ => 1000L + rnd.nextInt(41) - 20) ++
      Seq(5L, 90000L, 70000L, 12L)
    val got = Stats.isolationCensus(xs.toDF("x"), col("x"),
      nTrees = 4, depth = 6).orderBy("t").collect()

    val lo0 = xs.min.toDouble - 0.5
    val hi0 = xs.max.toDouble + 0.5
    (1 to 4).foreach { t =>
      val leaves = xs.groupBy { x =>
        var lo = lo0; var hi = hi0; var leaf = 0L
        (1 to 6).foreach { l =>
          val thr = lo + Stats.isoFrac(t, l) * (hi - lo)
          if (x.toDouble < thr) hi = thr
          else { lo = thr; leaf += (1L << (l - 1)) }
        }
        leaf
      }.map { case (leaf, rows) => leaf -> rows.size }
      val row = got(t - 1)
      assert(row.getAs[Long]("n_leaves") == leaves.size.toLong)
      assert(row.getAs[Long]("max_leaf_size") == leaves.values.max.toLong)
      assert(row.getAs[Long]("n_singletons") ==
        leaves.values.count(_ == 1).toLong)
      assert(row.getAs[Long]("n_rows_isolated") ==
        leaves.values.filter(_ <= 4).sum.toLong)
      // the extreme outliers sit far from the cluster: some isolation
      // must register (small leaves exist in every tree here)
      assert(row.getAs[Long]("n_rows_isolated") >= 1L)
    }
  }

  test("lnLnOls recovers a planted power-law exponent") {
    val rnd = new scala.util.Random(89)
    val pts = (1 to 2000).map { _ =>
      val x = 2.0 + rnd.nextInt(100000) / 100.0
      val y = 5e6 * math.pow(x, -1.7) * (1.0 + (rnd.nextInt(21) - 10) / 100.0)
      (x, math.max(1.0, y))
    }
    val row = Stats.lnLnOls(pts.toDF("x", "y"), col("x"), col("y"))
      .collect().head
    assert(math.abs(row.getAs[Double]("slope") + 1.7) < 0.05,
      s"slope ${row.getAs[Double]("slope")}")
  }

  test("weibullPlotFit recovers planted Weibull shape and scale") {
    val rnd = new scala.util.Random(97)
    // inverse-transform Weibull(k=2, lambda=50), integerized
    val durs = (1 to 5000).map { _ =>
      val u = (rnd.nextInt(999998) + 1) / 1000000.0
      math.max(1L, math.round(50.0 * math.pow(-math.log(1.0 - u), 0.5)))
    }
    val row = Stats.weibullPlotFit(durs.toDF("d"), col("d"))
      .collect().head
    val k = row.getAs[Double]("shape")
    val lam = row.getAs[Double]("scale_hat")
    assert(math.abs(k - 2.0) < 0.2, s"shape $k")
    assert(math.abs(lam - 50.0) < 4.0, s"scale $lam")
  }

  test("hmmViterbi2 is bit-identical to the scalar Viterbi; regimes recovered") {
    val rnd = new scala.util.Random(101)
    // planted regimes: 40 low days (~20), 40 high (~60), 40 low
    val cs = ((1 to 40).map(_ => 20 + rnd.nextInt(9) - 4) ++
      (41 to 80).map(_ => 60 + rnd.nextInt(9) - 4) ++
      (81 to 120).map(_ => 20 + rnd.nextInt(9) - 4)).map(_.toLong)
    val df = cs.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("k", "c")
    val out = graft.operators.Temporal.hmmViterbi2(df, "k", "c",
      stayP = 0.9).orderBy("k").collect()

    val n = cs.size
    val m = cs.sum.toDouble / n
    val vr = cs.map(c => (c * c).toDouble).sum / n - m * m
    val (muh, mul) = (1.5 * m, 0.5 * m)
    val (lnStay, lnSw) = (math.log(0.9), math.log(1.0 - 0.9))
    var (vh, vl) = (0.0, 0.0)
    val bh = Array.ofDim[Int](n); val bl = Array.ofDim[Int](n)
    cs.zipWithIndex.foreach { case (cl, i) =>
      val c = cl.toDouble
      val (thH, thL) = (vh + lnStay, vl + lnSw)
      val (tlH, tlL) = (vh + lnSw, vl + lnStay)
      bh(i) = if (thH >= thL) 1 else 0
      bl(i) = if (tlH >= tlL) 1 else 0
      val emH = -(((c - muh) * (c - muh)) / (2.0 * vr))
      val emL = -(((c - mul) * (c - mul)) / (2.0 * vr))
      val nvh = (if (thH >= thL) thH else thL) + emH
      val nvl = (if (tlH >= tlL) tlH else tlL) + emL
      vh = nvh; vl = nvl
    }
    val path = Array.ofDim[Int](n)
    path(n - 1) = if (vh >= vl) 1 else 0
    (n - 2 to 0 by -1).foreach { i =>
      path(i) = if (path(i + 1) == 1) bh(i + 1) else bl(i + 1)
    }
    out.zipWithIndex.foreach { case (row, i) =>
      assert(row.getAs[Long]("map_state") == path(i).toLong, s"day $i")
    }
    // the planted block structure is decoded: mid-block is high
    assert(out(60).getAs[Long]("map_state") == 1L)
    assert(out(20).getAs[Long]("map_state") == 0L)
    assert(out(100).getAs[Long]("map_state") == 0L)
  }

  test("hmmPosterior2 is bit-identical to the scalar forward-backward") {
    val rnd = new scala.util.Random(103)
    val cs = ((1 to 30).map(_ => 20 + rnd.nextInt(7)) ++
      (1 to 30).map(_ => 60 + rnd.nextInt(7)) ++
      (1 to 30).map(_ => 20 + rnd.nextInt(7))).map(_.toLong)
    val df = cs.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("k", "c")
    val out = graft.operators.Temporal.hmmPosterior2(df, "k", "c",
      stayP = 0.9).orderBy("k").collect()

    val n = cs.size
    val m = cs.sum.toDouble / n
    val vr = cs.map(c => (c * c).toDouble).sum / n - m * m
    val (muh, mul) = (1.5 * m, 0.5 * m)
    val sw = 1.0 - 0.9
    def em(c: Double, mu: Double) =
      pexp(math.max(-(((c - mu) * (c - mu)) / (2.0 * vr)), -30.0))
    val eh = cs.map(c => em(c.toDouble, muh))
    val el = cs.map(c => em(c.toDouble, mul))
    val fh = Array.ofDim[Double](n); val fl = Array.ofDim[Double](n)
    var (ah, al) = (0.5, 0.5)
    (0 until n).foreach { i =>
      val uh = (ah * 0.9 + al * sw) * eh(i)
      val ul = (ah * sw + al * 0.9) * el(i)
      val s = uh + ul
      ah = uh / s; al = ul / s; fh(i) = ah; fl(i) = al
    }
    val gh = Array.ofDim[Double](n); val gl = Array.ofDim[Double](n)
    gh(n - 1) = 0.5; gl(n - 1) = 0.5
    ((n - 2) to 0 by -1).foreach { i =>
      val vh = 0.9 * (eh(i + 1) * gh(i + 1)) + sw * (el(i + 1) * gl(i + 1))
      val vl = sw * (eh(i + 1) * gh(i + 1)) + 0.9 * (el(i + 1) * gl(i + 1))
      val s = vh + vl
      gh(i) = vh / s; gl(i) = vl / s
    }
    out.zipWithIndex.foreach { case (row, i) =>
      assert(bits(row.getAs[Double]("p_filter")) == bits(fh(i)), s"f $i")
      val ps = (fh(i) * gh(i)) / (fh(i) * gh(i) + fl(i) * gl(i))
      assert(bits(row.getAs[Double]("p_smooth")) == bits(ps), s"s $i")
    }
    // smoothing labels the planted blocks
    assert(out(45).getAs[Double]("p_smooth") > 0.9)
    assert(out(10).getAs[Double]("p_smooth") < 0.1)
  }

  /** Scalar replay of Pmath.expColumn (same constant table). */
  private def pexp(x: Double): Double = {
    val kf = math.floor(x * graft.functions.Pmath.InvLn2 + 0.5)
    val r = x - kf * graft.functions.Pmath.Ln2
    var p = graft.functions.Pmath.expCoeffs.last
    var i = graft.functions.Pmath.expCoeffs.length - 2
    while (i >= 0) { p = graft.functions.Pmath.expCoeffs(i) + r * p; i -= 1 }
    Math.scalb(p, kf.toInt)
  }

  test("kdeGrid finds planted modes; loessGrid tracks a planted curve") {
    val rnd = new scala.util.Random(107)
    val xs = ((1 to 3000).map(_ => 100L + rnd.nextInt(21) - 10) ++
      (1 to 3000).map(_ => 500L + rnd.nextInt(21) - 10))
    val kde = Stats.kdeGrid(xs.toDF("x"), col("x"), nGrid = 16)
      .orderBy("j").collect()
    val dens = kde.map(r => (r.getAs[Double]("g"), r.getAs[Double]("density")))
    // density near the planted modes dominates the valley between them
    val nearMode = dens.filter(p => math.abs(p._1 - 100) < 40 ||
      math.abs(p._1 - 500) < 40).map(_._2).max
    val valley = dens.filter(p => p._1 > 200 && p._1 < 400).map(_._2).max
    assert(nearMode > 10 * valley, s"mode $nearMode valley $valley")

    val pts = (1 to 4000).map { _ =>
      val x = rnd.nextInt(1000) / 10.0
      (x, 3.0 + 0.5 * x * x + (rnd.nextInt(200) - 100) / 50.0)
    }
    val lo = Stats.loessGrid(pts.toDF("x", "y"), col("x"), col("y"),
      nGrid = 16).orderBy("j").collect()
    lo.foreach { r =>
      val g = r.getAs[Double]("g")
      val want = 3.0 + 0.5 * g * g
      val got = r.getAs[Double]("y_hat")
      // local linear tracks the quadratic within the bandwidth bias
      assert(math.abs(got - want) < math.max(60.0, 0.15 * want),
        s"at $g: $got vs $want")
    }
  }

  test("ransacLine recovers the planted line against heavy outliers") {
    val rnd = new scala.util.Random(79)
    // 80% on y = 3x + 50 (small noise), 20% wild outliers
    val rows = (1 to 3000).map { i =>
      val x = (rnd.nextInt(10000) + 100) / 100.0
      val y = if (rnd.nextDouble() < 0.8)
        3.0 * x + 50.0 + (rnd.nextInt(200) - 100) / 100.0
      else rnd.nextInt(100000) / 10.0
      (i.toLong, x, y)
    }
    val got = Stats.ransacLine(rows.toDF("id", "x", "y"),
      col("x"), col("y"), col("id"), nCand = 16, tol = 10.0)
      .collect().head
    val slope = got.getAs[Double]("slope_refit")
    val icpt = got.getAs[Double]("intercept_refit")
    // every hash subset is outlier-contaminated the same way, so the
    // candidate fits are biased — but the inlier vote + refit recovers
    // the planted parameters to consensus precision
    assert(math.abs(slope - 3.0) < 0.2, s"slope $slope")
    assert(math.abs(icpt - 50.0) < 5.0, s"intercept $icpt")
    assert(got.getAs[Long]("n_inl") > 2000L)
  }
}
