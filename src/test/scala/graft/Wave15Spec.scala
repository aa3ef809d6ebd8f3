package graft

import org.apache.spark.sql.functions._

import graft.functions.Pmath
import graft.operators.Stats

/** Round-8 wave: differential tests for the portable-exp iterative
  * fits. The contract is bit-exactness against a single-threaded
  * scalar replay of the SAME algorithm (portable exp, 2⁻²⁰ quantized
  * BigInt sums, identical IEEE chains) — which is also what the DuckDB
  * oracles replay — plus statistical sanity on planted parameters. */
class Wave15Spec extends SparkSpec {
  import spark.implicits._

  /** Scalar replay of Pmath.expColumn (same constant table). */
  private def pexp(x: Double): Double = {
    val kf = math.floor(x * Pmath.InvLn2 + 0.5)
    val r = x - kf * Pmath.Ln2
    var p = Pmath.expCoeffs.last
    var i = Pmath.expCoeffs.length - 2
    while (i >= 0) { p = Pmath.expCoeffs(i) + r * p; i -= 1 }
    Math.scalb(p, kf.toInt)
  }

  private def qsum(terms: Seq[Double]): Double = {
    val s = terms.map(t => BigInt(math.floor(t * 1048576.0).toLong)).sum
    s.toString.toDouble / 1048576.0
  }

  private def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)

  test("logisticIrls is bit-identical to the scalar quantized replay") {
    val rnd = new scala.util.Random(47)
    // planted model: P(y=1) = sigmoid(-1 + 2x)
    val data = (1 to 4000).map { _ =>
      val x = rnd.nextInt(300) / 100.0
      val p = 1.0 / (1.0 + math.exp(1.0 - 2.0 * x))
      (x, if (rnd.nextDouble() < p) 1.0 else 0.0)
    }
    val got = Stats.logisticIrls(data.toDF("x", "y"), col("x"), col("y"),
      rounds = 2).collect().head

    var (b0, b1) = (0.0, 0.0)
    (1 to 2).foreach { _ =>
      val rows = data.map { case (x, y) =>
        val eta = math.min(math.max(b0 + b1 * x, -30.0), 30.0)
        val mu = 1.0 / (1.0 + pexp(-eta))
        val w = mu * (1.0 - mu)
        (x, y, mu, w)
      }
      val g0 = qsum(rows.map { case (_, y, mu, _) => y - mu })
      val g1 = qsum(rows.map { case (x, y, mu, _) => (y - mu) * x })
      val h00 = qsum(rows.map { case (_, _, _, w) => w })
      val h01 = qsum(rows.map { case (x, _, _, w) => w * x })
      val h11 = qsum(rows.map { case (x, _, _, w) => (w * x) * x })
      val det = h00 * h11 - h01 * h01
      val nb0 = b0 + (h11 * g0 - h01 * g1) / det
      val nb1 = b1 + (h00 * g1 - h01 * g0) / det
      b0 = nb0; b1 = nb1
    }
    assert(got.getAs[Long]("n") == data.size)
    assert(bits(got.getAs[Double]("beta0")) == bits(b0),
      s"beta0 ${got.getAs[Double]("beta0")} vs $b0")
    assert(bits(got.getAs[Double]("beta1")) == bits(b1),
      s"beta1 ${got.getAs[Double]("beta1")} vs $b1")
    // two Newton rounds from zero land in the planted parameters'
    // direction: positive slope, negative intercept
    assert(b1 > 0.5 && b0 < 0.0)
  }

  test("poissonIrls is bit-identical to the scalar quantized replay") {
    val rnd = new scala.util.Random(59)
    // planted model: y ~ Poisson(exp(0.5 + 0.8x))
    val data = (1 to 3000).map { _ =>
      val x = rnd.nextInt(250) / 100.0
      val lam = math.exp(0.5 + 0.8 * x)
      var y = 0; var p = math.exp(-lam); var cdf = p
      val udraw = rnd.nextDouble()
      while (cdf < udraw && y < 200) { y += 1; p *= lam / y; cdf += p }
      (x, y.toDouble)
    }
    val got = Stats.poissonIrls(data.toDF("x", "y"), col("x"), col("y"),
      rounds = 2).collect().head
    var (b0, b1) = (0.0, 0.0)
    (1 to 2).foreach { _ =>
      val rows = data.map { case (x, y) =>
        val eta = math.min(math.max(b0 + b1 * x, -30.0), 30.0)
        (x, y, pexp(eta))
      }
      val g0 = qsum(rows.map { case (_, y, mu) => y - mu })
      val g1 = qsum(rows.map { case (x, y, mu) => (y - mu) * x })
      val h00 = qsum(rows.map(_._3))
      val h01 = qsum(rows.map { case (x, _, mu) => mu * x })
      val h11 = qsum(rows.map { case (x, _, mu) => (mu * x) * x })
      val det = h00 * h11 - h01 * h01
      val nb0 = b0 + (h11 * g0 - h01 * g1) / det
      val nb1 = b1 + (h00 * g1 - h01 * g0) / det
      b0 = nb0; b1 = nb1
    }
    assert(got.getAs[Long]("n") == data.size)
    assert(bits(got.getAs[Double]("beta0")) == bits(b0))
    assert(bits(got.getAs[Double]("beta1")) == bits(b1))
    // Newton from zero moves toward the planted positive slope
    assert(b1 > 0.3)
  }

  test("coxNewton is bit-identical to the scalar risk-set replay") {
    val rnd = new scala.util.Random(61)
    // planted hazard: higher x dies earlier; ~30% censored
    val data = (1 to 1500).map { _ =>
      val xn = rnd.nextInt(512).toLong
      val base = 5.0 + 40.0 * math.exp(-xn / 256.0)
      val dur = math.max(0L, (base * (0.2 + rnd.nextDouble())).round)
      val obs = if (rnd.nextDouble() < 0.7) 1L else 0L
      (dur, obs, xn)
    }
    val got = Stats.coxNewton(data.toDF("dur", "obs", "xn"),
      col("dur"), col("obs"), col("xn"), rounds = 2).collect().head

    val q = 1048576.0
    def toD(b: BigInt) = b.toString.toDouble
    var beta = 0.0
    var (usumF, isumF) = (0.0, 0.0)
    (1 to 2).foreach { _ =>
      val perDur = data.groupBy(_._1).map { case (dur, rows) =>
        var qw = BigInt(0); var qwx = BigInt(0); var qwxx = BigInt(0)
        var d = 0L; var sxd = 0L
        rows.foreach { case (_, obs, xn) =>
          val xd = xn.toDouble / 128.0
          val eta = math.min(math.max(beta * xd, -30.0), 30.0)
          val w = pexp(eta)
          qw += BigInt(math.floor(w * q).toLong)
          qwx += BigInt(math.floor((w * xd) * q).toLong)
          qwxx += BigInt(math.floor(((w * xd) * xd) * q).toLong)
          d += obs; sxd += obs * xn
        }
        (dur, qw, qwx, qwxx, d, sxd)
      }.toSeq.sortBy(_._1)
      // reverse cumulatives, then ascending-dur folds over d>0 rows
      val rev = perDur.reverse
      var (cq, cqx, cqxx) = (BigInt(0), BigInt(0), BigInt(0))
      val cum = rev.map { case (dur, qw, qwx, qwxx, d, sxd) =>
        cq += qw; cqx += qwx; cqxx += qwxx
        (dur, cq, cqx, cqxx, d, sxd)
      }.reverse
      var (us, is) = (0.0, 0.0)
      cum.filter(_._5 > 0).foreach { case (_, cw, cwx, cwxx, d, sxd) =>
        val s0 = toD(cw) / q; val s1 = toD(cwx) / q; val s2 = toD(cwxx) / q
        val rat = s1 / s0
        us = us + (sxd.toDouble / 128.0 - d.toDouble * rat)
        is = is + d.toDouble * (s2 / s0 - rat * rat)
      }
      beta = beta + us / is
      usumF = us; isumF = is
    }
    assert(got.getAs[Long]("n") == data.size)
    assert(bits(got.getAs[Double]("beta")) == bits(beta),
      s"beta ${got.getAs[Double]("beta")} vs $beta")
    assert(bits(got.getAs[Double]("score_last")) == bits(usumF))
    assert(bits(got.getAs[Double]("info_last")) == bits(isumF))
    // planted effect: higher activity shortens survival → beta < 0
    // for duration-hazard… direction depends on parametrization; just
    // require a decisively informative fit
    assert(isumF > 0.0 && math.abs(beta) > 0.01)
  }

  test("garchFilter is bit-identical to the sequential scalar filter") {
    val rnd = new scala.util.Random(67)
    val series = (0 until 200).scanLeft((0L, 10000.0)) { case ((i, c), _) =>
      (i + 1, math.max(100.0, c * (1.0 + (rnd.nextInt(200) - 100) / 1000.0)))
    }.map { case (i, c) => (i, math.floor(c).toLong) }
    val out = graft.operators.Temporal.garchFilter(
        series.toDF("k", "c"), "k", "c", alpha = 0.1, beta = 0.85)
      .orderBy("k").collect()

    val cs = series.map(_._2.toDouble)
    val rs = (1 until cs.size).map(i => (cs(i) - cs(i - 1)) / cs(i - 1))
    var acc = 0.0
    rs.foreach { r => acc = acc + r * r }
    val mvar = acc / rs.size.toDouble
    val w = 1.0 - 0.1 - 0.85
    var v = mvar
    assert(out.length == rs.size)
    rs.zip(out).zipWithIndex.foreach { case ((r, row), i) =>
      v = w * mvar + 0.1 * (r * r) + 0.85 * v
      assert(row.getAs[Long]("k") == series(i + 1)._1)
      assert(bits(row.getAs[Double]("ret")) == bits(r))
      assert(bits(row.getAs[Double]("cond_var")) == bits(v),
        s"round $i: ${row.getAs[Double]("cond_var")} vs $v")
      assert(bits(row.getAs[Double]("var_target")) == bits(mvar))
    }
    // variance targeting: the filter mean-reverts to the target
    assert(v > 0.0 && mvar > 0.0)
  }

  test("gmmEm1d is bit-identical to the scalar quantized replay") {
    val rnd = new scala.util.Random(53)
    // planted mixture: N(200, 30²) and N(800, 50²), 40/60
    val data = (1 to 5000).map { _ =>
      if (rnd.nextDouble() < 0.4) (200 + rnd.nextGaussian() * 30).round
      else (800 + rnd.nextGaussian() * 50).round
    }
    val got = Stats.gmmEm1d(data.toDF("x"), col("x"), rounds = 2)
      .collect().head

    val n = data.size
    val sx = data.map(BigInt(_)).sum
    val sxx = data.map(x => BigInt(x) * BigInt(x)).sum
    val mean = sx.toString.toDouble / n.toDouble
    val vr = sxx.toString.toDouble / n.toDouble - mean * mean
    var (pi1, mu1, mu2, v1, v2) =
      (0.5, mean - math.sqrt(vr), mean + math.sqrt(vr), vr, vr)
    (1 to 2).foreach { _ =>
      val rows = data.map { xl =>
        val x = xl.toDouble
        val q1 = ((x - mu1) * (x - mu1)) / (2.0 * v1)
        val q2 = ((x - mu2) * (x - mu2)) / (2.0 * v2)
        val lr = math.min(math.max(q1 - q2, -30.0), 30.0)
        val ratio = ((1.0 - pi1) / pi1) * math.sqrt(v1 / v2)
        val r1 = 1.0 / (1.0 + ratio * pexp(lr))
        (x, r1, 1.0 - r1)
      }
      val sr1 = qsum(rows.map(_._2))
      val sr1x = qsum(rows.map { case (x, r1, _) => r1 * x })
      val sr1xx = qsum(rows.map { case (x, r1, _) => (r1 * x) * x })
      val sr2 = qsum(rows.map(_._3))
      val sr2x = qsum(rows.map { case (x, _, r2) => r2 * x })
      val sr2xx = qsum(rows.map { case (x, _, r2) => (r2 * x) * x })
      val nmu1 = sr1x / sr1; val nmu2 = sr2x / sr2
      pi1 = sr1 / (sr1 + sr2)
      v1 = sr1xx / sr1 - nmu1 * nmu1; v2 = sr2xx / sr2 - nmu2 * nmu2
      mu1 = nmu1; mu2 = nmu2
    }
    assert(got.getAs[Long]("n") == n.toLong)
    assert(bits(got.getAs[Double]("pi1")) == bits(pi1))
    assert(bits(got.getAs[Double]("mu1")) == bits(mu1))
    assert(bits(got.getAs[Double]("mu2")) == bits(mu2))
    assert(bits(got.getAs[Double]("var1")) == bits(v1))
    assert(bits(got.getAs[Double]("var2")) == bits(v2))
    // two EM rounds from the moment seed move decisively toward the
    // planted components (full convergence takes more rounds)
    assert(mu1 < mu2)
    assert(math.abs(mu1 - 200) < 100 && math.abs(mu2 - 800) < 100)
    assert(math.abs(pi1 - 0.4) < 0.15)
  }
}
