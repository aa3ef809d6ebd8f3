package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Drift/association statistics: KS against brute force, PSI null and
  * shift cases, chi-square against a hand-computed 2×2 table, lag-1
  * autocorrelation against a direct driver-side Pearson, Benford
  * accounting identities. All partition-proof where doubles appear. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("ksTwoSample == brute-force D; zero on identical, max on disjoint") {
    val rnd = new scala.util.Random(7)
    val a = (1 to 300).map(_ => rnd.nextInt(40).toDouble)
    val b = (1 to 200).map(_ => rnd.nextInt(40).toDouble + 5.0)
    val df = (a.map((_, "a")) ++ b.map((_, "b"))).toDF("v", "g")
    val row = Stats.ksTwoSample(df, "v", col("g") === "a", col("g") === "b")
      .collect().head
    // brute force over the merged support
    val vs = (a ++ b).distinct.sorted
    val brute = vs.map(v =>
      math.abs(a.count(_ <= v).toLong * b.size - b.count(_ <= v).toLong * a.size)).max
    assert(row.getAs[Long]("d_num") == brute)
    assert(row.getAs[Long]("n1") == a.size && row.getAs[Long]("n2") == b.size)
    assert(row.getAs[Double]("d_stat") ==
      brute.toDouble / (a.size.toLong * b.size.toLong).toDouble)

    val same = (a.map((_, "a")) ++ a.map((_, "b"))).toDF("v", "g")
    assert(Stats.ksTwoSample(same, "v", col("g") === "a", col("g") === "b")
      .collect().head.getAs[Long]("d_num") == 0L)

    val disj = (a.map((_, "a")) ++ a.map(x => (x + 1000.0, "b"))).toDF("v", "g")
    val dRow = Stats.ksTwoSample(disj, "v", col("g") === "a", col("g") === "b")
      .collect().head
    assert(dRow.getAs[Double]("d_stat") == 1.0)
  }

  test("psiDrift: identical cohorts give exactly 0; a shifted cohort doesn't; partition-proof") {
    val rnd = new scala.util.Random(13)
    val base = (1 to 500).map(_ => rnd.nextInt(10).toLong)
    val same = (base.map((_, "r")) ++ base.map((_, "c"))).toDF("b", "g")
    val nullRow = Stats.psiDrift(same, col("b"), col("g") === "r", col("g") === "c")
      .collect()
    assert(nullRow.forall(_.getAs[Double]("psi_total") == 0.0),
      "identical cohorts must fold to exactly 0.0 (p == q per bin)")

    val shifted = (base.map((_, "r")) ++ base.map(x => ((x + 3) % 10, "c")))
      .toDF("b", "g")
    for (parts <- Seq(1, 7)) {
      val rows = Stats.psiDrift(shifted.repartition(parts), col("b"),
        col("g") === "r", col("g") === "c").collect()
      val total = rows.head.getAs[Double]("psi_total")
      assert(total > 0.01, s"shifted cohort must register drift, got $total")
      assert(rows.forall(_.getAs[Double]("psi_total") == total),
        "psi_total must be identical on every row")
      // the fold equals the contributions summed in bin order
      val byBin = rows.sortBy(_.getAs[Long]("bin"))
        .map(_.getAs[Double]("psi_contrib"))
      assert(byBin.foldLeft(0.0)(_ + _) == total, s"parts=$parts fold drift")
    }
  }

  test("chi2Terms matches the hand-computed 2x2 table and ranks the separator first") {
    // 40 docs: "sig" appears in all 20 positive docs, none of the rest;
    // "common" is everywhere (df = N, excluded by the 0.9N cap);
    // "mid" in half of each class (chi2 = 0)
    val docs = ((1 to 20).map(i => (i.toLong, "en",
      if (i % 2 == 0) "sig mid common" else "sig common filler")) ++
      (21 to 40).map(i => (i.toLong, "de",
        if (i % 2 == 0) "other mid common" else "other common filler")))
      .toDF("doc_id", "lang", "text")
    val got = Stats.chi2Terms(docs, "doc_id", "text", col("lang") === "en",
      minDf = 2L, topK = 10).collect()
    val top = got.head
    assert(top.getAs[String]("term") == "sig" || top.getAs[String]("term") == "other",
      s"perfect separators must rank first, got ${top.getAs[String]("term")}")
    // hand-computed: a=20, b=0, c=0, d=20, N=40 → chi2 = 40
    assert(top.getAs[Double]("chi2") == 40.0)
    val mid = got.find(_.getAs[String]("term") == "mid")
    assert(mid.isDefined && mid.get.getAs[Double]("chi2") == 0.0)
    assert(!got.exists(_.getAs[String]("term") == "common"),
      "df == N term must be excluded by the 0.9N cap")
  }

  test("lagAutocorr == direct Pearson over (prev, cur) pairs; sign sanity") {
    // deterministic sawtooth over 60 steps, value = step pattern amount
    val rows = (1 to 60).map(i =>
      (i, ((i % 7) * 100 + 50).toDouble))
    val df = rows.toDF("step", "amt")
    val got = Stats.lagAutocorr(df, col("step"), col("amt"))
      .collect().head
    // driver-side reference on the same aggregated series
    val series = rows.map(_._2) // one row per step already
    val pairs = series.zip(series.tail).map { case (x, y) => (x, y) }
    val n = pairs.size.toDouble
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val ref = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(got.getAs[Long]("n_pairs") == pairs.size)
    assert(math.abs(got.getAs[Double]("autocorr_lag1") - ref) < 1e-12)
    // strictly increasing series → autocorrelation ≈ 1
    val inc = (1 to 50).map(i => (i, i * 10.0)).toDF("step", "amt")
    assert(Stats.lagAutocorr(inc, col("step"), col("amt"))
      .collect().head.getAs[Double]("autocorr_lag1") > 0.99)
  }

  test("rocAuc == pair-counting probability with half-credit ties") {
    val rnd = new scala.util.Random(31)
    // overlapping distributions with deliberate ties on integer scores
    val pos = (1 to 150).map(_ => (rnd.nextInt(20) + 5).toDouble -> true)
    val neg = (1 to 250).map(_ => rnd.nextInt(20).toDouble -> false)
    val all = pos ++ neg
    val got = Stats.rocAuc(all.toDF("s", "y"), col("s"), col("y"))
      .collect().head
    // brute force: P(s+ > s-) + 0.5 P(s+ == s-)
    var num = 0.0
    for ((sp, _) <- pos; (sn, _) <- neg)
      num += (if (sp > sn) 1.0 else if (sp == sn) 0.5 else 0.0)
    val brute = num / (pos.size.toDouble * neg.size.toDouble)
    assert(got.getAs[Long]("npos") == 150 && got.getAs[Long]("nneg") == 250)
    assert(math.abs(got.getAs[Double]("auc") - brute) < 1e-12,
      s"${got.getAs[Double]("auc")} != $brute")
    // perfect separation → exactly 1.0 (integer arithmetic, no drift)
    val sep = ((1 to 50).map(i => (i + 100.0, true)) ++
      (1 to 50).map(i => (i.toDouble, false))).toDF("s", "y")
    assert(Stats.rocAuc(sep, col("s"), col("y"))
      .collect().head.getAs[Double]("auc") == 1.0)
  }

  test("conformalInterval: qhat is exactly the k-th smallest calibration residual") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 2000).map { i =>
      val x = (rnd.nextInt(90) + 10).toDouble
      (i.toLong, x, 3.0 * x + 7.0 + rnd.nextInt(21) - 10.0)
    }
    val got = Stats.conformalInterval(rows.toDF("id", "x", "y"),
      col("id"), col("x"), col("y"), coverage = 0.9).collect().head
    val slope = got.getAs[Double]("slope")
    val icept = got.getAs[Double]("intercept")
    assert(math.abs(slope - 3.0) < 0.05 && math.abs(icept - 7.0) < 3.0,
      s"OLS off: slope=$slope intercept=$icept")
    // replicate the hash split driver-side and check the order statistic
    val mdd = java.security.MessageDigest.getInstance("MD5")
    def hx(id: String): Long = {
      val hex = mdd.digest(id.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 13)
      java.lang.Long.parseLong(hex, 16)
    }
    val cal = rows.filter(r => hx(r._1.toString) % 2 != 0)
    assert(got.getAs[Long]("n_cal") == cal.size)
    val resid = cal.map { case (_, x, y) =>
      math.abs(y - (icept + slope * x))
    }.sorted
    val k = got.getAs[Long]("k").toInt
    assert(k == math.ceil(0.9 * (cal.size + 1)).toInt)
    assert(got.getAs[Double]("qhat") == resid(k - 1),
      "qhat must be the exact k-th order statistic")
  }

  test("kaplanMeier matches the hand-computed curve with censoring") {
    // durations: events at 2 and 5 (x2), censored at 3 and 8
    val df = Seq((2L, true), (3L, false), (5L, true), (5L, true), (8L, false))
      .toDF("dur", "obs")
    val got = Stats.kaplanMeier(df, col("dur"), col("obs"))
      .orderBy("t_dur").collect()
    assert(got.map(_.getAs[Long]("t_dur")).toSeq == Seq(2L, 5L))
    val r2 = got(0); val r5 = got(1)
    assert(r2.getAs[Long]("n_risk") == 5 && r2.getAs[Long]("d_events") == 1)
    // censored-at-3 subject left the risk set WITHOUT an event row
    assert(r5.getAs[Long]("n_risk") == 3 && r5.getAs[Long]("d_events") == 2)
    assert(r2.getAs[Double]("surv") == 1.0 * (1.0 - 1.0 / 5.0))
    assert(r5.getAs[Double]("surv") ==
      (1.0 * (1.0 - 1.0 / 5.0)) * (1.0 - 2.0 / 3.0))
    // no-censoring sanity: final S = fraction never experiencing event
    val all = Seq((1L, true), (2L, true), (4L, true), (9L, true))
      .toDF("dur", "obs")
    val last = Stats.kaplanMeier(all, col("dur"), col("obs"))
      .orderBy(desc("t_dur")).collect().head
    assert(math.abs(last.getAs[Double]("surv")) < 1e-15)
  }

  test("abTest reproduces the pooled two-proportion z statistic") {
    val units = ((1 to 400).map(i => ("A", i <= 120)) ++
      (1 to 500).map(i => ("B", i <= 110))).toDF("grp", "conv")
    val got = Stats.abTest(units, col("grp") === "A", col("conv"))
      .collect().head
    assert(got.getAs[Long]("n_a") == 400 && got.getAs[Long]("n_b") == 500)
    assert(got.getAs[Long]("conv_a") == 120 && got.getAs[Long]("conv_b") == 110)
    val pa = 120.0 / 400.0; val pb = 110.0 / 500.0
    val pp = 230.0 / 900.0
    val z = (pa - pb) / math.sqrt(pp * (1.0 - pp) * (1.0 / 400.0 + 1.0 / 500.0))
    assert(got.getAs[Double]("p_a") == pa && got.getAs[Double]("p_b") == pb)
    assert(math.abs(got.getAs[Double]("z") - z) < 1e-14)
  }

  test("cupedAdjust: theta recovers the covariate slope and shrinks variance") {
    val rnd = new scala.util.Random(61)
    // y = x + small noise; x varies a lot -> theta ~ 1, big reduction.
    // No true treatment effect: adjusted diff must stay near 0.
    val units = (1 to 2000).map { i =>
      val x = (rnd.nextInt(900) + 100).toDouble
      (i.toLong, i % 2 == 0, x, x + rnd.nextInt(41) - 20.0)
    }.toDF("id", "isA", "x", "y")
    val got = Stats.cupedAdjust(units, col("isA"), col("x"), col("y"))
      .collect().head
    assert(got.getAs[Long]("n") == 2000 && got.getAs[Long]("n_a") == 1000)
    val theta = got.getAs[Double]("theta")
    assert(math.abs(theta - 1.0) < 0.02, s"theta $theta should be ~1")
    assert(got.getAs[Double]("var_reduction_pct") > 95.0,
      "a near-perfect covariate must remove almost all variance")
    assert(math.abs(got.getAs[Double]("diff_adj")) < 2.0,
      "no treatment effect -> adjusted diff ~ 0")
    // identity check: mean_adj_a - mean_adj_b == diff_adj bit-exactly
    assert(got.getAs[Double]("mean_adj_a") - got.getAs[Double]("mean_adj_b")
      == got.getAs[Double]("diff_adj"))
  }

  test("trimmedMean ignores planted outliers; cut points match floor(f*n)") {
    // 100 honest values 1..100 plus 10 absurd outliers
    val rows = ((1 to 100).map(v => ("g", v.toDouble)) ++
      (1 to 10).map(_ => ("g", 1.0e6))).toDF("g", "amt")
    val got = Stats.trimmedMean(rows, "g", col("amt"), trimFrac = 0.1)
      .collect().head
    assert(got.getAs[Long]("n") == 110 && got.getAs[Long]("n_kept") == 88)
    // k = floor(0.1*110) = 11: keep ranks 12..99 → values 12..99
    val kept = (12 to 99).map(_.toDouble)
    assert(got.getAs[Double]("trimmed_mean") == kept.sum / kept.size,
      "outliers must not move the trimmed mean")
  }

  test("quantileNormalize maps shifted groups onto identical decile summaries") {
    // same shape, wildly different location/scale
    val rows = ((1 to 200).map(v => ("a", v.toDouble)) ++
      (1 to 200).map(v => ("b", 5000.0 + 3.0 * v))).toDF("g", "len")
    val got = Stats.quantileNormalize(rows, "g", col("len"))
      .collect()
      .groupBy(_.getAs[String]("g"))
      .map { case (g, rs) =>
        g -> rs.sortBy(_.getAs[Int]("decile"))
          .map(r => (r.getAs[Long]("n"), r.getAs[Double]("lo"),
            r.getAs[Double]("hi"))).toSeq
      }
    assert(got("a") == got("b"),
      s"equal-size groups must normalize to identical deciles:\n$got")
  }

  test("theilSenSlope recovers an exact linear slope and resists outliers") {
    // y = 2x exactly: EVERY pairwise slope is 2 → median exactly 2
    val clean = (1 to 400).map(i => (i.toLong, i.toDouble, 2.0 * i))
      .toDF("id", "x", "y")
    val s1 = Stats.theilSenSlope(clean, col("id"), col("x"), col("y"),
      bucketSize = 20).collect().head
    assert(s1.getAs[Double]("slope_ts") == 2.0)
    // corrupt 10% of ys: the slope MEDIAN holds at 2
    val dirty = (1 to 400).map { i =>
      (i.toLong, i.toDouble, if (i % 10 == 0) 1.0e7 else 2.0 * i)
    }.toDF("id", "x", "y")
    val s2 = Stats.theilSenSlope(dirty, col("id"), col("x"), col("y"),
      bucketSize = 20).collect().head
    assert(s2.getAs[Double]("slope_ts") == 2.0,
      s"10% corruption must not move the median slope, got ${s2.getAs[Double]("slope_ts")}")
  }

  test("concentration: uniform mass -> gini exactly 0; monopoly -> all indices 1; matches brute force") {
    val uniform = (1 to 50).map(k => (k.toLong, 100.0)).toDF("k", "v")
    val u = Stats.concentration(uniform, col("k"), col("v")).collect().head
    assert(u.getAs[Double]("gini") == 0.0)
    assert(u.getAs[Double]("hhi") == 1.0 / 50.0)
    val mono = ((1 to 49).map(k => (k.toLong, 0.01)) :+ (50L, 1.0e6))
      .toDF("k", "v")
    val m = Stats.concentration(mono, col("k"), col("v")).collect().head
    assert(m.getAs[Double]("gini") > 0.95 && m.getAs[Double]("top_share") > 0.999)
    // brute force on random per-key totals
    val rnd = new scala.util.Random(71)
    val rows = (1 to 200).map(k => (k.toLong, (rnd.nextInt(9999) + 1) / 100.0))
    val g = Stats.concentration(rows.toDF("k", "v"), col("k"), col("v"))
      .collect().head.getAs[Double]("gini")
    val s = rows.map(_._2).sorted
    val n = s.size
    val brute = (2.0 * s.zipWithIndex.map { case (x, i) => (i + 1).toDouble * x }.sum
      - (n + 1).toDouble * s.sum) / (n.toDouble * s.sum)
    assert(math.abs(g - brute) < 1e-12, s"$g != $brute")
  }

  test("rfm segments: codes well-formed, customers fully accounted") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val segs = graft.queries.Ext3.queries("x_rfm_segments")(spark,
      "/root/testdata/sf0.001").collect()
    val total = segs.map(_.getAs[Long]("n_customers")).sum
    assert(total == orders.select("o_custkey").distinct().count())
    segs.foreach { r =>
      val code = r.getAs[Int]("segment")
      val (d1, d2, d3) = (code / 100, code / 10 % 10, code % 10)
      assert(Seq(d1, d2, d3).forall(d => d >= 1 && d <= 5), s"bad code $code")
    }
  }

  test("backtest MAE: a perfectly periodic series scores zero error") {
    // value depends only on hour-of-week -> week-168 forecast is exact
    val rows = (0 until 24 * 21).map { h =>
      ("a", h.toLong, ((h % 168) * 3 + 7).toDouble)
    }.toDF("et", "h", "v")
    // inline the operator shape on a pre-bucketed frame
    val hourly = rows.groupBy("et", "h")
      .agg(sum(col("v").cast("decimal(18,2)")).as("v"))
    val hmax = hourly.agg(max("h").as("hmax"))
    val scored = hourly
      .join(hourly.select(col("et"), (col("h") + lit(168L)).as("h"),
        col("v").as("vf")), Seq("et", "h"))
      .crossJoin(broadcast(hmax))
      .where(col("h") > col("hmax") - lit(168L))
      .groupBy("et").agg(
        (sum(abs(col("v") - col("vf"))).cast("string").cast("double") /
          count(lit(1)).cast("double")).as("mae"))
      .collect().head
    assert(scored.getAs[Double]("mae") == 0.0)
  }

  test("permutationTest: planted effect -> minimal p; accounting identity holds") {
    val mdd = java.security.MessageDigest.getInstance("MD5")
    def hx(id: String): Long = java.lang.Long.parseLong(
      mdd.digest(id.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.substring(0, 13), 16)
    // conversion == observed variant (bit 0): the strongest possible
    // effect; every permutation's difference is ~0 -> p = 1/(b+1)
    val units = (1 to 1000).map { i =>
      (i.toLong, (hx(i.toString) & 1L) == 0L)
    }.toDF("id", "conv")
    val got = Stats.permutationTest(units, col("id"), col("conv"), b = 32)
      .collect().head
    assert(got.getAs[Double]("d_obs") == 1.0)
    assert(got.getAs[Long]("n_perm") == 32 && got.getAs[Long]("n_ge") == 0)
    assert(got.getAs[Double]("p_value") == 1.0 / 33.0)
    // identity: p == (n_ge + 1) / (n_perm + 1) by construction
    val rnd = new scala.util.Random(83)
    val nullUnits = (1 to 1000).map(i => (i.toLong, rnd.nextInt(4) == 0))
      .toDF("id", "conv")
    val n0 = Stats.permutationTest(nullUnits, col("id"), col("conv"), b = 32)
      .collect().head
    assert(n0.getAs[Double]("p_value") ==
      (n0.getAs[Long]("n_ge") + 1).toDouble / 33.0)
  }

  test("maxDrawdown matches the hand-computed peak-to-trough") {
    val series = Seq((1, 10.0), (2, 8.0), (3, 12.0), (4, 5.0), (5, 9.0))
      .toDF("step", "amt")
    val got = Stats.maxDrawdown(series, col("step"), col("amt"))
      .collect().head
    assert(got.getAs[Long]("n_steps") == 5)
    assert(got.getAs[Double]("max_dd") == 7.0)
    assert(got.getAs[Double]("max_dd_pct") == 7.0 / 12.0)
    // monotone series never draws down
    val up = (1 to 10).map(i => (i, i * 10.0)).toDF("step", "amt")
    assert(Stats.maxDrawdown(up, col("step"), col("amt"))
      .collect().head.getAs[Double]("max_dd") == 0.0)
  }

  test("rrf fusion: scores recompute from ranks, ordering respected") {
    val rows = graft.queries.Ext3.queries("x_rrf_hybrid")(spark,
      "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    var prev = Double.MaxValue
    rows.foreach { r =>
      val rt = Option(r.getAs[Integer]("r_text")).map(_.toInt)
      val rv = Option(r.getAs[Integer]("r_vec")).map(_.toInt)
      assert(rt.isDefined || rv.isDefined, "fused doc must appear in a list")
      val expect = rt.map(x => 1.0 / (60 + x).toDouble).getOrElse(0.0) +
        rv.map(x => 1.0 / (60 + x).toDouble).getOrElse(0.0)
      assert(r.getAs[Double]("rrf") == expect)
      assert(r.getAs[Double]("rrf") <= prev, "must be rrf-descending")
      prev = r.getAs[Double]("rrf")
    }
  }

  test("anovaF: identical groups -> F ~ 0; separated means -> large F; matches closed form") {
    // three groups with the SAME values: SSB is exactly 0
    val same = (1 to 300).map(i => (s"g${i % 3}", ((i / 3) % 50 + 1).toDouble))
      .toDF("g", "v")
    val s0 = Stats.anovaF(same, "g", col("v")).collect().head
    assert(math.abs(s0.getAs[Double]("ssb")) < 1e-6 * s0.getAs[Double]("ssw"),
      "identical groups must have ~zero between-group variance")
    // strongly separated means
    val sep = ((1 to 100).map(i => ("a", 10.0 + (i % 5))) ++
      (1 to 100).map(i => ("b", 500.0 + (i % 5)))).toDF("g", "v")
    val s1 = Stats.anovaF(sep, "g", col("v")).collect().head
    assert(s1.getAs[Long]("k") == 2 && s1.getAs[Long]("n") == 200)
    // closed form with the same op order
    val a = (1 to 100).map(i => 10.0 + (i % 5))
    val b = (1 to 100).map(i => 500.0 + (i % 5))
    val tSum = (a.sum * a.sum) / 100.0 + (b.sum * b.sum) / 100.0
    val all = a ++ b
    val ssb = tSum - (all.sum * all.sum) / 200.0
    val ssw = all.map(x => x * x).sum - tSum
    val f = (ssb / 1.0) / (ssw / 198.0)
    assert(math.abs(s1.getAs[Double]("f_stat") - f) < 1e-9 * f,
      s"${s1.getAs[Double]("f_stat")} != $f")
  }

  test("welchT: identical samples -> t ~ 0; shifted mean -> matches closed form") {
    val same = (1 to 200).map(i =>
      (if (i % 2 == 0) "a" else "b", (i % 25 + 1).toDouble)).toDF("g", "v")
    val r0 = Stats.welchT(same, col("g") === "a", col("g") === "b",
      col("v")).collect().head
    assert(math.abs(r0.getAs[Double]("t_stat")) < 1e-9,
      "same distribution per side must give t ~ 0")
    // shifted: closed form with the same op order
    val df = ((1 to 60).map(i => ("a", 100.0 + (i % 7))) ++
      (1 to 40).map(i => ("b", 80.0 + (i % 7)))).toDF("g", "v")
    val r1 = Stats.welchT(df, col("g") === "a", col("g") === "b",
      col("v")).collect().head
    val a = (1 to 60).map(i => 100.0 + (i % 7))
    val b = (1 to 40).map(i => 80.0 + (i % 7))
    def v(xs: Seq[Double]) =
      (xs.map(x => x * x).sum - xs.sum * xs.sum / xs.size) / (xs.size - 1)
    val (ua, ub) = (v(a) / a.size, v(b) / b.size)
    val t = (a.sum / a.size - b.sum / b.size) / math.sqrt(ua + ub)
    val dfw = (ua + ub) * (ua + ub) /
      (ua * ua / (a.size - 1) + ub * ub / (b.size - 1))
    assert(math.abs(r1.getAs[Double]("t_stat") - t) < 1e-9 * math.abs(t))
    assert(math.abs(r1.getAs[Double]("df_welch") - dfw) < 1e-9 * dfw)
    assert(r1.getAs[Double]("cohens_d") > 0, "a's mean is higher")
  }

  test("cramersV: independent table -> chi2 ~ 0; perfect association -> V = 1") {
    // counts with exact product structure: P(r,c) = P(r)P(c)
    val ind = (for { r <- 1 to 3; c <- 1 to 4; k <- 1 to (r * c) }
      yield (s"r$r", s"c$c")).toDF("r", "c")
    val i0 = Stats.cramersV(ind, col("r"), col("c")).collect().head
    assert(math.abs(i0.getAs[Double]("chi2")) < 1e-9,
      "product-structured table must have zero chi-square")
    // diagonal 2x2: V must be exactly 1
    val diag = ((1 to 30).map(_ => ("x", "u")) ++
      (1 to 20).map(_ => ("y", "w"))).toDF("r", "c")
    val d0 = Stats.cramersV(diag, col("r"), col("c")).collect().head
    assert(d0.getAs[Long]("n") == 50 && d0.getAs[Long]("rk") == 2)
    assert(math.abs(d0.getAs[Double]("cramers_v") - 1.0) < 1e-12,
      s"diagonal table must give V = 1, got ${d0.getAs[Double]("cramers_v")}")
  }

  test("mannWhitneyU: U matches brute-force pair counting; identical sides -> z ~ 0") {
    val av = (1 to 40).map(i => (i % 9 + 1).toDouble)
    val bv = (1 to 30).map(i => (i % 11 + 3).toDouble)
    val df = (av.map(("a", _)) ++ bv.map(("b", _))).toDF("g", "v")
    val r = Stats.mannWhitneyU(df, col("g") === "a", col("g") === "b",
      "v").collect().head
    // brute force: U_A = #{a > b} + half the ties
    val gt = (for { a <- av; b <- bv } yield
      if (a > b) 1.0 else if (a == b) 0.5 else 0.0).sum
    // U from rank sums counts pairs where A ranks ABOVE B (a < b in value
    // ascending => smaller rank); our r2a form is the rank-sum U_A
    val ua = r.getAs[Double]("u_stat")
    assert(ua == gt, s"u_stat $ua != brute-force $gt")
    assert(r.getAs[Long]("na") == 40 && r.getAs[Long]("nb") == 30)
    // identical sides
    val same = ((1 to 50) ++ (1 to 50)).zipWithIndex
      .map { case (v, i) => (if (i < 50) "a" else "b", (v % 10).toDouble) }
      .toDF("g", "v")
    val r0 = Stats.mannWhitneyU(same, col("g") === "a", col("g") === "b",
      "v").collect().head
    assert(math.abs(r0.getAs[Double]("z_stat")) < 1e-9)
  }

  test("kruskalWallis: identical groups -> H ~ 0; matches midrank closed form") {
    val data = ((1 to 60).map(i => ("a", (i % 7 + 1).toDouble)) ++
      (1 to 50).map(i => ("b", (i % 5 + 4).toDouble)) ++
      (1 to 40).map(i => ("c", (i % 9 + 2).toDouble)))
    val r = Stats.kruskalWallis(data.toDF("g", "v"), "g", "v")
      .collect().head
    // closed form via explicit midranks
    val all = data.map(_._2).sorted
    val rankOf = all.distinct.map { v =>
      val lo = all.indexWhere(_ == v); val hi = all.lastIndexWhere(_ == v)
      v -> (lo + hi + 2) / 2.0
    }.toMap
    val n = data.size.toDouble
    val tSum = data.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, xs) =>
      val rg = xs.map(x => rankOf(x._2)).sum
      rg * rg / xs.size
    }.sum
    val ties = all.groupBy(identity).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val h0 = 12.0 / (n * (n + 1.0)) * tSum - 3.0 * (n + 1.0)
    val h = h0 / (1.0 - ties / (n * n * n - n))
    assert(math.abs(r.getAs[Double]("h_stat") - h) < 1e-9 * math.abs(h),
      s"${r.getAs[Double]("h_stat")} != $h")
    val same = (1 to 300).map(i => (s"g${i % 3}", ((i / 3) % 20).toDouble))
    val r0 = Stats.kruskalWallis(same.toDF("g", "v"), "g", "v")
      .collect().head
    assert(math.abs(r0.getAs[Double]("h_stat")) < 1e-9)
  }

  test("spearmanRho: monotone -> 1, reversed -> -1, ties match midrank Pearson") {
    val mono = (1 to 100).map(i => (i.toDouble, math.exp(i / 25.0)))
      .toDF("x", "y")
    val r1 = Stats.spearmanRho(mono, col("x"), col("y")).collect().head
    assert(math.abs(r1.getAs[Double]("rho") - 1.0) < 1e-12)
    val rev = (1 to 100).map(i => (i.toDouble, -3.0 * i + 7)).toDF("x", "y")
    val r2 = Stats.spearmanRho(rev, col("x"), col("y")).collect().head
    assert(math.abs(r2.getAs[Double]("rho") + 1.0) < 1e-12)
    // ties on both sides vs midrank Pearson computed explicitly
    val data = (1 to 90).map(i => ((i % 6 + 1).toDouble, (i % 4 + 1).toDouble))
    def midranks(xs: Seq[Double]): Seq[Double] = {
      val sorted = xs.sorted
      val m = xs.distinct.map { v =>
        val lo = sorted.indexWhere(_ == v)
        val hi = sorted.lastIndexWhere(_ == v)
        v -> (lo + hi + 2) / 2.0
      }.toMap
      xs.map(m)
    }
    val rx = midranks(data.map(_._1)); val ry = midranks(data.map(_._2))
    val n = data.size.toDouble
    val num = n * rx.zip(ry).map { case (a, b) => a * b }.sum -
      rx.sum * ry.sum
    val den = math.sqrt(n * rx.map(a => a * a).sum - rx.sum * rx.sum) *
      math.sqrt(n * ry.map(b => b * b).sum - ry.sum * ry.sum)
    val r3 = Stats.spearmanRho(data.toDF("x", "y"), col("x"), col("y"))
      .collect().head
    assert(math.abs(r3.getAs[Double]("rho") - num / den) < 1e-12,
      s"${r3.getAs[Double]("rho")} != ${num / den}")
  }

  test("mutualInfo: independent -> ~0, identical -> H(X), contributions fold to total") {
    // product-structured counts: MI must be ~0 (every cell ratio is 1)
    val ind = (for { x <- 1 to 3; y <- 1 to 4; k <- 1 to (x * y) }
      yield (s"x$x", s"y$y")).toDF("a", "b")
    val mi0 = Stats.mutualInfo(ind, col("a"), col("b"))
      .select("mi_total").distinct().collect().head.getDouble(0)
    assert(math.abs(mi0) < 1e-12, s"independent table gave MI $mi0")
    // X vs X: MI = H(X)
    val self = ((1 to 50).map(_ => "u") ++ (1 to 30).map(_ => "v") ++
      (1 to 20).map(_ => "w")).toDF("a").withColumn("b", col("a"))
    val mi1 = Stats.mutualInfo(self, col("a"), col("b"))
      .select("mi_total").distinct().collect().head.getDouble(0)
    val h = -Seq(0.5, 0.3, 0.2).map(p => p * math.log(p)).sum
    assert(math.abs(mi1 - h) < 1e-9, s"MI(X,X)=$mi1 != H(X)=$h")
  }

  test("jsDivergence: identical -> 0, disjoint -> ln 2, symmetric") {
    val even = (1 to 400).map(i =>
      (s"k${i % 5}", if (i % 2 == 0) "A" else "B")).toDF("k", "c")
    val j0 = Stats.jsDivergence(even, col("k"), col("c") === "A",
      col("c") === "B").collect().head.getAs[Double]("js_nats")
    assert(math.abs(j0) < 1e-12, s"identical mixes gave JS $j0")
    val disj = ((1 to 60).map(i => (s"p${i % 3}", "A")) ++
      (1 to 90).map(i => (s"q${i % 4}", "B"))).toDF("k", "c")
    val j1 = Stats.jsDivergence(disj, col("k"), col("c") === "A",
      col("c") === "B").collect().head.getAs[Double]("js_nats")
    assert(math.abs(j1 - math.log(2.0)) < 1e-9,
      s"disjoint supports must give ln 2, got $j1")
    val skew = ((1 to 50).map(i => (s"k${i % 7}", "A")) ++
      (1 to 80).map(i => (s"k${i % 3}", "B"))).toDF("k", "c")
    val f = Stats.jsDivergence(skew, col("k"), col("c") === "A",
      col("c") === "B").collect().head.getAs[Double]("js_nats")
    val r = Stats.jsDivergence(skew, col("k"), col("c") === "B",
      col("c") === "A").collect().head.getAs[Double]("js_nats")
    assert(math.abs(f - r) < 1e-12, s"JS must be symmetric: $f vs $r")
    assert(f > 0 && f < math.log(2.0))
  }

  test("benfordDigits: counts account for every row >= 1, fractions sum to 1") {
    val amts = Seq(123.4, 19.99, 190.0, 2.5, 234.0, 345.6, 91.0, 0.4, 876.0)
      .map(Tuple1(_)).toDF("amt")
    val rows = Stats.benfordDigits(amts, col("amt")).collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == 8, "0.4 has no leading integer digit and must be excluded")
    val byDigit = rows.map(r => r.getAs[Int]("digit") -> r.getAs[Long]("n")).toMap
    assert(byDigit(1) == 3 && byDigit(2) == 2 && byDigit(9) == 1)
    assert(math.abs(rows.map(_.getAs[Double]("obs_frac")).sum - 1.0) < 1e-12)
    // expected law fractions are the Scala-side literals
    rows.foreach { r =>
      val d = r.getAs[Int]("digit")
      assert(r.getAs[Double]("exp_frac") == Stats.benfordExpected(d - 1))
    }
  }

  test("changepointSplit: recovers a planted level shift; constant ties to k=1") {
    // key "shift": 10 steps at 2.00 then 15 steps at 9.00 -> split k=10
    val shift = (1 to 10).map(i => ("shift", i, 2.0)) ++
      (11 to 25).map(i => ("shift", i, 9.0))
    // key "flat": constant series -> every candidate scores EXACTLY
    //   c^2*n (sk=k*c makes num = k(n-k)c^2*n), tie-break picks k=1
    val flat = (1 to 12).map(i => ("flat", i, 5.0))
    // key "lone": single step -> no candidate split, key absent
    val df = (shift ++ flat :+ (("lone", 1, 7.0)))
      .toDF("key", "stp", "v")
    val got = Stats.changepointSplit(df, "key", col("stp"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getInt(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == Set("shift", "flat"))
    val (k, n, mb, ma) = got("shift")
    assert(k == 10 && n == 25 && mb == 2.0 && ma == 9.0,
      s"planted shift not localized: $k $n $mb $ma")
    assert(got("flat")._1 == 1, s"constant-series tie must break to k=1")
    // noisy series still splits at the planted boundary
    val rnd = new scala.util.Random(3)
    val noisy = (1 to 20).map(i => ("n1", i, 10.0 + rnd.nextInt(3))) ++
      (21 to 40).map(i => ("n1", i, 50.0 + rnd.nextInt(3)))
    val gk = Stats.changepointSplit(noisy.toDF("key", "stp", "v"),
      "key", col("stp"), col("v")).collect()(0).getInt(2)
    assert(gk == 20, s"noisy shift split at $gk, want 20")
  }

  test("seasonalDecompose: linear trend + zero-mean periodic recovered exactly") {
    // v_t = 10t + s(t mod 4) with s = (0, 5, -3, -2): a 2x4 centered MA
    // reproduces the linear part exactly and mean(s)=0, so the
    // detrended value IS the seasonal component, bit-for-bit
    val s = Array(0.0, 5.0, -3.0, -2.0)
    val df = (1 to 24).map(t => ("m", t, 10.0 * t + s(t % 4)))
      .toDF("key", "stp", "v")
    val got = Stats.seasonalDecompose(df, "key", col("stp"),
        step => step % 4, col("v"), period = 4)
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(0, 1, 2, 3))
    (0 to 3).foreach { p =>
      assert(got(p)._2 == s(p), s"phase $p: ${got(p)._2} != ${s(p)}")
    }
    // full-window trimming: t=1..24 minus 2 edges each side = 20 obs,
    // phases of t=3..22 -> each phase seen 5 times
    assert(got.values.map(_._1).toSeq.sorted == Seq(5L, 5L, 5L, 5L))
    // a key with too few steps contributes nothing
    val tiny = (1 to 4).map(t => ("t", t, 1.0)).toDF("key", "stp", "v")
    assert(Stats.seasonalDecompose(tiny, "key", col("stp"),
      step => step % 4, col("v"), period = 4).count() == 0)
  }

  test("isotonicRates == plain-Scala PAVA; monotone; mass-preserving") {
    // per-bin (pos, n) with deliberate violations [.5, .2, .8, .3, .9]
    val bins = Seq(("k", 0, 5L, 10L), ("k", 1, 2L, 10L), ("k", 2, 8L, 10L),
      ("k", 3, 3L, 10L), ("k", 4, 9L, 10L),
      // a second key, already monotone -> identity
      ("m", 0, 1L, 10L), ("m", 1, 5L, 10L), ("m", 2, 9L, 10L))
    val rows = bins.flatMap { case (k, b, p, n) =>
      (0 until n.toInt).map(i => (k, b, if (i < p) 1L else 0L))
    }
    val got = Stats.isotonicRates(rows.toDF("key", "bin", "y"),
        "key", "bin", col("y"), lit(1L))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // plain-Scala PAVA reference
    def pava(xs: Seq[(Long, Long)]): Seq[Double] = {
      val pools = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
      xs.foreach { case (p, n) =>
        var (cp, cn, cc) = (p, n, 1)
        while (pools.nonEmpty && pools.last._1 * cn > cp * pools.last._2) {
          val (pp, pn, pc) = pools.remove(pools.size - 1)
          cp += pp; cn += pn; cc += pc
        }
        pools += ((cp, cn, cc))
      }
      pools.flatMap { case (p, n, c) =>
        Seq.fill(c)(p.toDouble / n.toDouble) }.toSeq
    }
    Seq("k", "m").foreach { key =>
      val mine = bins.filter(_._1 == key).sortBy(_._2)
      val ref = pava(mine.map(b => (b._3, b._4)))
      mine.zip(ref).foreach { case ((_, b, p, n), r) =>
        assert(got((key, b)) == ((p, n, r)), s"$key bin $b: ${got((key, b))} != $r")
      }
      // monotone non-decreasing; pooled mass preserved
      val rates = mine.map(b => got((key, b._2))._3)
      assert(rates.zip(rates.tail).forall { case (a2, b2) => a2 <= b2 })
      val mass = mine.map { case (_, b, _, n) => got((key, b))._3 * n }.sum
      assert(math.abs(mass - mine.map(_._3).sum) < 1e-9, "mass drifted")
    }
    // the already-monotone key must come back untouched
    assert(got(("m", 0))._3 == 0.1 && got(("m", 1))._3 == 0.5 &&
      got(("m", 2))._3 == 0.9)
  }
}
