package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graphs, Keywords, LangModel, Privacy, Ranking, Stats}

/** Round-6 eval-wave semantics against hand-computed references:
  * NDCG/MRR on tiny rankings with known ideal orderings, Naive Bayes
  * margins on a separable toy corpus (incl. unseen-token behavior),
  * Brown–Forsythe on groups with engineered spreads, and the Zipf fit
  * on an exact power-law frequency profile. */
class Wave9Spec extends SparkSpec {
  import spark.implicits._

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("ndcgAtK: perfect ranking scores 1, adversarial ranking matches hand DCG") {
    // q1: scores rank rel docs first -> ndcg = 1
    // q2: the two relevant docs sit at ranks 3 and 4 of 4
    val cands = Seq(
      ("q1", 1L, 9.0, 1L), ("q1", 2L, 8.0, 1L), ("q1", 3L, 7.0, 0L),
      ("q2", 1L, 9.0, 0L), ("q2", 2L, 8.0, 0L), ("q2", 3L, 7.0, 1L),
      ("q2", 4L, 6.0, 1L),
    ).toDF("q", "doc", "score", "gain")
    val got = Ranking.ndcgAtK(cands, "q", "doc", "score", "gain", k = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(got("q1")._5 == 1.0, s"perfect ranking must be 1, got ${got("q1")}")
    val dcg2 = 1.0 / log2(4.0) + 1.0 / log2(5.0)
    val idcg2 = 1.0 / log2(2.0) + 1.0 / log2(3.0)
    assert(math.abs(got("q2")._3 - dcg2) < 1e-12, s"dcg ${got("q2")._3} vs $dcg2")
    assert(math.abs(got("q2")._5 - dcg2 / idcg2) < 1e-12, s"got ${got("q2")}")
    assert(got("q2")._1 == 4L && got("q2")._2 == 2L)
  }

  test("ndcgAtK: graded gains use the candidate set's own ideal ordering") {
    // gains 3,1,2 by score order; ideal is 3,2,1
    val cands = Seq(("q", 1L, 9.0, 3L), ("q", 2L, 8.0, 1L), ("q", 3L, 7.0, 2L))
      .toDF("q", "doc", "score", "gain")
    val r = Ranking.ndcgAtK(cands, "q", "doc", "score", "gain", 10).collect()(0)
    val dcg = 3.0 / log2(2.0) + 1.0 / log2(3.0) + 2.0 / log2(4.0)
    val idcg = 3.0 / log2(2.0) + 2.0 / log2(3.0) + 1.0 / log2(4.0)
    assert(math.abs(r.getDouble(3) - dcg) < 1e-12)
    assert(math.abs(r.getDouble(5) - dcg / idcg) < 1e-12)
  }

  test("mrrAtK: first position, reciprocal literals, precision and recall") {
    val cands = Seq(
      ("q1", 1L, 9.0, false), ("q1", 2L, 8.0, true), ("q1", 3L, 7.0, true),
      ("q2", 1L, 9.0, false), ("q2", 2L, 8.0, false),
    ).toDF("q", "doc", "score", "rel")
    val got = Ranking.mrrAtK(cands, "q", "doc", "score", "rel", k = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("q1").getLong(1) == 2L)
    assert(got("q1").getInt(2) == 2)
    assert(got("q1").getDouble(3) == 0.5)
    assert(got("q1").getDouble(4) == 0.2) // 2 hits / k=10
    assert(got("q1").getDouble(5) == 1.0) // 2 hits / 2 relevant
    assert(got("q2").isNullAt(2) && got("q2").getDouble(3) == 0.0)
    assert(got("q2").isNullAt(5)) // no relevant at all -> recall NULL
  }

  test("mrrAtK: relevant doc below rank k does not count") {
    val cands = (1 to 12).map(i => ("q", i.toLong, 100.0 - i, i == 12))
      .toDF("q", "doc", "score", "rel")
    val r = Ranking.mrrAtK(cands, "q", "doc", "score", "rel", k = 10).collect()(0)
    assert(r.isNullAt(2) && r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
    assert(r.getDouble(5) == 0.0) // 0 hits / 1 relevant
  }

  test("naiveBayesMargin: separable corpus classifies held-out docs; unseen tokens are neutral") {
    // train: pos docs say "good", neg docs say "bad"; test docs repeat
    // one class word (plus one UNSEEN token, which must not move the
    // margin's token sum)
    val docs = Seq(
      (0L, "good good good", "pos"), (2L, "good good", "pos"),
      (1L, "bad bad bad", "neg"), (3L, "bad bad", "neg"),
      (10L, "good good novelword", "pos"), // test
      (11L, "bad bad", "neg"),             // test
    ).toDF("doc_id", "text", "lab")
    val got = LangModel.naiveBayesMargin(docs, "doc_id", "text",
        col("lab") === "pos", col("doc_id") < 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(got(10L)._3 && got(10L)._4, s"pos test doc misclassified: $got")
    assert(!got(11L)._3 && got(11L)._4, s"neg test doc misclassified: $got")
    // hand margin for doc 11: prior ln(2/2)=0; per 'bad' token
    // ln((0+1)/(5+1)); den term 2*(ln(5+2)-ln(5+2))=0 => 2*ln(1/6)
    val expect11 = 2.0 * math.log(1.0 / 6.0)
    assert(math.abs(got(11L)._2 - expect11) < 1e-9,
      s"margin ${got(11L)._2} vs $expect11")
    // unseen token contributes ln(1)-ln(1) = 0 exactly: doc 10's margin
    // equals the two-'good'-token doc margin
    val expect10 = 2.0 * math.log(6.0 / 1.0)
    assert(math.abs(got(10L)._2 - expect10) < 1e-9)
  }

  test("brownForsythe: spread difference drives F, equal spreads zero SSB") {
    // g1 tight around 10, g2 wide around 10 -> medians equal, |dev|
    // means differ -> SSB > 0 and F > 1
    val df = Seq(
      ("g1", 9.0), ("g1", 10.0), ("g1", 11.0), ("g1", 10.0), ("g1", 10.0),
      ("g2", 2.0), ("g2", 10.0), ("g2", 18.0), ("g2", 1.0), ("g2", 19.0),
    ).toDF("g", "v")
    val r = Stats.brownForsythe(df, "g", col("v")).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 10L)
    assert(r.getDouble(4) > 1.0, s"expected F > 1, got $r")

    // identical value multisets -> identical z multisets -> SSB = 0
    val same = Seq(("a", 1.0), ("a", 5.0), ("a", 9.0),
      ("b", 1.0), ("b", 5.0), ("b", 9.0)).toDF("g", "v")
    val r2 = Stats.brownForsythe(same, "g", col("v")).collect()(0)
    assert(math.abs(r2.getDouble(2)) < 1e-9, s"ssb must be 0, got $r2")
  }

  test("brownForsythe: even-count group uses the lo/hi central pair") {
    // group a: values 1,2,3,4 -> med2 = (2+3)*100*? in cents: lo=200,
    // hi=300 -> z of value 1 = |200-500| = 300 half-cents
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0)).toDF("g", "v")
    val r = Stats.brownForsythe(df, "g", col("v")).collect()(0)
    // z for a: |2c-500| = {300,100,100,300}; b: all 0
    // SSW_a = sum z^2 - (sum z)^2/4 = 200000 - 640000/4 = 40000
    assert(r.getLong(1) == 7L)
    assert(math.abs(r.getDouble(3) - 40000.0) < 1e-6, s"ssw: $r")
  }

  test("zipfSlope: exact power law recovers slope -1 within fixed-point tolerance") {
    // freq(rank r) = round(1024 / r) for ranks 1..8 via repeated words
    val words = (1 to 8).flatMap { r =>
      val f = math.round(1024.0 / r).toInt
      Seq.fill(f)(s"w$r")
    }
    // shuffle deterministically so rank order comes from counts, not input order
    val text = new scala.util.Random(7).shuffle(words.toList).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = LangModel.zipfSlope(df, "doc_id", "text", topN = 8).collect()(0)
    assert(r.getLong(0) == 8L)
    assert(math.abs(r.getDouble(1) - (-1.0)) < 0.01,
      s"slope ${r.getDouble(1)} not ~ -1")
    assert(math.abs(r.getDouble(2) - math.log(1024.0)) < 0.02,
      s"intercept ${r.getDouble(2)} not ~ ln 1024")
  }

  test("dpNoisyCounts: deterministic per salt, fresh draw per salt, Laplace shape") {
    val df = Seq.tabulate(100)(i => (s"k${i % 4}", i)).toDF("k", "v")
    def run(salt: String) = Privacy.dpNoisyCounts(df, "k", 1.0, salt)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    val a = run("s1"); val b = run("s1"); val c = run("s2")
    assert(a == b, "same salt must replay identically")
    assert(a.keySet == c.keySet && a.exists { case (k, v) => c(k)._2 != v._2 },
      "different salt must redraw the noise")
    a.foreach { case (k, (n, noise, rel)) =>
      assert(n == 25L)
      assert(rel == n.toDouble + noise, s"$k release must be n + noise")
      // inverse-CDF range: |noise| <= (1/eps) ln(65536)
      assert(math.abs(noise) <= math.log(65536.0) + 1e-9, s"$k noise $noise")
    }
  }

  test("collocationsG2: a planted always-together bigram dominates independent pairs") {
    // 'new york' always adjacent; filler words shuffled independently
    val rnd = new scala.util.Random(11)
    val docs = (0 until 40).map { i =>
      val filler = rnd.shuffle(List("alpha", "beta", "gamma", "delta"))
      (i.toLong, (filler.take(2) ++ List("new", "york") ++ filler.drop(2))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val top = LangModel.collocationsG2(docs, "doc_id", "text",
      minCount = 5L, k = 5).collect()
    assert(top(0).getString(0) == "new" && top(0).getString(1) == "york",
      s"expected (new, york) first, got ${top.toSeq}")
    assert(top(0).getDouble(3) > top(1).getDouble(3),
      "planted pair must strictly dominate")
    assert(top.forall(_.getDouble(3) >= 0.0), "G2 is non-negative")
  }

  test("randomWalks: every transition is a real edge, deterministic, one walk per node") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"), ("b", "d"))
      .toDF("s", "t")
    val w1 = Graphs.randomWalks(edges, "s", "t", steps = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    val w2 = Graphs.randomWalks(edges, "s", "t", steps = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    assert(w1.toSeq == w2.toSeq, "walks must be deterministic")
    assert(w1.map(_._1).toSeq == Seq("a", "b", "c", "d"), "one walk per node")
    val und = Set(("a","b"),("b","c"),("c","d"),("a","d"),("b","d"))
      .flatMap { case (x, y) => Set((x, y), (y, x)) }
    w1.foreach { case (s0, s1, s2, s3) =>
      assert(und((s0, s1)) && und((s1, s2)) && und((s2, s3)),
        s"non-edge transition in walk ($s0,$s1,$s2,$s3)")
    }
  }

  test("rakeKeywords: stopword-split phrases score summed deg/freq") {
    val docs = Seq(
      (1L, "deep learning is a great field"),
      (2L, "deep learning is the future"),
    ).toDF("doc_id", "text")
    val got = Keywords.rakeKeywords(docs, "doc_id", "text",
        stopwords = Seq("is", "a", "the"), maxWords = 3, k = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // phrases: 'deep learning' x2, 'great field', 'future'
    // freq: deep 2, learning 2, great 1, field 1, future 1
    // deg:  deep 4, learning 4, great 2, field 2, future 1
    assert(got("deep learning") == ((2L, 4.0)), s"got $got")
    assert(got("great field") == ((1L, 4.0)))
    assert(got("future") == ((1L, 1.0)))
  }

  test("countMinEstimates: estimates never undercount and are exact without collisions") {
    val terms = Seq.tabulate(300)(i => s"t${i % 3}") // 3 terms, 100 each
    val df = terms.toDF("t")
    val got = graft.operators.Sketches
      .countMinEstimates(df, col("t"), depth = 4, width = 256, topK = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set("t0", "t1", "t2"))
    got.values.foreach { case (tr, est, over) =>
      assert(tr == 100L && est >= tr && over == est - tr,
        s"CMS must never undercount: $got")
    }
    // 3 distinct terms in a 256-wide sketch: some row must be collision-
    // free, so the min-estimate is exact
    assert(got.values.forall(_._2 == 100L), s"expected exact estimates: $got")
  }

  test("shannonDiversity: uniform mix hits ln k, single category is zero") {
    val df = (Seq.tabulate(40)(i => ("balanced", s"c${i % 4}")) ++
      Seq.fill(10)(("mono", "only"))).toDF("g", "c")
    val got = Stats.shannonDiversity(df, "g", "c")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("balanced")._1 == 4L && got("balanced")._2 == 40L)
    assert(math.abs(got("balanced")._3 - math.log(4.0)) < 1e-9,
      s"uniform 4-way mix must score ln 4: $got")
    assert(got("mono") == ((1L, 10L, 0.0)), s"single category: $got")
  }

  test("confusionMatrix: diagonal row_frac is recall, col_frac is precision") {
    // actual a: 3 rows (2 predicted a, 1 predicted b); actual b: 1 row -> b
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"))
      .toDF("y", "p")
    val got = Ranking.confusionMatrix(df, col("y"), col("p"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(("a", "a")) == ((2L, 2.0 / 3.0, 1.0)), s"got $got")
    assert(got(("a", "b")) == ((1L, 1.0 / 3.0, 0.5)))
    assert(got(("b", "b")) == ((1L, 1.0, 0.5)))
  }

  test("cvOls: exact linear data recovers the line with zero MAE in every fold") {
    val df = Seq.tabulate(100)(i =>
      (i.toLong, (i % 10 + 1).toDouble, 2.0 * (i % 10 + 1) + 5.0))
      .toDF("id", "x", "y")
    val got = Stats.cvOls(df, col("id"), col("x"), col("y"), k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L))
    got.values.foreach { case (n, slope, icept, mae) =>
      assert(n == 20L)
      assert(math.abs(slope - 2.0) < 1e-9, s"slope $slope")
      // intercept in cents: y_c = 100*icept_y + slope*x_c -> 500
      assert(math.abs(icept - 500.0) < 1e-6, s"intercept $icept")
      assert(mae < 1e-6, s"exact fit must have ~0 MAE, got $mae")
    }
  }

  test("sprt: a strong planted effect reaches accept_h1, a null reaches accept_h0") {
    import java.sql.Timestamp
    def ts(hr: Int, m: Int) = new Timestamp((hr * 3600L + m * 60L) * 1000L)
    // variant is md5(user)%2: build streams per user and check decisions
    // user pool A converts always, pool B never; both variants get both
    // pools mixed, but we plant asymmetry by volume
    val rows = (0 until 400).map { i =>
      val user = i % 20
      val conv = user < 10 // half the users always convert
      (user.toLong, ts(i / 20, i % 20),
        if (conv) "purchase" else "click")
    }.toDF("user_id", "ts", "event_type")
    val got = graft.operators.EventOps.sprt(rows, "user_id", "ts",
        "event_type", "purchase", Seq("click", "purchase"),
        p0 = 0.10, p1 = 0.15, alpha = 0.05, beta = 0.05)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.isNullAt(3), r.getString(4))).toMap
    // ~50% conversion >> p1 in both variants: both must accept H1, fast
    got.values.foreach { case (t, s, noDecision, dec) =>
      assert(!noDecision && dec == "accept_h1",
        s"50%-conversion stream must accept H1: $got")
      assert(s * 2 >= t - 40, s"sanity: roughly half successes: $got")
    }
  }

  test("sprt: all-failure stream accepts H0") {
    import java.sql.Timestamp
    def ts(hr: Int, m: Int) = new Timestamp((hr * 3600L + m * 60L) * 1000L)
    val rows = (0 until 200).map(i =>
      ((i % 8).toLong, ts(i / 8, i % 8), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = graft.operators.EventOps.sprt(rows, "user_id", "ts",
        "event_type", "purchase", Seq("click", "purchase"),
        p0 = 0.10, p1 = 0.15, alpha = 0.05, beta = 0.05)
      .collect()
    got.foreach { r =>
      assert(r.getString(4) == "accept_h0", s"no-conversion stream: $r")
      assert(r.getLong(2) == 0L)
    }
  }

  test("watermarkDetect: unbiased text stays under threshold, z matches hand formula") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two"),
    ).toDF("doc_id", "text")
    val got = LangModel.watermarkDetect(docs, "doc_id", "text", 4.0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4), r.getBoolean(5))).toMap
    assert(got(1L)._1 == 9L && got(2L)._1 == 1L)
    got.foreach { case (_, (n, g, z, flag)) =>
      val expect = (2.0 * g - n) / math.sqrt(n.toDouble)
      assert(z == expect, s"z must be the exact closed form")
      assert(flag == (z > 4.0))
    }
    // single-token docs are absent by construction
    val single = LangModel.watermarkDetect(
      Seq((9L, "lonely")).toDF("doc_id", "text"), "doc_id", "text", 4.0)
    assert(single.count() == 0L)
  }

  test("hillTail: exact Pareto cents recover the planted alpha") {
    // x_(i) = 1000000 / i^(1/2) cents -> Pareto tail with alpha = 2
    val vals = (1 to 2000).map(i => 10000.0 / math.sqrt(i.toDouble))
    val df = vals.toDF("v")
    val r = Stats.hillTail(df, col("v"), k = 200).collect()(0)
    assert(r.getLong(0) == 201L)
    assert(math.abs(r.getDouble(3) - 2.0) < 0.1,
      s"alpha ${r.getDouble(3)} should be ~2")
  }

  test("multiTouchLinear: equal split across in-horizon clicks, exact fixed-point ledger") {
    import java.sql.Timestamp
    def ts(h: Long) = new Timestamp(h * 3600000L)
    val rows = Seq(
      (1L, ts(0), 10L, "click"), (1L, ts(1), 11L, "click"),
      (1L, ts(2), 20L, "purchase"),           // split between 10, 11
      (1L, ts(500), 12L, "click"),
      (1L, ts(501), 21L, "purchase"),         // only 12 in horizon
      (2L, ts(0), 13L, "click"),
      (2L, ts(300), 22L, "purchase"),         // 13 beyond 7d -> no credit
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.operators.EventOps.multiTouchLinear(rows, "user_id",
        "ts", "event_id", "event_type", "click", "purchase",
        horizonSec = 7L * 86400)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet == Set(10L, 11L, 12L), s"got $got")
    assert(got(10L) == ((1L, 524288L, 0.5)))
    assert(got(11L) == ((1L, 524288L, 0.5)))
    assert(got(12L) == ((1L, 1048576L, 1.0)))
  }

  test("ltvCurve: cumulative revenue per cohort age over cohort size") {
    import java.sql.Timestamp
    val week = 604800000L
    def ts(w: Long) = new Timestamp(w * week + 1000L)
    val rows = Seq(
      (1L, ts(0), "purchase", 10.0), (2L, ts(0), "click", 0.0),
      (1L, ts(1), "purchase", 20.0), (2L, ts(1), "purchase", 40.0),
      (3L, ts(1), "purchase", 100.0),
    ).toDF("user_id", "ts", "event_type", "value")
    val got = graft.operators.EventOps.ltvCurve(rows, "user_id", "ts",
        "event_type", "purchase", col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(5))).toMap
    // cohort week0: users 1,2 -> age0: 10 -> 5/user; age1: +60 -> 35/user
    // cohort week1: user 3 -> age0: 100 -> 100/user
    val c0 = got.keys.map(_._1).min
    assert(got((c0, 0L)) == ((2L, 5.0)), s"got $got")
    assert(got((c0, 1L)) == ((2L, 35.0)))
    assert(got((c0 + 1, 0L)) == ((1L, 100.0)))
  }

  test("dirichletTopK: repeated query terms rank a doc ahead; all docs score") {
    val docs = Seq(
      (1L, "spark spark spark engine engine"),
      (2L, "spark engine other words here!"),
      (3L, "nothing relevant at all here!"),
    ).toDF("doc_id", "text")
    val got = graft.operators.Retrieval.dirichletTopK(docs, "doc_id",
        "text", Seq("spark", "engine"), mu = 10L, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(got.length == 3, "QL scores every doc, not just matches")
    assert(got(0)._1 == 1L && got(1)._1 == 2L && got(2)._1 == 3L,
      s"order by term density: ${got.toSeq}")
    // hand check doc 1, term 'spark': ln((3*15 + 10*4)/(15*15))
    val s1 = math.log(85.0 / 225.0) + math.log((2 * 15 + 10 * 3) / 225.0)
    assert(math.abs(got(0)._2 - s1) < 1e-9, s"${got(0)._2} vs $s1")
  }

  test("curriculumOrder: buckets are contiguous and seq is a permutation") {
    val df = Seq.tabulate(30)(i => (i.toLong, i % 3)).toDF("id", "d")
    val got = graft.operators.Sampling.curriculumOrder(df, "id", col("d"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    assert(got.map(_._3).sorted.toSeq == (1L to 30L), "seq is 1..n")
    // ordered by seq, buckets must be non-decreasing
    val byOrder = got.sortBy(_._3).map(_._2)
    assert(byOrder.toSeq == byOrder.sorted.toSeq, s"easy first: ${byOrder.toSeq}")
    // within a bucket the order is the md5 shuffle, not the id order
    val b0 = got.sortBy(_._3).filter(_._2 == 0).map(_._1)
    assert(b0.toSeq != b0.sorted.toSeq, "md5 shuffle should break id order")
  }

  test("knScore: hand-computed Kneser-Ney probability on a two-doc corpus") {
    // corpus bigrams: (a b) x2 from doc1, (a b),(b c) from doc2
    val docs = Seq((1L, "a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = LangModel.knScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // model: c12(a,b)=2, c12(b,c)=1; c1(a)=2, c1(b)=1; n1w1(a)=1, n1w1(b)=1
    // n1w2(b)=1, n1w2(c)=1; B=2
    val pab = (2.0 - 0.75) / 2.0 + ((0.75 * 1.0) / 2.0) * (1.0 / 2.0)
    val pbc = (1.0 - 0.75) / 1.0 + ((0.75 * 1.0) / 1.0) * (1.0 / 2.0)
    assert(got(1L)._1 == 1L && got(2L)._1 == 2L)
    assert(math.abs(got(1L)._2 - math.log(pab)) < 1e-9,
      s"${got(1L)._2} vs ${math.log(pab)}")
    assert(math.abs(got(2L)._2 - (math.log(pab) + math.log(pbc)) / 2.0) < 1e-9)
    // KN probabilities are a proper-ish distribution: both in (0, 1]
    assert(pab > 0 && pab <= 1 && pbc > 0 && pbc <= 1)
  }

  test("seasonalAnomaly: planted spike flags, steady phases don't") {
    import java.sql.Timestamp
    def ts(day: Int, hr: Int) = new Timestamp(
      (day * 86400L + hr * 3600L) * 1000L)
    // metric m: hour 3 of every day worth 10.00, except day 5 = 500.00
    val rows = (0 until 10).flatMap { day =>
      Seq(("m", ts(day, 3), if (day == 5) 500.0 else 10.0),
        ("m", ts(day, 7), 20.0))
    }.toDF("event_type", "ts", "value")
    val got = Stats.seasonalAnomaly(rows, "event_type", col("ts"),
        col("value"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(6)))
    val flagged = got.filter(_._3)
    assert(flagged.length == 1 && flagged(0)._2 == 50000L,
      s"only the 500.00 spike flags: ${got.toSeq.sortBy(_._1)}")
    // steady hour-7 phase: all residuals 0, never flagged
    assert(got.count(!_._3) == 19)
  }

  test("fkAudit: orphans, unreferenced parents, null FKs, fanout") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(99L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = graft.sources.Warehouse.fkAudit(child, "fk", parent, "pk")
      .collect()(0)
    assert(r.getLong(0) == 5L, "n_child counts every row incl null FK")
    assert(r.getLong(1) == 3L)
    assert(r.getLong(2) == 1L, "one orphan (99)")
    assert(r.getLong(3) == 1L, "parent 3 unreferenced")
    assert(r.getLong(4) == 2L, "keys 1, 2 matched")
    assert(r.getLong(5) == 1L, "one null FK")
    assert(r.getDouble(6) == 0.2)
    assert(r.getDouble(7) == 4.0 / 3.0)
  }

  test("mmrDiversify: redundancy penalty promotes the diverse candidate") {
    // query q = [1,1]; a most relevant, b = a's twin (redundant),
    // c orthogonal to a (less relevant but diverse): mmr(b) ~ -0.12,
    // mmr(c) ~ +0.30 at lambda 0.5
    val corpus = Seq(
      (1L, Array(1.0f, 0.1f)),                 // a: rel ~.774
      (2L, Array(1.0f, 0.08f)),                // b: twin, rel ~.761
      (3L, Array(0.0f, 1.0f)),                 // c: diverse, rel ~.707
    ).toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.mmrDiversify(queries, corpus,
        "vec_id", "embedding", "vec_id", "embedding",
        shortlist = 3, k = 2, lambda = 0.5)
      .collect().sortBy(_.getInt(4)).map(r => (r.getInt(4), r.getLong(1)))
    assert(got(0) == ((1, 1L)), s"round 1 takes the most relevant: ${got.toSeq}")
    assert(got(1) == ((2, 3L)),
      s"round 2 must skip the twin and take the diverse one: ${got.toSeq}")

    // with lambda = 1 (pure relevance) the twin wins instead
    val rel = graft.operators.Similarity.mmrDiversify(queries, corpus,
        "vec_id", "embedding", "vec_id", "embedding",
        shortlist = 3, k = 2, lambda = 1.0)
      .collect().sortBy(_.getInt(4)).map(_.getLong(1))
    assert(rel.toSeq == Seq(1L, 2L), s"pure relevance keeps the twin: ${rel.toSeq}")
  }
}
