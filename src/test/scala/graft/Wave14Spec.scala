package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graphs, Stats}

/** Round-8 wave: differential tests for the post-hoc / reliability /
  * cohesion operators — each distributed result replayed by a
  * plain-Scala sequential reference on seeded data. */
class Wave14Spec extends SparkSpec {
  import spark.implicits._

  test("kuiperTwoSample matches the plain-Scala one-sided ECDF extremes") {
    val rnd = new scala.util.Random(31)
    val a = (1 to 150).map(_ => rnd.nextInt(40).toLong)
    val b = (1 to 200).map(_ => rnd.nextInt(40).toLong + 5L)
    val df = (a.map((_, "a")) ++ b.map((_, "b"))).toDF("v", "g")
    val row = Stats.kuiperTwoSample(df, "v",
      col("g") === "a", col("g") === "b").collect().head
    val vals = (a ++ b).distinct.sorted
    def ecdfNum(xs: Seq[Long], v: Long) = xs.count(_ <= v).toLong
    val (n1, n2) = (a.size.toLong, b.size.toLong)
    val gaps = vals.map(v => ecdfNum(a, v) * n2 - ecdfNum(b, v) * n1)
    val dPlus = gaps.max
    val dMinus = gaps.map(-_).max
    assert(row.getAs[Long]("d_plus_num") == dPlus)
    assert(row.getAs[Long]("d_minus_num") == dMinus)
    assert(math.abs(row.getAs[Double]("v_stat") -
      (dPlus + dMinus).toDouble / (n1 * n2).toDouble) < 1e-15)
    // Kuiper dominates KS by construction: V = D⁺ + D⁻ ≥ max(D⁺, D⁻)
    val ks = Stats.ksTwoSample(df, "v", col("g") === "a", col("g") === "b")
      .collect().head.getAs[Double]("d_stat")
    assert(row.getAs[Double]("v_stat") >= ks - 1e-15)
  }

  test("tukeyHsd matches the plain-Scala studentized-range computation") {
    val rnd = new scala.util.Random(37)
    val groups = Map(
      "g1" -> (1 to 80).map(_ => rnd.nextInt(5000).toLong + 100L),
      "g2" -> (1 to 120).map(_ => rnd.nextInt(5000).toLong + 600L),
      "g3" -> (1 to 60).map(_ => rnd.nextInt(5000).toLong + 1200L))
    val df = groups.toSeq.flatMap { case (g, xs) => xs.map(x => (g, x)) }
      .toDF("g", "x")
    val out = Stats.tukeyHsd(df, col("g"), col("x"))
      .orderBy("g1", "g2").collect()
    val n = groups.values.map(_.size).sum
    val k = groups.size
    val means = groups.map { case (g, xs) => g -> xs.sum.toDouble / xs.size }
    val ssw = groups.toSeq.sortBy(_._1).map { case (g, xs) =>
      xs.map(_.toDouble).map(x => x * x).sum -
        math.pow(xs.sum.toDouble, 2) / xs.size
    }.sum
    val msw = ssw / (n - k)
    val pairs = groups.keys.toSeq.sorted.combinations(2).toSeq
    assert(out.length == pairs.size)
    out.zip(pairs).foreach { case (row, Seq(g1, g2)) =>
      assert(row.getAs[String]("g1") == g1 && row.getAs[String]("g2") == g2)
      val se = math.sqrt(msw / 2.0 *
        (1.0 / groups(g1).size + 1.0 / groups(g2).size))
      assert(math.abs(row.getAs[Double]("mean_diff") -
        (means(g1) - means(g2))) < 1e-9)
      assert(math.abs(row.getAs[Double]("msw") - msw) < 1e-6)
      assert(math.abs(row.getAs[Double]("q_stat") -
        math.abs(means(g1) - means(g2)) / se) < 1e-9)
    }
  }

  test("cronbachAlpha matches the plain-Scala variance-ratio formula") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 300).map { _ =>
      val base = rnd.nextInt(50).toLong
      (base + rnd.nextInt(8), base + rnd.nextInt(8), base + rnd.nextInt(8))
    }
    val df = rows.toDF("a", "b", "c")
    val row = Stats.cronbachAlpha(df,
      Seq(col("a"), col("b"), col("c"))).collect().head
    def popVar(xs: Seq[Long]) = {
      val n = xs.size.toDouble
      xs.map(x => x.toDouble * x).sum / n - math.pow(xs.sum / n, 2)
    }
    val items = Seq(rows.map(_._1), rows.map(_._2), rows.map(_._3))
    val sumVi = items.map(popVar).sum
    val vt = popVar(rows.map(r => r._1 + r._2 + r._3))
    val alpha = 1.5 * (1.0 - sumVi / vt)
    assert(row.getAs[Long]("n") == rows.size)
    assert(row.getAs[Long]("k_items") == 3L)
    assert(math.abs(row.getAs[Double]("sum_item_var") - sumVi) < 1e-9)
    assert(math.abs(row.getAs[Double]("var_total") - vt) < 1e-9)
    assert(math.abs(row.getAs[Double]("alpha") - alpha) < 1e-12)
    // correlated items measure one construct: alpha well above 0
    assert(row.getAs[Double]("alpha") > 0.5)
  }

  test("kTrussRounds peels exactly like the sequential reference") {
    // a 5-clique (every edge in 3 triangles — survives any k ≤ 5 truss)
    // plus a detached diamond (two triangles sharing edge 11–12): at
    // k=4 the diamond's outer edges have support 1 and peel in round
    // 1, which strips the shared edge's triangles so IT peels in round
    // 2 — the multi-round cascade the bounded peel must reproduce
    val clique = for {
      i <- 1L to 5L; j <- (i + 1) to 5L
    } yield (i, j)
    val extra = Seq((10L, 11L), (10L, 12L), (11L, 12L), (11L, 13L),
      (12L, 13L))
    val edges = (clique ++ extra).toDF("s", "t")
    val out = Graphs.kTrussRounds(edges, "s", "t", k = 4, rounds = 3)
      .orderBy("peel_round").collect()

    def peel(es: Set[(Long, Long)]): Set[(Long, Long)] = {
      def nbrs(v: Long) =
        es.collect { case (a, b) if a == v => b
                     case (a, b) if b == v => a }
      es.filter { case (a, b) => (nbrs(a) & nbrs(b)).size >= 2 }
    }
    var cur = (clique ++ extra).toSet
    out.foreach { row =>
      cur = peel(cur)
      assert(row.getAs[Long]("n_edges") == cur.size.toLong)
    }
    // round 1: clique + shared diamond edge (11); round 2: the cascade
    // peels the shared edge; round 3's equal count certifies fixpoint
    assert(out.map(_.getAs[Long]("n_edges")).toSeq == Seq(11L, 10L, 10L))
  }
}
