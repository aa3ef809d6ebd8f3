package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{EventOps, Features, Graphs, Sampling, Stats}

/** Round-6 wave semantics against in-memory brute force: sequential
  * pattern mining (gap windows, support prune), calibration binning
  * (integer-exact means, degenerate range), class balancing (exact
  * min-count per class, partition-proof hash order). */
class Wave7Spec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("seqPatterns3: gap-windowed triples, support prune, brute-force parity") {
    // u1: A B C D with tight gaps -> triples ABC, BCD
    // u2: A B C but the B->C gap breaks the window -> no triple
    // u3: A B C tight -> ABC (so ABC support=2, BCD support=1)
    val rows = Seq(
      (1L, ts(0), 1L, "A"), (1L, ts(10), 2L, "B"), (1L, ts(20), 3L, "C"),
      (1L, ts(30), 4L, "D"),
      (2L, ts(0), 5L, "A"), (2L, ts(10), 6L, "B"), (2L, ts(200), 7L, "C"),
      (3L, ts(0), 8L, "A"), (3L, ts(15), 9L, "B"), (3L, ts(25), 10L, "C"),
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.seqPatterns3(rows, "user_id", "ts", "event_id",
        "event_type", maxGapSec = 3600L, minKeys = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(("A", "B", "C", 2L, 2L)),
      s"expected only ABC with occ=2 keys=2, got $got")

    // no prune: BCD appears with support 1
    val all = EventOps.seqPatterns3(rows, "user_id", "ts", "event_id",
        "event_type", maxGapSec = 3600L, minKeys = 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(all == Set(("A", "B", "C"), ("B", "C", "D")), s"got $all")
  }

  test("seqPatterns3: same-timestamp ties ordered by id; partition-proof") {
    val rows = Seq(
      (1L, ts(0), 2L, "B"), (1L, ts(0), 1L, "A"), (1L, ts(5), 3L, "C"))
      .toDF("user_id", "ts", "event_id", "event_type")
    def run(df: org.apache.spark.sql.DataFrame) =
      EventOps.seqPatterns3(df, "user_id", "ts", "event_id", "event_type",
          3600L, 1L)
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(run(rows) == Set(("A", "B", "C")))
    assert(run(rows.repartition(7)) == Set(("A", "B", "C")))
  }

  test("calibrationCurve: integer-exact bins vs brute force; degenerate range") {
    // scores num/den spread over [0,1]; label = score above 0.5
    val data = (0 until 40).map { i =>
      (i.toLong, 40L, i >= 25) // s = i/40
    }.toDF("num", "den", "lab")
    val got = Stats.calibrationCurve(data, col("num"), col("den"),
        col("lab"), k = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // brute force: mn=0, mx=39/40; bin = floor((s-mn)/(mx-mn)*4) capped at 3
    val mn = 0.0; val mx = 39.0 / 40.0
    val expect = (0 until 40).groupBy { i =>
      math.min(math.floor((i / 40.0 - mn) / (mx - mn) * 4).toLong, 3L)
    }.map { case (b, is) =>
      b -> ((is.size.toLong, is.count(_ >= 25).toLong,
        is.map(_.toLong).sum.toDouble / (40.0 * is.size),
        is.count(_ >= 25).toDouble / is.size))
    }
    assert(got == expect, s"got $got\nexpect $expect")

    // all-equal scores: single bin 0, mean exact
    val flat = Seq((3L, 6L, true), (2L, 4L, false)).toDF("num", "den", "lab")
    val g2 = Stats.calibrationCurve(flat, col("num"), col("den"),
        col("lab"), k = 10).collect()
    assert(g2.length == 1 && g2.head.getLong(0) == 0L &&
      g2.head.getDouble(3) == 0.5 && g2.head.getDouble(4) == 0.5)
  }

  test("classBalance: exact min-count per class, deterministic, partition-proof") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = counts.values.min
    val got = Sampling.classBalance(docs, "lang", "doc_id")
    val gotCounts = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotCounts.keySet == counts.keySet, "a class vanished")
    assert(gotCounts.values.forall(_ == m), s"not balanced: $gotCounts (m=$m)")
    val a = got.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.classBalance(docs.repartition(13), "lang", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "selection must be partitioning-independent")

    // empty input: empty output with the rk column, not an NPE
    val empty = Sampling.classBalance(docs.limit(0), "lang", "doc_id")
    assert(empty.columns.contains("rk") && empty.count() == 0)
  }

  test("targetEncodeLoo: brute-force parity, leakage guard, rare-class shrink") {
    val rows = Seq(
      ("a", 1L, true), ("a", 2L, true), ("a", 3L, false), ("a", 4L, false),
      ("b", 5L, true), ("c", 6L, false))
      .toDF("cat", "id", "lab")
    val m = 4.0
    val got = Features.targetEncodeLoo(rows, "cat", col("id"), col("lab"), m)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val stats = Map("a" -> (2L, 4L), "b" -> (1L, 1L), "c" -> (0L, 1L))
    val prior = 3.0 / 6.0
    val ys = Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L, 5L -> 1L, 6L -> 0L)
    val cats = Map(1L -> "a", 2L -> "a", 3L -> "a", 4L -> "a", 5L -> "b", 6L -> "c")
    val expect = ys.map { case (id, y) =>
      val (sy, nc) = stats(cats(id))
      id -> (((sy - y).toDouble + m * prior) / ((nc - 1).toDouble + m))
    }
    assert(got == expect, s"got $got expect $expect")
    // singleton category: own label fully removed -> pure prior
    assert(got(5L) == prior && got(6L) == prior,
      "LOO on a singleton category must collapse to the global prior")
  }

  test("woeIv matches a math.log reference within 1e-10 relative") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val got = Features.woeIv(docs, "source", col("lang") === "en")
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val rows = docs.select(col("source"), (col("lang") === "en").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val pt = rows.count(_._2 == 1L).toLong
    val nt = rows.size - pt
    assert(got.nonEmpty && pt > 0 && nt > 0)
    got.foreach { case (cat, (pos, neg, woe, iv)) =>
      val cRows = rows.filter(_._1 == cat)
      assert(pos == cRows.count(_._2 == 1L) && neg == cRows.count(_._2 == 0L))
      val ref = math.log((2.0 * pos + 1) * (2.0 * nt + 1)) -
        math.log((2.0 * neg + 1) * (2.0 * pt + 1))
      assert(math.abs(woe - ref) <= 1e-10 * math.max(1.0, math.abs(ref)),
        s"$cat: woe=$woe ref=$ref")
      val refIv = (pos.toDouble / pt - neg.toDouble / nt) * woe
      assert(math.abs(iv - refIv) <= 1e-10 * math.max(1.0, math.abs(refIv)))
    }
  }

  test("labelPropagation: brute-force sync-LPA parity on a barbell graph") {
    // two 4-cliques joined by one bridge edge -> two communities
    val cliqueA = for (i <- 1 to 4; j <- (i + 1) to 4) yield (s"a$i", s"a$j")
    val cliqueB = for (i <- 1 to 4; j <- (i + 1) to 4) yield (s"b$i", s"b$j")
    val edges = (cliqueA ++ cliqueB :+ (("a1", "b1"))).toDF("s", "t")
    val got = Graphs.labelPropagation(edges, "s", "t", rounds = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    // reference: synchronous rounds, most-frequent neighbor label,
    // min-label tie break
    val adj = (cliqueA ++ cliqueB :+ (("a1", "b1")))
      .flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    var lab: Map[String, String] = adj.keys.map(k => k -> k).toMap
    for (_ <- 1 to 3) {
      lab = adj.map { case (u, nbrs) =>
        val counts = nbrs.groupBy(lab).view.mapValues(_.size)
        val best = counts.toSeq.minBy { case (l, n) => (-n, l) }._1
        u -> best
      }
    }
    assert(got == lab, s"got $got\nref $lab")
    // the two cliques must not share one label after 3 rounds
    assert(got("a2") != got("b2"), "barbell halves merged")
  }

  test("kAnonymityAudit: group sizes, sensitive diversity, k/l flags") {
    val rows = Seq(
      (1, "A", 10.0), (1, "A", 20.0), (1, "A", 20.0),
      (1, "B", 5.0),
      (2, "A", 1.0), (2, "A", 2.0), (2, "A", 3.0))
      .toDF("nat", "seg", "bal")
    val got = graft.operators.Privacy.kAnonymityAudit(
        rows, Seq("nat", "seg"), col("bal"), k = 3L, l = 3L)
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(got == Map(
      (1, "A") -> ((3L, 2L, true, false)),  // 3 rows, 2 distinct bals
      (1, "B") -> ((1L, 1L, false, false)),
      (2, "A") -> ((3L, 3L, true, true))), s"got $got")
  }

  test("gridRadiusJoin == brute-force radius pairs; cell-border pairs kept") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
    val df = pts.toDF("id", "x", "y")
    val r = 15L
    val got = graft.operators.Spatial.gridRadiusJoin(df, "id", "x", "y", r)
      .collect().map(q => (q.getLong(0), q.getLong(1), q.getLong(2))).toSet
    val brute = (for {
      (a, xa, ya) <- pts; (b, xb, yb) <- pts if a < b
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) if d2 <= r * r
    } yield (a, b, d2)).toSet
    assert(brute.nonEmpty, "no qualifying pairs in the synthetic cloud?")
    assert(got == brute,
      s"missed=${brute -- got} extra=${got -- brute}")
  }

  test("dbscan == brute-force reference on a random cloud; blob/noise shapes") {
    val rnd = new scala.util.Random(11)
    // two dense blobs + scattered background: exercises core, border,
    // noise, multi-cluster CC, and isolated-core labeling in one cloud
    val blobA = (1L to 40L).map(i =>
      (i, 50L + rnd.nextInt(12), 50L + rnd.nextInt(12)))
    val blobB = (41L to 80L).map(i =>
      (i, 150L + rnd.nextInt(12), 150L + rnd.nextInt(12)))
    val bg = (81L to 140L).map(i =>
      (i, rnd.nextInt(400).toLong, rnd.nextInt(400).toLong))
    // a constructed quad (each member: 3 neighbors + self = minPts ->
    // core) plus one satellite seeing exactly 2 of them (2 + self <
    // minPts, has core neighbors) -> guaranteed border geometry
    val quad = Seq((141L, 300L, 300L), (142L, 302L, 300L),
      (143L, 300L, 302L), (144L, 302L, 302L), (145L, 309L, 301L))
    val pts = blobA ++ blobB ++ bg ++ quad
    val (eps, minPts) = (8L, 4)
    val got = graft.operators.Spatial.dbscan(
        pts.toDF("id", "x", "y"), "id", "x", "y", eps, minPts)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    // brute-force reference: quadratic neighbors, textbook roles,
    // min-core-id cluster labels through an explicit closure
    val nbr = pts.map { case (a, xa, ya) =>
      a -> pts.collect { case (b, xb, yb)
        if b != a && (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= eps * eps
        => b }.toSet
    }.toMap
    val core = pts.collect { case (a, _, _) if nbr(a).size + 1 >= minPts => a }.toSet
    def reach(seed: Long): Set[Long] = {
      var seen = Set(seed); var frontier = Set(seed)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(nbr).filter(core).diff(seen)
        seen ++= frontier
      }
      seen
    }
    val cluster = core.map(c => c -> reach(c).min).toMap
    val expect = pts.map { case (a, _, _) =>
      if (core(a)) a -> (("core", Some(cluster(a))))
      else {
        val coreNbrs = nbr(a).filter(core)
        if (coreNbrs.nonEmpty) a -> (("border", Some(coreNbrs.map(cluster).min)))
        else a -> (("noise", None))
      }
    }.toMap
    assert(expect.values.count(_._1 == "core") > 20 &&
      expect.values.count(_._1 == "border") > 0 &&
      expect.values.count(_._1 == "noise") > 10,
      s"degenerate cloud: ${expect.values.groupBy(_._1).view.mapValues(_.size).toMap}")
    assert(expect.values.flatMap(_._2).toSet.size >= 2, "want >=2 clusters")
    assert(got == expect,
      s"diff=${(expect.toSet diff got.toSet) ++ (got.toSet diff expect.toSet)}")
  }

  test("pcaTopComponent: recovers a planted direction; partition-proof; " +
    "matches the plain-Scala reference bit-for-bit") {
    val dim = 6
    val rnd = new scala.util.Random(5)
    val dir = Array(0.8, 0.4, -0.2, 0.1, 0.3, -0.1)
    val rows = (1L to 200L).map { i =>
      val t = rnd.nextGaussian() * 3.0
      (i, Array.tabulate(dim)(j =>
        (t * dir(j) + rnd.nextGaussian() * 0.05).toFloat))
    }
    val df = rows.toDF("id", "vec")
    val (scored, model) = graft.operators.Similarity.pcaTopComponent(
      df, "id", "vec", iters = 40)
    val (v, lam) = (model.component, model.varExplained)
    // planted direction recovered (up to sign, which is pinned)
    val dn = math.sqrt(dir.map(x => x * x).sum)
    val cos = v.zip(dir).map { case (a, b) => a * b }.sum / dn
    assert(math.abs(cos) > 0.995, s"cos(v, planted)=$cos")
    assert(lam > 0.0, "eigenvalue must be positive on non-degenerate data")
    // partitioning cannot move a single bit: all aggregates are exact
    val (scored2, model2) = graft.operators.Similarity.pcaTopComponent(
      df.repartition(7), "id", "vec", iters = 40)
    assert(v.toSeq == model2.component.toSeq && lam == model2.varExplained,
      "partition-dependent result")
    assert(scored.exceptAll(scored2).count() == 0 &&
      scored2.exceptAll(scored).count() == 0)
    // plain-Scala reference: same quantized moments, same power method
    val scale = 1048576.0
    val q = rows.map(_._2.map(e => math.floor(e.toDouble * scale).toLong))
    val n = BigInt(q.length)
    val sx = Array.tabulate(dim)(j => q.map(r => BigInt(r(j))).sum)
    val m = Array.tabulate(dim, dim) { (i, j) =>
      (n * q.map(r => BigInt(r(i)) * BigInt(r(j))).sum - sx(i) * sx(j)).toDouble
    }
    var pv = Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 0 until 40) {
      val mv = Array.tabulate(dim) { i =>
        var s = 0.0; var j = 0
        while (j < dim) { s += m(i)(j) * pv(j); j += 1 }; s
      }
      val norm = math.sqrt(mv.map(x => x * x).sum)
      pv = mv.map(_ / norm)
    }
    val lead = pv.indexWhere(x => math.abs(x) > 1e-12)
    if (lead >= 0 && pv(lead) < 0) pv = pv.map(-_)
    assert(v.toSeq == pv.toSeq, "driver iteration drifted from reference")
    // ABTT: after debias the removed direction carries ~zero variance
    val deb = graft.operators.Similarity.abttDebias(df, "id", "vec")
    val resid = deb.select(
        graft.functions.Vectors.dot(col("dvec"),
          typedlit(v)).as("p"))
      .agg(sum(col("p") * col("p"))).head().getDouble(0)
    assert(math.abs(resid) < 1e-9, s"variance along v survives debias: $resid")
  }

  test("vocabCoverage: deterministic df-ordered cut, OOV occurrence counting") {
    val docs = Seq(
      (1L, "a b a c"),   // a twice (1 doc), b, c
      (2L, "a b d"),
      (3L, "a e e"))
      .toDF("doc_id", "text")
    // df: a=3, b=2, c=1, d=1, e=1; vocabSize=3 cuts at df DESC, token ASC
    // -> vocab = {a, b, c}; d and e are OOV
    val got = graft.operators.LangModel.vocabCoverage(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      1L -> ((4L, 0L, 0.0)),
      2L -> ((3L, 1L, 1.0 / 3.0)),
      3L -> ((3L, 2L, 2.0 / 3.0))), s"got $got")
  }
}
