package graft

import org.apache.spark.sql.functions._
import graft.functions.Pmath
import graft.operators.Retrieval

/** Portable-ln contract: deterministic IEEE-only series, accurate enough
  * for scoring, correct at the range-reduction edges. */
class PmathSpec extends SparkSpec {
  import spark.implicits._

  private def pln(xs: Seq[Double]): Seq[Double] =
    xs.toDF("x").select(Pmath.lnColumn(col("x")).as("y"))
      .as[Double].collect().toSeq

  test("native codegen ln == lambda reference form, bit for bit") {
    val xs = (1 to 5000).map(i => 1.0 + i * 1.7 + (i % 97) * 1e-5) ++
      (1 to 40).map(i => math.pow(2, i)) ++ Seq(1.0, 1.0 + 1e-15)
    val both = xs.toDF("x").select(
      Pmath.lnColumn(col("x")).as("native"),
      Pmath.lnColumnLambda(col("x")).as("lambda"))
      .as[(Double, Double)].collect()
    both.zip(xs).foreach { case ((n, l), x) =>
      assert(java.lang.Double.doubleToRawLongBits(n) ==
        java.lang.Double.doubleToRawLongBits(l),
        s"native/lambda diverge at $x: $n vs $l")
    }
  }

  test("portable ln tracks Math.log within 1e-11 relative over the domain") {
    val xs = (1 to 2000).map(i => 1.0 + i * i * 0.27) ++
      Seq(1.0, 1.5, 2.0, 1024.0, 1e6, 1e9, (1L << 40) - 1.0)
    val got = pln(xs)
    xs.zip(got).foreach { case (x, y) =>
      val ref = math.log(x)
      val err = if (ref == 0.0) math.abs(y) else math.abs(y - ref) / ref
      assert(err < 1e-11, s"pln($x)=$y vs ln=$ref")
    }
  }

  test("exact at 1 and at powers of two; strictly monotone across boundaries") {
    assert(pln(Seq(1.0)) == Seq(0.0)) // t=0 short-circuits the series
    // power-of-two inputs reduce to m=1 exactly: result is the k*ln2 literal
    val pows = (1 to 40).map(i => math.pow(2, i))
    pln(pows).zipWithIndex.foreach { case (y, i) =>
      assert(y == (i + 1) * 0.6931471805599453, s"2^${i + 1} -> $y")
    }
    // monotone across each reduction boundary (the CASE seams)
    val seams = (1 to 39).flatMap { i =>
      val p = math.pow(2, i); Seq(p * (1 - 1e-12), p, p * (1 + 1e-12))
    }
    val ys = pln(seams)
    seams.zip(ys).sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(y2 > y1 || x2 <= x1, s"non-monotone at $x1->$x2: $y1 -> $y2")
    }
  }

  test("bm25 ranks multi-term matches above single-term matches") {
    val docs = Seq(
      (1L, "join merge scan filter"),   // all three query terms
      (2L, "join merge filter filter"), // two
      (3L, "join filter filter filter"),// one
      (4L, "filter filter filter filter"), // zero -> absent
      (5L, "join join join merge merge scan scan filter")) // all, higher tf
      .toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("join", "merge", "scan"), k = 10)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(got.head == 5L, s"highest-tf all-term doc should lead: $got")
    assert(got.indexOf(1L) < got.indexOf(2L) && got.indexOf(2L) < got.indexOf(3L))
    assert(!got.contains(4L), "zero-match doc must not appear")
  }

  test("PII redaction scrubs emails, IPs, and phones; clean text unchanged") {
    import graft.functions.Text
    val got = Seq(
      "mail a.b+c@x-mail.co or ops@a.io now",
      "from 192.168.1.250 and 10.0.0.1",
      "call +1-555-123-4567 or 25-989-741-2988",
      "clean sentence with no identifiers at all")
      .toDF("t").select(Text.redactPii(col("t"))).as[String].collect()
    assert(got(0) == "mail <EMAIL> or <EMAIL> now", got(0))
    assert(got(1) == "from <IP> and <IP>", got(1))
    assert(got(2) == "call <PHONE> or <PHONE>", got(2))
    assert(got(3) == "clean sentence with no identifiers at all")
  }

  test("lm score: duplicated predictable text scores higher than shuffled") {
    import graft.operators.LangModel
    // corpus where "alpha beta" dominates: docs of repeated "alpha beta"
    // are maximally predictable; a doc of rare bigrams scores lower
    val docs = ((1 to 8).map(i => (i.toLong, "alpha beta alpha beta alpha beta"))
      :+ (99L, "zeta omega theta iota kappa")).toDF("doc_id", "text")
    val s = LangModel.bigramScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(1L) > s(99L), s"predictable doc must outscore rare-bigram doc: $s")
    assert(s.values.forall(_ <= 0.0), "log-probs must be non-positive")
  }

  test("double-valued scores are partition-order invariant") {
    import graft.operators.{LangModel, Retrieval}
    // scores built on portable ln + ordered folds must be BIT-identical
    // under any input layout — the cluster-re-layout invariance the
    // exact oracles certify cross-engine, asserted here cross-partitioning
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      LangModel.bigramScore(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(docs) == scores(docs.repartition(13)))
    def bm25(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      Retrieval.bm25TopK(df, "doc_id", "text", Seq("join", "merge", "scan"), 20)
        .orderBy("rank").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(bm25(docs) == bm25(docs.repartition(7)))
  }

  test("int8 quantization: codes bounded, reconstruction within scale/2") {
    import graft.functions.Vectors
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.select(
      Vectors.quantizeInt8(col("embedding")).as("q8"),
      Vectors.int8Scale(col("embedding")).as("s"),
      Vectors.int8MaxError(col("embedding")).as("e"))
    assert(q.filter(exists(col("q8"), c => abs(c) > 127)).count() == 0)
    assert(q.filter(col("e") > col("s") * 0.5 + lit(1e-12)).count() == 0)
  }

  /** Independent plain-Scala BPE reference: same contract as
    * LangModel.bpeMerges (greedy leftmost merge, lexicographic
    * tie-break) but implemented over in-memory maps with no Spark. */
  private def referenceBpe(text: Seq[String], k: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = text.flatMap(_.split(" "))
      .filter(_.nonEmpty).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
      .map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to k) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.size - 1)
        pairs((syms(i), syms(i + 1))) = pairs.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (pairs.nonEmpty) {
        val ((l, rr), pc) = pairs.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((r, l, rr, pc))
        vocab = vocab.groupBy { case (syms, _) =>
          syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == rr)
              acc.init :+ (acc.last + x)
            else acc :+ x
          }
        }.view.mapValues(_.values.sum).toMap
      }
    }
    out.toSeq
  }

  test("BPE merges == independent reference on toy corpora and the fixture") {
    import spark.implicits._
    def run(texts: Seq[String], k: Int) = {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      graft.operators.LangModel.bpeMerges(df, "doc_id", "text", k)
        .collect().map(r =>
          (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    }
    // toy corpus with known merges: "low lower lowest" ×5 — (l,o) and
    // (lo,w) dominate; exercises merged symbols re-entering later rounds
    val toy = Seq.fill(5)("low lower lowest low").mkString(" ")
    assert(run(Seq(toy), 4) == referenceBpe(Seq(toy), 4))
    // overlap semantics: runs of one char ("aaaa") — greedy leftmost
    val runs = Seq("aaaa aaa aa baab")
    assert(run(runs, 3) == referenceBpe(runs, 3))
    // the real fixture at sf0.001
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("text").as[String].collect().toSeq
    val got = run(docs, 6)
    assert(got == referenceBpe(docs, 6), s"fixture merges diverged: $got")
  }

  test("BPE encode == plain-Scala reference; training-corpus round trip") {
    import spark.implicits._
    def refEncode(text: String, ms: Seq[(String, String)]): (Long, Long, String) = {
      val words = text.split(" ", -1).filter(_.nonEmpty)
      var nSyms = 0L
      val sb = new StringBuilder
      words.foreach { w =>
        var syms: Vector[String] = w.map(_.toString).toVector
        ms.foreach { case (l, r) =>
          syms = syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (acc.last + x)
            else acc :+ x
          }
        }
        nSyms += syms.size
        if (sb.nonEmpty) sb.append('')
        sb.append(syms.mkString(""))
      }
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(sb.toString.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      (words.length.toLong, nSyms, dig)
    }
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val texts = docs.as[(Long, String)].collect().toMap
    val ms = referenceBpe(texts.values.toSeq, 6).map(m => (m._2, m._3))
    val enc = graft.operators.LangModel.bpeEncode(docs, "doc_id", "text", ms)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(enc.keySet == texts.keySet)
    texts.foreach { case (id, t) =>
      assert(enc(id) == refEncode(t, ms), s"doc $id encode diverged")
    }
    // merged symbols shrink the stream: with >0 merges applied some doc
    // must have n_syms < total chars of its words
    val shrunk = texts.count { case (id, t) =>
      enc(id)._2 < t.split(" ", -1).filter(_.nonEmpty).map(_.length).sum
    }
    assert(shrunk > 0, "no doc compressed — merges not applied?")
    // partition invariance
    val enc2 = graft.operators.LangModel.bpeEncode(
        docs.repartition(7), "doc_id", "text", ms)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(enc2 == enc)
  }

  test("wordpiece usage == plain-Scala vocab induction + greedy walk") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val texts = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    def wordCounts(ts: Seq[String]): Map[String, Long] =
      ts.flatMap(_.split(" ", -1)).filter(w => w.nonEmpty && w.length <= 20)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sampleWords = wordCounts(texts.filter(_._1 < 1000).map(_._2).toSeq)
    val pieceCounts = scala.collection.mutable.Map.empty[String, Long]
    sampleWords.foreach { case (w, cnt) =>
      for (i <- 0 until w.length; l <- 1 to 4 if i + l <= w.length)
        pieceCounts.updateWith(w.substring(i, i + l))(
          o => Some(o.getOrElse(0L) + cnt))
    }
    val vocab = pieceCounts.toSeq.sortBy { case (p, n) => (-n, p) }
      .take(64).map(_._1).toSet
    def seg(w: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = 0
      while (pos < w.length) {
        val l = (math.min(4, w.length - pos) to 1 by -1)
          .find(l => vocab.contains(w.substring(pos, pos + l)))
        l match {
          case Some(n) => out += w.substring(pos, pos + n); pos += n
          case None    => out += "<unk>"; pos += 1
        }
      }
      out.toSeq
    }
    val expect = wordCounts(texts.map(_._2).toSeq).toSeq
      .flatMap { case (w, cnt) => seg(w).map(_ -> cnt) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(20)
    val got = graft.operators.LangModel.wordpieceUsage(
        docs.filter(col("doc_id") < 1000), docs, "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect, s"top-20 diverged:\n got $got\n exp $expect")
    // partition invariance: counts are hash-agg sums of exact longs
    val got2 = graft.operators.LangModel.wordpieceUsage(
        docs.filter(col("doc_id") < 1000).repartition(5),
        docs.repartition(7), "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got2 == got)
  }

  test("token entropy: 0 for constant docs, ln(n) for all-distinct, partition-invariant") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a a a a a"),         // constant → H = 0
      (2L, "a b c d e f g h"),         // uniform over 8 → H = ln 8
      (3L, "a a b b c c d d e f")      // mixed, hand-checkable below
    ).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.LangModel.tokenEntropy(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
    val got = run(docs)
    assert(got(1L) == ((8L, 1L, 0.0)), s"constant doc: ${got(1L)}")
    val (n2, v2, h2) = got(2L)
    assert(n2 == 8L && v2 == 8L && math.abs(h2 - math.log(8.0)) < 1e-11)
    val (n3, v3, h3) = got(3L)
    // 4 tokens at 2/10 + 2 at 1/10: H = 4·(.2 ln 5) + 2·(.1 ln 10)
    val exp3 = 4 * 0.2 * math.log(5.0) + 2 * 0.1 * math.log(10.0)
    assert(n3 == 10L && v3 == 6L && math.abs(h3 - exp3) < 1e-11, s"doc 3: $h3")
    assert(run(docs.repartition(5)) == got, "entropy changed under repartition")
  }

  test("pmi collocations: hand-computed scores, minCount prunes, sign from ratio") {
    import spark.implicits._
    // "x y" appears 5×: C(x,y)=5, C(x)=C(y)=5, N=15 ⇒ pmi = ln(75/25) = ln 3.
    // "a b" appears 5× but a,b also appear apart: C(a,b)=5, C(a)=C(b)=10,
    // N=15+30=... build explicitly below
    val docs = Seq(
      (1L, "x y x y x y x y x y z z z z z"),          // 5× (x,y), filler z
      (2L, "a b a b a b a b a b"),                    // 5× (a,b)
      (3L, "a a a a a b b b b b")                     // a,b apart (dilutes)
    ).toDF("doc_id", "text")
    val got = graft.operators.LangModel
      .pmiCollocations(docs, "doc_id", "text", minCount = 5L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // N = 35 tokens total; C(x)=C(y)=5, C(x,y)=5 ⇒ pmi = ln(5·35/25) = ln 7
    val (nXy, pmiXy) = got(("x", "y"))
    assert(nXy == 5L && math.abs(pmiXy - math.log(7.0)) < 1e-11, s"x,y: $pmiXy")
    // C(a)=C(b)=10, C(a,b)=5+1 (doc 3 has one a→b seam) ⇒ 6·35/100 = 2.1
    val (nAb, pmiAb) = got(("a", "b"))
    assert(nAb == 6L && math.abs(pmiAb - math.log(2.1)) < 1e-11, s"a,b: $pmiAb")
    // pairs under minCount (y,x seen 4×; z,z 4×) are pruned
    assert(!got.contains(("y", "x")) && !got.contains(("z", "z")),
      s"unexpected pairs: ${got.keySet}")
  }

  test("hashed classifier: score == independently computed md5 weights; partition-invariant") {
    import spark.implicits._
    def weight(tok: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = h.take(2).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 17 - 8
    }
    val docs = Seq((1L, "the quick brown fox"), (2L, "lorem ipsum dolor sit amet"),
      (3L, "zzz")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.LangModel.hashedClassifier(df, "doc_id", "text")
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
        .toMap
    val got = run(docs)
    Seq(1L -> "the quick brown fox", 2L -> "lorem ipsum dolor sit amet",
      3L -> "zzz").foreach { case (id, text) =>
      val toks = text.split(" ")
      val exp = toks.map(weight).sum
      val (n, score, margin, keep) = got(id)
      assert(n == toks.length && score == exp, s"doc $id: got $score want $exp")
      assert(margin == exp.toDouble / toks.length && keep == (exp > 0))
    }
    assert(run(docs.repartition(5)) == got, "score changed under repartition")
  }

  test("native codegen exp == lambda reference form, bit for bit") {
    val xs = (-4000 to 4000).map(_ * 0.01) ++
      (-58 to 58).map(_ * 0.6931471805599453) ++
      Seq(0.0, -0.0, 1e-300 * 0, 29.999999, -29.999999, 1e-9, -1e-9)
    val both = xs.toDF("x").select(
      Pmath.expColumn(col("x")).as("native"),
      Pmath.expColumnLambda(col("x")).as("lambda"))
      .as[(Double, Double)].collect()
    both.zip(xs).foreach { case ((n, l), x) =>
      assert(java.lang.Double.doubleToRawLongBits(n) ==
        java.lang.Double.doubleToRawLongBits(l),
        s"native/lambda exp diverge at $x: $n vs $l")
    }
  }

  test("portable sin/cos track Math within 1e-11 absolute over |θ| <= π") {
    val xs = (-3141 to 3141).map(_ * 0.001) ++
      Seq(0.0, math.Pi, -math.Pi, math.Pi / 2, -math.Pi / 2)
    val got = xs.toDF("x").select(
      Pmath.sinColumn(col("x")).as("s"), Pmath.cosColumn(col("x")).as("c"))
      .as[(Double, Double)].collect()
    xs.zip(got).foreach { case (x, (s, c)) =>
      assert(math.abs(s - math.sin(x)) < 1e-11, s"psin($x)=$s")
      assert(math.abs(c - math.cos(x)) < 1e-11, s"pcos($x)=$c")
      // the identity survives the truncation
      assert(math.abs(s * s + c * c - 1.0) < 1e-10)
    }
  }

  test("portable exp tracks Math.exp within 1e-13 relative; exp(0) == 1") {
    val xs = (-4000 to 4000).map(_ * 0.00997) ++ Seq(0.0, 1.0, -1.0,
      math.log(2.0), 10.0, -10.0, 39.9, -39.9)
    val got = xs.toDF("x").select(Pmath.expColumn(col("x")).as("y"))
      .as[Double].collect()
    xs.zip(got).foreach { case (x, y) =>
      val ref = math.exp(x)
      assert(math.abs(y - ref) / ref < 1e-13, s"pexp($x)=$y vs $ref")
    }
    assert(xs.toDF("x").select(Pmath.expColumn(lit(0.0)))
      .as[Double].collect().forall(_ == 1.0))
  }
}
