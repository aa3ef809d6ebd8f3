package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, EventOps, Multimodal, Similarity}
import graft.functions.{Text, Vectors}
import graft.queries.Ext

/** Extension-operator semantics (SURVEY.md §2.10) that the DuckDB oracle
  * can't cover: seeded-hash dedup must agree with its exact twin, ANN
  * recall vs brute force, multimodal plumbing, rolling fingerprints. */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val emb = Tables.load(spark, sf, "embeddings")

  test("minhash LSH finds exactly the exact-jaccard near-dup pairs") {
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", 3, 32, 8, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "planted near-dups missing from testdata?")
    // LSH verifies candidates with the same exact jaccard => subset; with
    // 8 bands of 4 rows at j>=0.5 recall should be total on j~1 planted dups
    assert(lsh == exact, s"lsh=$lsh exact=$exact")
  }

  test("simhash finds most planted near-dups (noisier than minhash)") {
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = Dedup.simhashNearDup(docs, "doc_id", "text", 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(sh).size.toDouble / exact.size
    assert(recall >= 0.7, s"simhash recall $recall; found=${sh.size}")
  }

  test("LSH-blocked embedding near-dup == all-pairs near-dup (threshold 0.4)") {
    // the verify stage is the same exact cosine, so lsh ⊆ all-pairs; the
    // assertion is that banding (r=2, b=24 ⇒ miss ≈ 5e-6 per pair even at
    // a borderline cos=0.4027) drops NOTHING — set equality, not recall
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val e = Tables.load(spark, s"/root/testdata/$dir", "embeddings")
      val exact = pairs(Dedup.embeddingNearDup(e, "vec_id", "embedding", 0.4))
      val lsh = pairs(Dedup.embeddingNearDupLsh(e, "vec_id", "embedding", 0.4))
      assert(exact.nonEmpty, s"$dir: no qualifying pairs in testdata?")
      assert(lsh == exact, s"$dir: missed=${exact -- lsh} extra=${lsh -- exact}")
    }
  }

  test("embedding LSH derives dim from data and fails fast on a mismatch") {
    // 8-dim vectors, planted near-identical pair: auto-derive must find it
    // (with dim hardcoded to 64 every projection would be null, every row
    // would silently share bucket 0, and blocking would be O(n²))
    val v8 = Seq(
      (1L, Array.fill(8)(1.0f)), (2L, Array.tabulate(8)(i => if (i == 0) 0.9f else 1.0f)),
      (3L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)),
      (4L, Array.tabulate(8)(i => if (i % 2 == 0) -1.0f else 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDupLsh(v8, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)), s"got $got")
    // explicit wrong dim must raise, not silently degenerate
    val err = intercept[Exception] {
      Dedup.embeddingNearDupLsh(v8, "vec_id", "embedding", 0.9, dim = 64)
        .collect()
    }
    assert(err.getMessage != null)
    // null vectors pass through (dropped at the verify), never abort the
    // job or poison dim derivation when they happen to be scanned first
    val withNull = Seq((0L, null: Array[Float])).toDF("vec_id", "embedding")
      .unionByName(v8)
    val gotN = Dedup.embeddingNearDupLsh(withNull, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotN == Set((1L, 2L)), s"got $gotN")
  }

  test("LSH ANN beats a random candidate subset of the same budget") {
    val q = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.lshTopK(q, emb, "vec_id", "embedding", "vec_id", "embedding",
      5, bits = 6, probeHamming = 2)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(ann).size.toDouble / bf.size
    // candidate budget: 1 + 6 + 15 = 22 of 64 buckets ≈ 34% of the corpus.
    // A random 34% subset would land ~0.34 recall in expectation; LSH must
    // do meaningfully better, proving the buckets carry signal.
    assert(recall >= 0.45, s"ANN recall $recall")
  }

  test("MIPS augmentation: augmented-cosine order == inner-product order (mixed norms)") {
    import spark.implicits._
    // mixed-norm fixture: norms spread 1..20 so cosine order and
    // inner-product order genuinely DISAGREE (the case MIPS exists for)
    val vecs = (0L until 60L).map { i =>
      val scale = 1.0f + (i % 20).toFloat
      i -> Seq.tabulate(8)(j =>
        scale * math.sin(i * 31 + j * 7).toFloat)
    }.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 3)
    val ip = Similarity.mipsTopK(q, vecs,
      "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // cosine over RAW vectors must DISAGREE somewhere (the fixture is
    // only probative if cosine and ip rank differently)
    val cosRaw = Similarity.bruteForceTopK(q, vecs,
      "vec_id", "embedding", "vec_id", "embedding", 5)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(ip != cosRaw, "fixture too easy: cosine order == ip order")
    // the reduction: cosine over AUGMENTED vectors == ip order exactly
    val cAug = Similarity.mipsAugment(vecs, "vec_id", "embedding")
    val qAug = Similarity.mipsAugmentQuery(q, "vec_id", "embedding")
    val cosAug = Similarity.bruteForceTopK(qAug, cAug,
      "id", "v_aug", "id", "v_aug", 5)
      .select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(cosAug == ip,
      s"augmented-cosine ranking diverged from inner-product ranking")
  }

  test("sparse cosine: identical docs hit 1.0, stop-word-only overlap never pairs") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "quantum flux capacitor resonance chamber"),
      (2L, "quantum flux capacitor resonance chamber"),   // exact copy of 1
      (3L, "the and of the and of"),                      // stop words only
      (4L, "the and of quantum widget"),                  // shares stop words + 1 rare
      (5L, "totally unrelated prose about gardening")
    ).toDF("doc_id", "text")
    // maxDf = 2 makes "the/and/of" (df 2: docs 3, 4) eligible ONLY if df<=2…
    // use maxDf = 1? df>=2 lower bound would kill all. Use maxDf = 2:
    // rare terms (df=2: the copy pair's terms) stay, df>2 would be pruned.
    val got = graft.operators.Retrieval
      .sparseCosinePairs(corpus, "doc_id", "text", maxDf = 2, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // the exact copies share every ELIGIBLE term with equal weights →
    // cos = 1 ("quantum" itself has df = 3 via doc 4 and is df-capped,
    // leaving the other 4 terms)
    val (nShared, cos) = got((1L, 2L))
    assert(nShared == 4L && math.abs(cos - 1.0) < 1e-12, s"copy pair: $cos")
    // docs 3 and 4 share only their stop words; those have df = 2 here so
    // they DO pair — but "quantum" (df = 3 with docs 1, 2, 4) is pruned
    // by maxDf = 2, so 4 never pairs with 1 or 2
    assert(!got.contains((1L, 4L)) && !got.contains((2L, 4L)),
      s"df-capped term leaked into pairs: ${got.keySet}")
    assert(got.contains((3L, 4L)), "eligible shared terms must pair")
  }

  test("SQ8 rerank with a full shortlist == brute force; narrow shortlist keeps recall") {
    val q = emb.filter(col("vec_id") < 20)
    val n = emb.count().toInt
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceTopK(q, emb,
      "vec_id", "embedding", "vec_id", "embedding", 5))
    // shortlist = whole corpus ⇒ stage 1 filters nothing and the exact
    // rerank must reproduce brute force identically
    val full = pairs(Similarity.quantizedRerank(q, emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5, shortlist = n))
    assert(full == bf, s"full-shortlist rerank diverged: ${full.diff(bf)}")
    // a 25-candidate shortlist (~8% of the corpus at sf0.001) must carry
    // most of the true top-5 — int8 coarse scores track cosine closely
    val sq = pairs(Similarity.quantizedRerank(q, emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5, shortlist = 25))
    val recall = bf.intersect(sq).size.toDouble / bf.size
    assert(recall >= 0.8, s"SQ8 recall $recall")
  }

  test("PQ ANN: full shortlist == brute force; ADC shortlist keeps recall") {
    val q = emb.filter(col("vec_id") < 20)
    val n = emb.count().toInt
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(Similarity.bruteForceTopK(q, emb,
      "vec_id", "embedding", "vec_id", "embedding", 5))
    // a corpus-wide shortlist makes stage 1 a no-op: exact rerank must
    // reproduce brute force identically regardless of ADC quality
    val full = pairs(Similarity.pqTopK(q, emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5, shortlist = n))
    assert(full == bf, s"full-shortlist PQ diverged: ${full.diff(bf)}")
    // 4×16 codebooks at shortlist 25 (~8% of the corpus): ADC is the
    // coarsest of the three quantizations (16 codewords per 16-dim
    // subspace vs SQ8's per-element codes) — measured ~0.48 recall here,
    // ~6× what a random 8% candidate subset would score. Assert the
    // signal, not the optimism.
    val pq = pairs(Similarity.pqTopK(q, emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5, shortlist = 25))
    val recall = bf.intersect(pq).size.toDouble / bf.size
    assert(recall >= 0.35, s"PQ recall $recall (random baseline ~0.08)")
  }

  test("IVF ANN beats a random candidate subset of the same budget") {
    val q = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(q, emb, "vec_id", "embedding", "vec_id", "embedding",
      5, nLists = 16, nProbe = 6)
    val recall = bf.intersect(
      ivf.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet).size.toDouble / bf.size
    info(s"IVF recall with Lloyd refinement: $recall")
    // probe budget ≈ 6/16 of the corpus ⇒ random baseline ≈ 0.375 recall;
    // Lloyd-refined centroids must clear 0.7 at the same budget
    assert(recall >= 0.7, s"IVF recall $recall")
  }

  test("kmeansCentroids rejects nLists beyond MaxLists — the driver loop is parameter-bounded by contract") {
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        nLists = Similarity.MaxLists + 1, seed = 42L, lloydIters = 1)
    }
    assert(e.getMessage.contains("nLists"))
    intercept[IllegalArgumentException] {
      Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        nLists = 0, seed = 42L, lloydIters = 1)
    }
  }

  test("semDedup: no surviving in-cluster pair clears the threshold; near-dups co-cluster") {
    val got = Dedup.semDedup(emb, "vec_id", "embedding", 0.4)
    val survivors = got.collect().map(r => (r.getLong(0), r.getInt(1)))
    val n = emb.count()
    assert(survivors.length < n, "planted near-dups should force drops")

    // survivor invariant: any same-cluster pair above threshold would have
    // dropped its higher id, so none may remain
    val sv = got.select(col("id"), col("list"))
      .join(emb.select(col("vec_id").as("id"), col("embedding")), Seq("id"))
    val sa = sv.select(col("list"), col("id").as("id_a"), col("embedding").as("va"))
    val sb = sv.select(col("list"), col("id").as("id_b"), col("embedding").as("vb"))
    val worst = sa.join(sb, Seq("list")).filter(col("id_a") < col("id_b"))
      .select(Vectors.cosine(col("va"), col("vb")).as("cos"))
      .agg(max("cos")).head.getDouble(0)
    assert(worst < 0.4, s"surviving in-cluster pair at cos=$worst")

    // the SemDeDup bet: STRONG duplicates land in the same cluster (weak
    // cos-0.4 pairs legitimately straddle centroids — the paper prunes at
    // high thresholds for exactly this reason; the fixture's max pairwise
    // cos is 0.48, so plant the strong dups here). 20 base vectors + 8
    // copies (6 exact, 2 ε-perturbed) — every copy must co-cluster with
    // its base and be dropped as the higher id.
    val rnd = new scala.util.Random(7)
    val base = (0L until 20L).map(i => i -> Array.fill(16)(rnd.nextFloat() - 0.5f))
    val copies = (0 until 8).map { j =>
      val (src, v) = base(j * 2)
      val noisy =
        if (j < 6) v.clone()
        else v.map(x => x + (rnd.nextFloat() - 0.5f) * 1e-4f)
      (100L + j, noisy, src)
    }
    val planted = (base.map { case (i, v) => (i, v) } ++
      copies.map { case (i, v, _) => (i, v) }).toDF("vec_id", "embedding")
    val kept = Dedup.semDedup(planted, "vec_id", "embedding", 0.95, nLists = 6)
      .select("id").as[Long].collect().toSet
    copies.foreach { case (cid, _, src) =>
      assert(!kept.contains(cid), s"planted copy $cid of $src survived")
      assert(kept.contains(src), s"base $src should be the surviving rep")
    }
    assert(kept.size == planted.count() - copies.length)
  }

  test("ANN probes a small fraction of the corpus") {
    val n = emb.count()
    val buckets = Similarity.lshBuckets(emb, "vec_id", "embedding", 8, 42)
      .groupBy("bucket").count().collect()
    // 8-bit signatures over 256 buckets: no bucket should hold the corpus
    assert(buckets.forall(_.getLong(1) < n / 2), "degenerate LSH bucketing")
  }

  test("Misra-Gries sketch honors the heavy-hitter guarantee vs exact counts") {
    val tok = docs.select(explode(Text.tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val n = tok.count()
    val k = 20
    val exact = tok.groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sketch = tok.agg(Text.approxTopTerms(col("term"), k))
      .head.getMap[String, Long](0)
    val bound = n / (k + 1)
    // completeness: every true heavy hitter survives
    exact.filter(_._2 > bound).foreach { case (t, c) =>
      assert(sketch.contains(t), s"heavy hitter '$t' ($c > $bound) missing")
    }
    // soundness: reported counts never exceed truth, undercount ≤ n/(k+1)
    sketch.foreach { case (t, c) =>
      assert(c <= exact(t), s"'$t' overcounted: $c > ${exact(t)}")
      assert(exact(t) - c <= bound, s"'$t' undercounted beyond bound")
    }
  }

  test("shingle generator == composable shingles, incl. trailing/double spaces") {
    // Scala's split(Char) DROPS trailing empty tokens; Spark's split and
    // DuckDB's string_split keep them. The generator must match Spark.
    val tricky = Seq("a b c d", "a b c ", "a b c  ", " a b c", "a  b c",
      "ab", "", "   ").toDF("t")
    val viaGen = tricky.select(col("t"), Text.explodeWordShingles(col("t"), 3).as("sh"))
      .groupBy("t").agg(sort_array(collect_list("sh")).as("g"))
    val viaCols = tricky.select(col("t"), explode(Text.wordShingles(col("t"), 3)).as("sh"))
      .groupBy("t").agg(sort_array(collect_list("sh")).as("c"))
    val joined = viaGen.join(viaCols, Seq("t"), "full").collect()
    joined.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"mismatch for '${r.getString(0)}': gen=${r.getSeq[String](1)} cols=${r.getSeq[String](2)}")
    }
  }

  test("charShingles: distinct k-grams, short strings yield empty") {
    val df = Seq("abcde", "aaaa", "ab").toDF("t")
    val got = df.select(Text.charShingles(col("t"), 3).as("s"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) == List("abc", "bcd", "cde"))
    assert(got(1) == List("aaa")) // distinct collapses repeats
    assert(got(2) == Nil)         // shorter than k
  }

  test("rolling fingerprint is deterministic and collision-sane") {
    val fp = docs.select(Text.fingerprintRolling(col("text")).as("fp"))
    val n = fp.count()
    val distinct = fp.distinct().count()
    assert(distinct > n - 5, s"too many rolling-hash collisions: $distinct/$n")
    val again = docs.select(Text.fingerprintRolling(col("text")).as("fp"))
    assert(fp.exceptAll(again).count() == 0)
  }

  test("multimodal: decode-stub features are fixed-width and deterministic") {
    val media = Multimodal.asMedia(
      docs.withColumn("payload", encode(col("text"), "utf-8")),
      "doc_id", "payload", "image")
    val feats = Multimodal.extractFeatures(media)
    assert(feats.filter(size(col("features")) =!= 8).count() == 0)
    val vals = feats.select(explode(col("features"))).as[Double].collect()
    assert(vals.forall(v => v >= 0.0 && v <= 1.0))
    assert(feats.select("meta.media_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("image"))
  }

  test("multimodal: mapPartitions decode == expression decode") {
    val media = Multimodal.asMedia(
      docs.limit(100).withColumn("payload", encode(col("text"), "utf-8")),
      "doc_id", "payload", "image")
    val viaExpr = Multimodal.extractFeatures(media)
      .select(col("media_id"), col("features")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val viaMp = Multimodal.extractFeaturesMapPartitions(media)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(viaExpr.keySet == viaMp.keySet)
    assert(viaExpr.forall { case (k, v) => viaMp(k) == v })
  }

  test("multimodal: real PNG round-trip decodes exact content; garbage -> nulls") {
    // decode(synthesize(id)) must read back the closed-form dims/averages
    val decoded = Multimodal.decodeImages(
      Multimodal.synthPngs(docs.filter(col("doc_id") < 20), "doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(decoded.size == 20)
    decoded.foreach { case (id, (w, h, ar, ag, ab)) =>
      val (ew, eh) = (8 + (id % 9).toInt, 8 + (id % 7).toInt)
      val n = ew * eh
      def avg(c: Long) = (c * (n - 1) + (255 - c)).toDouble / n
      assert((w, h) == (ew, eh), s"id=$id dims ($w,$h) != ($ew,$eh)")
      assert(ar == avg(id * 37 % 256) && ag == avg(id * 59 % 256) &&
        ab == avg(id * 83 % 256), s"id=$id channel averages wrong")
    }
    // an undecodable payload quarantines to nulls, never kills the job
    val garbage = Seq((999L, Array[Byte](1, 2, 3, 4)))
      .toDF("media_id", "payload")
    val bad = Multimodal.decodeImages(garbage).collect()(0)
    assert(bad.getLong(0) == 999L && bad.isNullAt(1) && bad.isNullAt(3))
  }

  test("multimodal: real WAV round-trip decodes exact sample stats; garbage -> nulls") {
    val decoded = Multimodal.decodeWavs(
      Multimodal.synthWavs(docs.filter(col("doc_id") < 20), "doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getInt(6), r.getLong(7)))
      .toMap
    assert(decoded.size == 20)
    decoded.foreach { case (id, (rate, n, durUs, sumAmp, sumSq, peak, zc)) =>
      val en = 32 + (id % 33).toInt
      val samples = (0 until en).map(i => ((id * 73 + i.toLong * 37) % 4096) - 2048)
      assert(rate == 8000 && n == en.toLong && durUs == en.toLong * 125,
        s"id=$id header stats wrong: ($rate, $n, $durUs)")
      assert(sumAmp == samples.sum && sumSq == samples.map(s => s * s).sum &&
        peak == samples.map(math.abs).max, s"id=$id sample sums wrong")
      val expZc = samples.sliding(2).count(p =>
        (if (p(0) < 0) -1 else 1) != (if (p(1) < 0) -1 else 1))
      assert(zc == expZc.toLong, s"id=$id zero crossings $zc != $expZc")
    }
    // an undecodable payload quarantines to nulls, never kills the job
    val garbage = Seq((999L, Array[Byte](82, 73, 70, 70)))
      .toDF("media_id", "payload")
    val bad = Multimodal.decodeWavs(garbage).collect()(0)
    assert(bad.getLong(0) == 999L && bad.isNullAt(1) && bad.isNullAt(4))
  }

  test("multimodal: frame features reconcile with clip stats; garbage -> zero frames") {
    val wavs = Multimodal.synthWavs(docs.filter(col("doc_id") < 20), "doc_id")
    val clips = Multimodal.decodeWavs(wavs)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4),
        r.getLong(5), r.getInt(6))).toMap
    val frames = Multimodal.decodeWavFrames(wavs).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5),
          r.getLong(6), r.getDouble(7))))
    frames.groupBy(_._1).foreach { case (id, fs) =>
      val (n, sumAmp, sumSq, peak) = clips(id)
      assert(fs.length == ((n + 15) / 16).toInt, s"id=$id frame count")
      // frame indexes are 0..nFrames-1, short last frame only
      assert(fs.map(_._2).sorted.toSeq == (0L until fs.length).toSeq)
      assert(fs.map(_._3._1).sum == n, s"id=$id sample partition")
      assert(fs.map(_._3._2).sum == sumAmp && fs.map(_._3._3).sum == sumSq,
        s"id=$id frame sums don't reconcile with clip sums")
      assert(fs.map(_._3._4).max == peak, s"id=$id peak")
      fs.foreach { case (_, _, (cnt, _, sq, _, zcr, rms)) =>
        assert(zcr < cnt, "zcr bounded by in-frame pairs")
        assert(math.abs(rms - math.sqrt(sq.toDouble / cnt)) == 0.0)
      }
    }
    val garbage = Seq((999L, Array[Byte](82, 73, 70, 70)))
      .toDF("media_id", "payload")
    assert(Multimodal.decodeWavFrames(garbage).collect().isEmpty)
  }

  test("multimodal: real AVI demux+DIB decode reads back exact per-frame content; garbage -> zero frames") {
    val decoded = Multimodal.demuxAviFrames(
      Multimodal.synthAvis(docs.filter(col("doc_id") < 20), "doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getInt(7), r.getInt(8), r.getInt(9)))
      .toMap
    val expFrames = (0 until 20).map(id => 2 + id % 3).sum
    assert(decoded.size == expFrames, s"${decoded.size} frames != $expFrames")
    decoded.foreach { case ((id, f), (w, h, sr, sg, sb, r00, g00, b00)) =>
      val (ew, eh) = (4 + (id % 5).toInt, 3 + (id % 4).toInt)
      assert((w, h) == (ew, eh), s"id=$id dims ($w,$h) != ($ew,$eh)")
      val px = for (y <- 0 until eh; x <- 0 until ew) yield (
        (id * 37 + f * 41 + y * 43 + x * 47) % 256,
        (id * 19 + f * 23 + y * 29 + x * 31) % 256,
        (id * 7 + f * 11 + y * 13 + x * 17) % 256)
      assert(sr == px.map(_._1).sum && sg == px.map(_._2).sum &&
        sb == px.map(_._3).sum, s"id=$id f=$f channel sums wrong")
      // top-left pixel (y=0, x=0) — stored LAST in the bottom-up DIB,
      // so a decoder that forgot the flip fails exactly here
      assert(r00 == (id * 37 + f * 41) % 256 && g00 == (id * 19 + f * 23) % 256
        && b00 == (id * 7 + f * 11) % 256, s"id=$id f=$f corner wrong")
    }
    // malformed payloads (non-RIFF, truncated RIFF) demux to ZERO frames
    val garbage = Seq((998L, Array[Byte](1, 2, 3, 4)),
      (999L, "RIFF1234AVI x".getBytes("US-ASCII")))
      .toDF("media_id", "payload")
    assert(Multimodal.demuxAviFrames(garbage).count() == 0L)
  }

  test("cdcChunks: edit-robust boundaries; chunks rebuild the doc; degenerate docs") {
    val rnd = new scala.util.Random(13)
    val words = (1 to 400).map(_ => f"w${rnd.nextInt(5000)}%04d")
    val a = words.mkString(" ")
    val b = "inserted prefix goes here " + a   // prefix edit
    val df = Seq((1L, a), (2L, b), (3L, "tiny"), (4L, "")).toDF("doc_id", "text")
    val chunks = graft.operators.Dedup.cdcChunks(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    // chunk word counts rebuild each doc exactly
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc(1L).map(_._4).sum == 400 && byDoc(2L).map(_._4).sum == 404)
    assert(byDoc(3L).map(_._4).sum == 1 && byDoc(4L).map(_._4).sum == 1,
      "short/empty docs must emit exactly their whole text as one chunk")
    // edit robustness: the prefix edit can only disturb chunks up to the
    // first boundary after it — the overwhelming share of A's chunks
    // must reappear verbatim in B (fixed-size chunking would share ~none)
    val ha = byDoc(1L).map(_._3).toSet
    val hb = byDoc(2L).map(_._3).toSet
    val shared = ha.intersect(hb).size.toDouble / ha.size
    assert(ha.size > 10, s"chunking too coarse: ${ha.size} chunks")
    assert(shared > 0.8, s"only ${(shared * 100).round}% of chunks survived a prefix edit")
    // boundaries are content-defined: chunk sequences differ only at the head
    assert(byDoc(1L).sortBy(_._2).map(_._3).reverse.zip(
      byDoc(2L).sortBy(_._2).map(_._3).reverse).takeWhile(p => p._1 == p._2)
      .size >= ha.size - 2, "tail chunks must align after the edit point")
  }

  test("multimodal: dHash is invariant across jitter and 2x-upscale variants") {
    val media = Multimodal.synthGradientPngs(
      docs.filter(col("doc_id") < 80), "doc_id")
    val hashed = Multimodal.dHash64(media)
    // variants 0..2 of a family (2 resolutions x jittered pixels) land
    // on ONE hash; the bumped variant 3 sits within Hamming 2 of it
    val rows = hashed.collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    val fams = rows.keys.map(_ / 4).toSet
    fams.foreach { f =>
      val base = rows(f * 4)
      assert(rows(f * 4 + 1) == base && rows(f * 4 + 2) == base,
        s"family $f jitter/upscale variants split")
      val (h3, l3) = rows(f * 4 + 3)
      val d = java.lang.Long.bitCount(h3 ^ base._1) +
        java.lang.Long.bitCount(l3 ^ base._2)
      assert(d <= 2, s"family $f bumped variant at Hamming $d")
    }
    // distinct families stay far apart (md5 bits ~ independent)
    assert(fams.toSeq.combinations(2).forall { case Seq(f1, f2) =>
      val (a, b) = (rows(f1 * 4), rows(f2 * 4))
      java.lang.Long.bitCount(a._1 ^ b._1) +
        java.lang.Long.bitCount(a._2 ^ b._2) > 2
    }, "cross-family near-collision")
    // the banded near-dup join returns exactly the brute-force pair set
    val got = Multimodal.phashNearDup(media, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ids = rows.keys.toSeq.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b
      d = java.lang.Long.bitCount(rows(a)._1 ^ rows(b)._1) +
        java.lang.Long.bitCount(rows(a)._2 ^ rows(b)._2) if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(brute.exists(_._3 > 0), "no planted near-miss pair in the fixture?")
    assert(got == brute, s"missed=${brute -- got} extra=${got -- brute}")
    // the bits are EXACTLY the md5(family) bits the synth walked
    val row = hashed.filter(col("media_id") === 0)
      .select("phash_hi", "phash_lo").head()
    val hex = Multimodal.md5Hex("0")
    var (hi, lo) = (0L, 0L)
    for (k <- 0 until 64) {
      val b = Multimodal.md5Bit(hex, k).toLong
      if (k < 32) lo |= b << k else hi |= b << (k - 32)
    }
    assert(row.getLong(0) == hi && row.getLong(1) == lo, "bit convention drift")
  }

  test("multimodal: real resize round-trips a pixel-replicate upscale exactly") {
    val media = Multimodal.synthGradientPngs(
      docs.filter(col("doc_id") < 8), "doc_id")
    // resize everything to the canonical 9x8 and re-hash from the
    // RESIZED payloads: identical hashes prove the resample is the
    // anti-aliasing average (nearest-neighbor would still pass the
    // replicate case, so also check fractional-box determinism below)
    val hcols = Seq("media_id", "phash_hi", "phash_lo").map(col)
    val viaResize = Multimodal.dHash64(Multimodal.resizeImage(media, 9, 8))
      .select(hcols: _*)
    val direct = Multimodal.dHash64(media).select(hcols: _*)
    assert(viaResize.exceptAll(direct).count() == 0 &&
      direct.exceptAll(viaResize).count() == 0)
    // fractional overlap: 3x2 grid [10,20,30 / 50,60,70] to 2x1 --
    // each target cell is the exact area-weighted floor average
    val g = Multimodal.boxResize(Array(10, 20, 30, 50, 60, 70), 3, 2, 2, 1)
    // left cell: floor((10*2 + 20*1 + 50*2 + 60*1) / 6) = floor(200/6) = 33
    assert(g.toSeq == Seq(33, 46), s"fractional box math: ${g.toSeq}")
    // undecodable payloads quarantine to null hashes, not crashes
    val junk = Seq((7L, Array[Byte](9, 9, 9))).toDF("media_id", "payload")
    assert(Multimodal.dHash64(junk).filter(col("phash_hi").isNull).count() == 1)
  }

  test("session_window built-in agrees with gaps-and-islands session count") {
    val ev = Tables.load(spark, sf, "events")
    val builtin = EventOps.sessionWindowAgg(ev, "user_id", "ts", 30)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"))
    val manual = EventOps.sessionize(ev, "user_id", "ts", 30)
      .select("user_id", "n_sessions", "n_events")
    assert(builtin.exceptAll(manual).count() == 0 &&
      manual.exceptAll(builtin).count() == 0)
  }

  test("sketch aggregates land within tolerance of exact forms") {
    val li = Tables.load(spark, sf, "lineitem")
    val joined = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_partkey")).as("exact_parts"),
      approx_count_distinct(col("l_partkey")).as("approx_parts"),
      expr("percentile(l_extendedprice, 0.5)").as("exact_median"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_median"))
      .collect()
    for (r <- joined) {
      val (ep, ap) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(ep - ap) / ep < 0.05, s"HLL error ${(ep, ap)}")
      val (em, am) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(em - am) / em < 0.05, s"KLL error ${(em, am)}")
    }
  }

  test("approx outlier fences land within tolerance of the exact report") {
    val exact = Ext.queries("x_outlier_clip")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // round-9 verdict schema: (flag, n, p05_ok, p95_ok, below_frac_ok,
    // above_frac_ok) — n must match the exact report, every bit TRUE
    val approx = Ext.queries("x_outlier_clip_approx")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4), r.getBoolean(5))).toMap
    assert(exact.keySet == approx.keySet)
    for ((k, n) <- exact) {
      val (an, p05ok, p95ok, bok, aok) = approx(k)
      assert(an == n, s"$k row count drifted: $an != $n")
      assert(p05ok && p95ok, s"$k approx fence out of 3% tolerance")
      assert(bok && aok, s"$k head/tail fraction out of [2%,8%] band")
    }
  }

  test("cosine is symmetric and self-similarity is 1") {
    val v = emb.limit(50).select(col("vec_id"), col("embedding"))
    val selfSim = v.select(Vectors.cosine(col("embedding"), col("embedding")).as("c"))
      .as[Double].collect()
    assert(selfSim.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("kCenterSelect == plain-Scala Gonzalez greedy on the collected set") {
    val k = 5
    val pts = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      // the operator's exact form: v·v + (c·c − 2 v·c), left folds
      def dot(x: Array[Double], y: Array[Double]) = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i) * y(i); i += 1 }; s
      }
      dot(a, a) + (dot(b, b) - 2.0 * dot(a, b))
    }
    var chosen = Vector(pts.head)
    for (_ <- 1 until k) {
      val next = pts.map { p =>
        (p, chosen.map(c => d2(p._2, c._2)).min)
      }.maxBy { case ((id, _), d) => (d, -id) }._1
      chosen = chosen :+ next
    }
    val expectIds = chosen.map(_._1)
    val got = Similarity.kCenterSelect(emb, "vec_id", "embedding", k)
      .orderBy("center_rank").collect()
    assert(got.map(_.getAs[Long]("center_id")).toSeq == expectIds,
      s"greedy selection diverged: got ${got.map(_.getLong(1)).toSeq}, " +
        s"want $expectIds")
    assert(got.map(_.getAs[Long]("n_assigned")).sum == pts.length)
    assert(got.forall(_.getAs[Double]("radius_d2") >= 0.0))
    // center 0's cell contains center 0 itself at distance exactly 0
    // only if no other center is closer — weaker invariant: every
    // radius is bounded by the previous round's selection distance
    // (the Gonzalez monotonicity: farthest distances weakly decrease)
  }
}
