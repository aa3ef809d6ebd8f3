package graft

import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.operators.{Dedup, Graphs, LangModel}
import graft.pipelines.Corpus

/** End-to-end corpus-clean invariants on the fixture: survivors are a
  * subset of quality-gated docs, exactly one representative survives per
  * near-dup cluster, and no surviving pair is still a near-dup. */
class CorpusSpec extends SparkSpec {

  test("packing: token mass preserved, every non-final chunk exactly full") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val packed = graft.operators.Pack.concatChunk(
      docs, "source", "doc_id", "text", capacity = 512)
    val mass = packed.agg(sum("tokens_in_chunk")).head.getLong(0)
    val corpus = docs.select(
      sum(graft.functions.Text.tokenCountWs(col("text")).cast("long")))
      .head.getLong(0)
    assert(mass == corpus, s"packed $mass tokens, corpus has $corpus")
    // per shard: every chunk except the last holds exactly `capacity`
    val fills = packed.groupBy("source", "chunk_id")
      .agg(sum("tokens_in_chunk").as("fill"))
    val lastChunk = fills.groupBy("source").agg(max("chunk_id").as("last"))
    val short = fills.join(lastChunk, Seq("source"))
      .filter(col("chunk_id") < col("last") && col("fill") =!= 512)
    assert(short.count() == 0, "a non-final chunk is not exactly full")
  }

  test("contamination flags planted near-dups across a train/eval split") {
    import spark.implicits._
    val eval_ = Seq((1000L, "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "xx yy alpha beta gamma delta epsilon zeta zz"), // shares 6-word run
      (2L, "totally unrelated words that never overlap anything"))
      .toDF("doc_id", "text")
    val got = Corpus.contamination(train, eval_, "doc_id", "text")
      .collect().map(r => r.getLong(0)).toSet
    assert(got == Set(1L), s"got $got")
  }

  test("contaminationBySplit == two-frame contamination on the fixture") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val pred = col("doc_id") % 10 === 0
    val split = Corpus.contaminationBySplit(docs, "doc_id", "text", pred)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val twoFrame = Corpus.contamination(
      docs.filter(!pred), docs.filter(pred), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(split == twoFrame && split.nonEmpty, s"split=${split.size} two=${twoFrame.size}")
  }

  test("ngramOverlap: exact copy scores 1.0, disjoint doc scores 0.0") {
    import spark.implicits._
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon"),     // eval (id % 10 == 0)
      (1L, "alpha beta gamma delta epsilon"),      // exact copy -> 1.0
      (2L, "alpha beta gamma something different entirely"), // partial
      (3L, "totally unrelated words that never overlap"))    // 0.0
      .toDF("doc_id", "text")
    val got = Corpus.ngramOverlap(docs, "doc_id", "text",
      col("doc_id") % 10 === 0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((3L, 3L, 1.0)), s"copy: ${got(1L)}")
    assert(got(3L)._3 == 0.0, s"disjoint: ${got(3L)}")
    // doc 2: grams = {alpha beta gamma, beta gamma something, ...} — only
    // the first appears in eval
    assert(got(2L)._2 == 1L && got(2L)._3 == 0.25, s"partial: ${got(2L)}")
    // the 0-overlap doc IS reported (the measurement is a distribution)
    assert(got.keySet == Set(1L, 2L, 3L))
  }

  test("budget mix: prefix per shard, never over budget, cap binds") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val mix = Corpus.budgetMix(docs, "source", "doc_id", "text", 500L)
    val perSource = mix.groupBy("source").agg(max("cum").as("spent"),
      count(lit(1)).as("kept")).collect()
    assert(perSource.forall(_.getLong(1) <= 500L), "budget exceeded")
    val totalDocs = docs.count()
    assert(mix.count() < totalDocs, "cap never bound — raise corpus or lower budget")
    // prefix property: kept ids per source are exactly the smallest ids
    val bySource = mix.collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val allBySource = docs.select("source", "doc_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    bySource.foreach { case (src, kept) =>
      assert(allBySource(src).take(kept.size).toSet == kept,
        s"$src: kept ids are not the id-order prefix")
    }
  }

  test("survivor set: gated, exact-deduped, one rep per near-dup cluster") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val survivors = Corpus.clean(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(survivors.nonEmpty && survivors.size < docs.count())

    // survivors pass the quality gate
    val gated = docs.filter(Text.qualityScore(col("text")) >= 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors.subsetOf(gated), "a survivor failed the quality gate")

    // no two survivors share identical text
    val dupTexts = docs.filter(col("doc_id").isin(survivors.toSeq: _*))
      .groupBy("text").count().filter(col("count") > 1).count()
    assert(dupTexts == 0, "exact duplicates survived")

    // each near-dup cluster (over the deduped, gated corpus) contributes
    // exactly its min-id representative
    val gatedDocs = docs.filter(Text.qualityScore(col("text")) >= 0.5)
      .groupBy("text").agg(min(col("doc_id")).as("doc_id"))
    val clusters = Graphs.dedupClusters(
      Dedup.ngramJaccard(gatedDocs, "doc_id", "text", 3, 0.5), "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    clusters.foreach { case (doc, rep) =>
      assert(survivors.contains(doc) == (doc == rep),
        s"doc $doc (rep $rep): cluster must keep exactly its representative")
    }
  }

  test("temperatureWeights: sums to 1, flattens the source distribution") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val rows = Corpus.temperatureWeights(docs, "source", "text", 10000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-12, "weights must normalize")
    assert(math.abs(rows.map(_._4).sum - 10000.0) < 1e-8, "quotas must spend the budget")
    // flattening: the weight ratio between extremes is the sqrt of the
    // mass ratio, strictly closer to 1 than the raw proportion
    val big = rows.maxBy(_._2); val small = rows.minBy(_._2)
    if (big._2 != small._2) {
      val massRatio = big._2.toDouble / small._2
      val wRatio = big._3 / small._3
      assert(wRatio < massRatio && wRatio > 1.0,
        s"τ=0.5 must flatten: mass $massRatio vs weight $wRatio")
    }
  }

  test("dupSpanCoverage: hand-computed interval unions; unique/short docs score 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),            // all three 3-grams shared with doc 4
      (2L, "z z a b c q"),          // only "a b c" (pos 3) shared -> covers 3..5
      (3L, "all unique words here"),
      (4L, "a b c d e"),            // exact copy of doc 1
      (5L, "x y")                   // too short for a 3-gram
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanCoverage(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((5L, 5L)), s"doc 1: ${got(1L)}") // [1,3]∪[2,4]∪[3,5] = [1,5]
    assert(got(2L) == ((6L, 3L)), s"doc 2: ${got(2L)}") // [3,5] of 6 tokens
    assert(got(3L) == ((4L, 0L)))
    assert(got(4L) == ((5L, 5L)))
    assert(got(5L) == ((2L, 0L)))
  }

  test("dsirWeights: target vocabulary outranks off-target; partition-invariant") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "alpha beta gamma delta"),
      (2L, "en", "alpha beta gamma epsilon"),
      (3L, "fr", "alpha beta gamma delta"),  // target-looking text, off-target label
      (4L, "fr", "omega psi chi phi"),       // vocabulary absent from the target
      (5L, "fr", "omega psi chi alpha")
    ).toDF("doc_id", "lang", "text")
    def weights(df: org.apache.spark.sql.DataFrame) =
      LangModel.dsirWeights(df, "doc_id", "text", col("lang") === "en")
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val w = weights(docs)
    assert(w(3L) > w(4L), s"target-vocab doc must outrank off-target: $w")
    assert(w(1L) == w(3L), "identical text must get an identical weight")
    // the ordered fold must make the weight independent of data layout
    assert(weights(docs.repartition(7)) == w, "weights changed under repartition")
  }

  test("perplexityBuckets: bucket boundaries respect scores; sizes near terciles") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val rows = LangModel.perplexityBuckets(docs, "doc_id", "text").collect()
    val byBucket = rows.groupBy(_.getString(2))
      .view.mapValues(_.map(_.getDouble(1)).toSeq).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(byBucket("head").min >= byBucket("middle").max,
      "a middle doc scored above a head doc")
    assert(byBucket("middle").min >= byBucket("tail").max,
      "a tail doc scored above a middle doc")
    val n = rows.length
    byBucket.values.foreach(b =>
      assert(b.size > n / 6 && b.size < n / 2, s"bucket sizes skewed: ${
        byBucket.view.mapValues(_.size).toMap}"))
  }

  test("gopherRules: each rule trips on its own pathology, good doc keeps") {
    import spark.implicits._
    import graft.pipelines.Corpus
    val goodBody = ("the quick brown fox jumps over a lazy dog and " * 6).trim
    val docs = Seq(
      (1L, goodBody),                                        // 60 words, keeps
      (2L, "the a of and to in"),                            // too few words
      (3L, ("supercalifragilisticexpialidocious " * 60).trim +
        " the a of"),                                        // mean word len > 10
      (4L, (("## " * 30) + goodBody).trim),                  // symbols + non-alpha words
      (5L, (1 to 60).map(_ => "42").mkString(" ") + " the a"), // no alphabetic words
      (6L, ("zig zag fox " * 20).trim))                      // < 2 stopwords
      .toDF("doc_id", "text")
    val got = Corpus.gopherRules(docs, "doc_id", "text", minWords = 50)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Boolean]("keep"), s"good doc dropped: ${got(1L)}")
    assert(!got(2L).getAs[Boolean]("r_wordcount"))
    assert(!got(3L).getAs[Boolean]("r_wordlen"))
    assert(!got(4L).getAs[Boolean]("r_alpha") ||
      !got(4L).getAs[Boolean]("r_symbol"), s"symbol doc survived: ${got(4L)}")
    assert(!got(5L).getAs[Boolean]("r_alpha"))
    assert(!got(6L).getAs[Boolean]("r_stopwords"))
    Seq(2L, 3L, 4L, 5L, 6L).foreach(id =>
      assert(!got(id).getAs[Boolean]("keep"), s"doc $id kept"))
    // integer-rule / reported-ratio consistency on the good doc
    val g = got(1L)
    assert(g.getAs[Long]("n_words") == 60)
    assert(g.getAs[Double]("mean_word_len") >= 3.0 &&
      g.getAs[Double]("mean_word_len") <= 10.0)
    assert(g.getAs[Double]("frac_alpha") == 1.0)
  }
}
