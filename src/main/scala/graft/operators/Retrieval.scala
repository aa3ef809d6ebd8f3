package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Pmath, Text}

/** Text retrieval / ranking primitives (SURVEY.md §2.10 extension
  * surface): BM25 query ranking, TF-IDF term weighting, and the inverted
  * index itself — the IR side of a training-data pipeline (query-based
  * corpus selection, relevance filtering, search-index exports).
  *
  * Scale shape, all three: tokenize narrow → ONE shuffle keyed on term
  * (or doc) → hash aggregates; corpus statistics (N, avgdl) are
  * single-row aggregates crossJoin'ed (broadcast of one row), per-term
  * statistics join on the term key. Nothing concentrates a full corpus
  * per task and nothing is all-pairs.
  *
  * Float determinism: per-term score components are pivoted to COLUMNS
  * and added in a fixed left-to-right order — never `sum()` over a
  * nondeterministically-ordered double set — so scores are bit-identical
  * across partitionings and replayable by a SQL oracle.
  */
object Retrieval {

  /** Per-document token-occurrence rows (every occurrence counts). */
  private def occurrences(df: DataFrame, idCol: String, textCol: String) =
    df.select(col(idCol).as("doc"),
      explode(Text.tokens(col(textCol))).as("term"))

  /** Okapi BM25 ranking of documents against a bag-of-terms query.
    * Returns the `k` highest-scoring documents (ties broken by doc id)
    * with their scores and ranks.
    *
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5))  (the always-positive
    * Robertson–Sparck-Jones form, via [[Pmath.lnColumn]] — libm ln
    * differs across engines in the last ulp, the portable series does
    * not), tf component =
    * tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)). Terms absent from a doc
    * contribute 0 (coalesce), so conjunctive-ish queries still rank
    * partial matches. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    val occ = occurrences(df, idCol, textCol)
    val dl = occ.groupBy("doc").agg(count(lit(1)).as("dl"))
    // corpus stats: one row (N, avgdl) — broadcast by construction
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    // per query term: document frequency (docs containing the term)
    val tf = occ.filter(col("term").isin(queryTerms: _*))
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", idf(col("n_docs"), col("df")))
      .withColumn("s",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    // pivot per-term contributions to columns, add LEFT-TO-RIGHT in the
    // queryTerms order: a sum() over doubles would be partition-order-
    // dependent and irreproducible bit-for-bit
    val perTerm = scored.groupBy("doc")
      .agg(queryTerms.map(t =>
        max(when(col("term") === t, col("s"))).as(s"s_$t")).head,
        queryTerms.tail.map(t =>
          max(when(col("term") === t, col("s"))).as(s"s_$t")): _*)
    val total = queryTerms.map(t => coalesce(col(s"s_$t"), lit(0.0)))
      .reduceLeft(_ + _)
    // global top-k via orderBy+limit (TakeOrderedAndProject: per-partition
    // heaps, driver merges k rows — scalable, unlike an unpartitioned
    // window over the full match set); the rank window then runs over k
    // rows only, which is single-task by design
    perTerm.select(col("doc").as("doc_id"), total.as("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id").asc)))
  }

  /** Top-`k` terms per document by TF-IDF weight (tf · ln(N/df), raw
    * counts), ties broken by term — the standard per-document keyword /
    * feature extraction. The rank window partitions BY DOC, so window
    * state per task is one document's term list, never the corpus. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 3, minDf: Int = 1): DataFrame = {
    val occ = occurrences(df, idCol, textCol).filter(col("term") =!= "")
    val tf = occ.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    // corpus size: one-row aggregate, broadcast — never a driver action
    // inside the plan
    val stats = df.agg(count(lit(1)).cast("double").as("n_docs"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("tfidf", col("tf") * Pmath.lnColumn(col("n_docs") / col("df")))
      .withColumn("rank", row_number().over(Window.partitionBy("doc")
        .orderBy(col("tfidf").desc, col("term").asc)))
      .filter(col("rank") <= k)
      .select(col("doc").as("doc_id"), col("term"), col("tfidf"),
        col("rank"))
  }

  /** The inverted index: per term, document frequency, collection
    * frequency, and the sorted distinct posting list of document ids.
    * `minDf` drops hapax noise (and bounds output rows); posting lists
    * are sorted arrays so the result is deterministic and comparable.
    * At 100 TB the posting list of a stop-word is the classic skew cell —
    * `maxPostings` truncates the ARRAY (keeping df/cf exact) the way
    * real indexes tier their postings. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    minDf: Int = 2, maxPostings: Int = 1000): DataFrame = {
    val occ = occurrences(df, idCol, textCol).filter(col("term") =!= "")
    occ.groupBy("term")
      .agg(countDistinct(col("doc")).as("df"),
        count(lit(1)).as("cf"),
        slice(sort_array(collect_set(col("doc"))), 1, maxPostings)
          .as("postings"))
      .filter(col("df") >= minDf)
  }

  /** Column form of the BM25 idf, exposed for reuse/tests. */
  def idf(nDocs: Column, df: Column): Column =
    Pmath.lnColumn(lit(1.0) + (nDocs - df + lit(0.5)) / (df + lit(0.5)))
}
