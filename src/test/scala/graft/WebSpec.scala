package graft

import org.apache.spark.sql.functions._
import graft.functions.Web
import graft.pipelines.Corpus

/** Web-corpus curation wave: HTML strip, URL dissection, cross-doc
  * line dedup, per-domain quota. Every case here is a planted-truth
  * check — the graded queries' differential oracles prove engine
  * agreement; these prove the OPERATOR semantics on adversarial
  * inputs the synthetic fixture can't produce. */
class WebSpec extends SparkSpec {
  import spark.implicits._

  test("stripHtml: drops script/style WITH contents, tags, comments; decodes entities; collapses whitespace") {
    val cases = Seq(
      ("<p>hello <b>world</b></p>", "hello world"),
      // removed blocks leave a space (words must not fuse across them)
      ("<script>var a = '<p>not text</p>';</script>before<SCRIPT src=\"x.js\">x</SCRIPT>after", "before after"),
      ("<style>p { color: red }</style>text", "text"),
      ("<!-- hidden <b>comment</b> -->shown", "shown"),
      ("a&nbsp;b&amp;c&lt;d&gt;e&quot;f&#39;g", "a b&c<d>e\"f'g"),
      ("  lots   of\n\t whitespace  ", "lots of whitespace"),
      // entity decode runs LAST: encoded markup must NOT be stripped
      ("&lt;script&gt;alert(1)&lt;/script&gt;", "<script>alert(1)</script>"),
      ("", ""))
    val got = cases.map(_._1).toDF("html")
      .select(Web.stripHtml(col("html"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("url parts: host lowercased sans userinfo/port, 2-label domain, path, depth, query/fragment strip") {
    val url = "https://User:pw@WWW.News.Example.ORG:8443/a/b/c?q=1&r=2#frag"
    val row = Seq(url).toDF("u").select(
      Web.urlHost(col("u")), Web.urlDomain(col("u")), Web.urlPath(col("u")),
      Web.urlPathDepth(col("u")), Web.urlStrip(col("u")))
      .as[(String, String, String, Int, String)].head()
    assert(row == (("www.news.example.org", "example.org", "/a/b/c", 3,
      "https://User:pw@WWW.News.Example.ORG:8443/a/b/c")))
  }

  test("url parts: bare authority, no dot host, non-url garbage") {
    val rows = Seq("http://localhost", "ftp://Host.TLD/", "not a url")
      .toDF("u").select(Web.urlHost(col("u")).as("h"),
        Web.urlDomain(col("u")).as("d"), Web.urlPathDepth(col("u")).as("n"))
      .as[(String, String, Int)].collect().toSeq
    assert(rows == Seq(("localhost", "localhost", 0),
      ("host.tld", "host.tld", 0), ("", "", 0)))
  }

  test("lineDedup: drops exactly the lines shared by >= minDocs docs, rebuilds in order, empties full-boilerplate docs") {
    val docs = Seq(
      (1L, "COOKIE NOTICE\nalpha one\nFOOTER\nbeta two"),
      (2L, "COOKIE NOTICE\ngamma three\nFOOTER"),
      (3L, "COOKIE NOTICE\ndelta four"),
      (4L, "COOKIE NOTICE\nFOOTER"), // nothing survives
      (5L, "unique only")).toDF("doc_id", "text")
    val got = Corpus.lineDedup(docs, "doc_id", "text", minDocs = 2L)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "alpha one\nbeta two", 2L, 2L),
      (2L, "gamma three", 1L, 2L),
      (3L, "delta four", 1L, 1L),
      (4L, "", 0L, 2L),
      (5L, "unique only", 1L, 0L)))
  }

  test("lineDedup: duplicate line WITHIN one doc does not count as cross-doc boilerplate") {
    val docs = Seq((1L, "x\nx\nx"), (2L, "y")).toDF("doc_id", "text")
    val got = Corpus.lineDedup(docs, "doc_id", "text", minDocs = 2L)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    // "x" appears 3 times but in ONE doc — document frequency 1, kept
    assert(got == Seq((1L, "x\nx\nx", 3L, 0L), (2L, "y", 1L, 0L)))
  }

  test("source overlap counts DISTINCT shared shingle fingerprints, once per source pair") {
    // srcA and srcB share exactly one 5-gram ("a b c d e", twice in B's
    // docs — must still count once); srcC shares nothing
    val docs = Seq(
      ("A", 1L, "a b c d e f g"),
      ("B", 2L, "z a b c d e"),
      ("B", 3L, "a b c d e y"),
      ("C", 4L, "q r s t u v")).toDF("source", "doc_id", "text")
    val fps = docs.select(col("source"),
        graft.functions.Text.explodeWordShingles(col("text"), 5).as("sh"))
      .select(col("source"), md5(col("sh")).as("fp")).distinct()
    val m = fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .as[(String, String, Long)].collect().toSeq
    assert(m == Seq(("A", "B", 1L)))
  }

  test("domainCap: keeps top-cap per domain by score, ties to smaller id; partitioning-independent") {
    val docs = (1L to 30L).map(i => (s"d${i % 3}", i, (i % 5).toInt))
      .toDF("source", "doc_id", "n_chars")
    val got = Corpus.domainCap(docs, "source", "doc_id", "n_chars", cap = 3)
    assert(got.count() == 9)
    // every kept rank <= 3, and within a domain ranks are 1..3 distinct
    val perDomain = got.groupBy("domain")
      .agg(collect_set(col("rk")).as("rks")).as[(String, Seq[Int])]
      .collect().toMap
    assert(perDomain.values.forall(_.sorted == Seq(1, 2, 3)))
    // deterministic under repartition: same survivor set
    val again = Corpus.domainCap(docs.repartition(7, col("doc_id")),
      "source", "doc_id", "n_chars", cap = 3)
    assert(got.select("doc_id").except(again.select("doc_id")).count() == 0)
    assert(again.select("doc_id").except(got.select("doc_id")).count() == 0)
  }
}
