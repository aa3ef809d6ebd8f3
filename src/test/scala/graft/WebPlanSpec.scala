package graft

import org.apache.spark.sql.functions._
import graft.functions.Web
import graft.pipelines.Corpus
import graft.operators.Sketches

/** Physical-plan shape of the web-curation wave — the 100 TB
  * properties: the hot-line set joins back as a BROADCAST anti-join
  * (never a corpus×corpus shuffle), the HTML/URL passes stay inside
  * whole-stage codegen with zero exchanges, domain capping pushes a
  * group limit below its window, and the KMV set-algebra path plans
  * TakeOrdered (bounded heaps), never a global sort. */
class WebPlanSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("lineDedup anti-joins the hot-line set by BROADCAST; doc rebuild is the only wide agg chain") {
    val docs = (1 to 200).map(i => (i.toLong, s"nav bar\ndoc $i body\nfooter"))
      .toDF("doc_id", "text")
    val plan = planOf(Corpus.lineDedup(docs, "doc_id", "text", minDocs = 50L))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"hot-line filter must be a broadcast anti-join:\n$plan")
    assert(!plan.contains("SortMergeJoin") || plan.contains("doc_id"),
      s"no corpus-sized shuffle join on the line key:\n$plan")
  }

  test("lineDedup with broadcastHot=false plans no forced broadcast of the hot side") {
    val docs = (1 to 200).map(i => (i.toLong, s"nav bar\ndoc $i body\nfooter"))
      .toDF("doc_id", "text")
    val df = Corpus.lineDedup(docs, "doc_id", "text", minDocs = 50L,
      broadcastHot = false)
    // the logical plan must carry no broadcast HINT — AQE may still
    // CHOOSE broadcast from measured sizes, which is the point
    val logical = df.queryExecution.analyzed.toString
    assert(!logical.contains("ResolvedHint"),
      s"broadcastHot=false must not force a broadcast hint:\n$logical")
  }

  test("stripHtml + url dissection: zero exchanges, single codegen stage") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(Web.stripHtml(col("text")).as("c"))
      .select(col("c"), Web.urlHost(col("c")), Web.urlPathDepth(col("c")))
    val plan = planOf(df)
    assert(!plan.contains("Exchange"),
      s"narrow text passes must not shuffle:\n$plan")
    // executedPlan.toString marks whole-stage-codegen stages as "*(n)"
    assert(plan.contains("*(1)"),
      s"text passes must stay codegen'd:\n$plan")
  }

  test("domainCap pushes the cap below the window (WindowGroupLimit), never a global sort") {
    val docs = (1 to 5000).map(i => (s"d${i % 7}", i.toLong, i))
      .toDF("source", "doc_id", "n_chars")
    val plan = planOf(Corpus.domainCap(docs, "source", "doc_id", "n_chars", 10))
    assert(plan.contains("WindowGroupLimit"),
      s"row_number<=cap must push a pre-shuffle group limit:\n$plan")
  }

  test("kmvSetOps plans TakeOrdered on both sketch sides — bounded heaps, no global Sort+Exchange") {
    val a = (1 to 2000).map(_.toLong).toDF("v")
    val b = (1000 to 3000).map(_.toLong).toDF("v")
    val plan = planOf(Sketches.kmvSetOps(a, b, "v", k = 64))
    assert(plan.contains("TakeOrderedAndProject"),
      s"ORDER BY h LIMIT k must plan TakeOrdered, not a global sort:\n$plan")
  }
}
