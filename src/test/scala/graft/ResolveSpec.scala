package graft

import org.apache.spark.sql.functions._
import graft.operators.Resolve

class ResolveSpec extends SparkSpec {
  import spark.implicits._

  private def resolve(rows: Seq[(Long, String, Int)],
                      maxEdits: Int = 1, maxBlock: Int = 1000) =
    Resolve.entityResolve(rows.toDF("id", "nm", "grp"), "id", "nm", "grp",
        maxEdits = maxEdits, maxBlock = maxBlock)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("transitive clustering: prefix and suffix typos connect only THROUGH the clean record") {
    // canon("Smith-100") = "smith100"; B/C are 1 edit from clean but 2
    // edits from each other — one entity regardless
    val got = resolve(Seq(
      (1L, "Smith-100", 5), (2L, "Smith 100x", 5), (3L, "xSmith-100", 5),
      (9L, "Jones-200", 5)))
    assert(got == Seq((1L, 1L, 1L, 3L), (2L, 1L, 1L, 3L),
      (3L, 1L, 1L, 3L), (9L, 9L, 9L, 1L)))
  }

  test("digit-skeleton blocking: same digits + different group, or different digits, never pair") {
    val got = resolve(Seq(
      (1L, "Smith-100", 5), (2L, "Smith-100", 6), // other nation
      (3L, "Smith-101", 5))) // digit typo = other block
    assert(got.map(r => (r._1, r._4)) == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("maxEdits bounds the verify: 2-edit variants need maxEdits=2") {
    val rows = Seq((1L, "Acme-77", 1), (2L, "xxAcme-77", 1))
    assert(resolve(rows, maxEdits = 1).map(_._4) == Seq(1L, 1L))
    assert(resolve(rows, maxEdits = 2).map(_._4) == Seq(2L, 2L))
  }

  test("maxBlock drops pathological blocks (all-same-skeleton flood stays unclustered)") {
    // letter-only variants: the digit skeleton stays "500" for all 20
    val flood = (1L to 20L).map(i => (i, s"Corp-500 v${('a' + i).toChar}", 9))
    val got = resolve(flood, maxEdits = 3, maxBlock = 10)
    assert(got.forall(_._4 == 1L), "capped block must yield singletons")
    // and under the cap the same flood clusters
    val small = resolve(flood.take(3), maxEdits = 3, maxBlock = 10)
    assert(small.forall(_._4 == 3L))
  }

  test("entityResolveScored with a Jaro-Winkler gate links what the edit-count gate cannot") {
    val rows = Seq((1L, "Medina-Insurance-9907", 4),
      (2L, "Medina Insurance 9907xy", 4), // 2 trailing edits after canon
      (9L, "Other-Insurance-9907", 4))    // same digits, low similarity
    def run(verify: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column) =
      graft.operators.Resolve.entityResolveScored(rows.toDF("id", "nm", "grp"),
          "id", "nm", "grp", Seq(graft.operators.Resolve.digitSkeleton), verify)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val lev1 = run((a, b) => levenshtein(a, b) <= 1)
    assert(lev1.forall(_._4 == 1L), "2-edit variant out of lev<=1 reach")
    val jw = run((a, b) => graft.functions.Text.jaroWinkler(a, b) >= 0.9)
    assert(jw.map(r => (r._1, r._2, r._4)) ==
      Seq((1L, 1L, 2L), (2L, 1L, 2L), (9L, 9L, 1L)),
      s"jw gate must link 1-2 but not 9: $jw")
  }

  test("jaroWinkler: textbook values, DuckDB-locked edges, SQL registration") {
    import graft.plans.JaroWinkler.similarity
    assert(math.abs(similarity("MARTHA", "MARHTA") - 0.9611111111111111) == 0.0)
    assert(math.abs(similarity("DIXON", "DICKSONX") - 0.8133333333333332) == 0.0)
    assert(similarity("CRATE", "TRACE") == 0.7333333333333334) // no prefix → no boost
    assert(similarity("abcdzzzzzz", "abcdqqqqqq") == 0.6) // jaro <= 0.7 → boost suppressed
    assert(similarity("a", "a") == 1.0 && similarity("abc", "abc") == 1.0)
    assert(similarity("ab", "ba") == 0.0) // window 0 admits same-position only
    assert(similarity("", "") == 0.0 && similarity("a", "") == 0.0) // DuckDB convention
    assert(similarity("MARTHA", "MARHTA") == similarity("MARHTA", "MARTHA"))
    // Column + SQL surfaces agree; null propagates
    graft.plans.GraftExtensions.register(spark)
    val row = spark.sql(
      "SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS a, graft_jaro_winkler(NULL, 'x') AS b")
      .collect().head
    assert(row.getDouble(0) == 0.9611111111111111 && row.isNullAt(1))
    val viaCol = Seq(("MARTHA", "MARHTA")).toDF("a", "b")
      .select(graft.functions.Text.jaroWinkler(col("a"), col("b")))
      .collect().head.getDouble(0)
    assert(viaCol == 0.9611111111111111)
  }

  test("golden record is the minimum id of each cluster; every input row labeled") {
    val got = resolve(Seq(
      (42L, "A-1", 0), (7L, "A-1x", 0), (100L, "xA-1", 0)))
    assert(got.map(_._3).distinct == Seq(7L))
    assert(got.map(_._1) == Seq(7L, 42L, 100L))
  }
}
