package graft

import graft.operators.Fuzzy

/** Deletion-neighborhood blocking must find EVERY distance-1 pair kind
  * (substitution, insertion, deletion) and nothing farther. */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("substitution, insertion, deletion found; distance>=2 and dups excluded") {
    val keys = Seq(
      "abcd",  // base
      "abxd",  // substitution at 2      -> pair with abcd
      "abd",   // deletion of c          -> pair with abcd, abxd
      "abcde", // insertion of e         -> pair with abcd
      "axxd",  // distance 2 from abcd   -> pair with abxd only
      "abcd",  // duplicate: equal keys are NOT a fuzzy pair
      "zzzz")  // far from everything
      .toDF("k")
    val got = Fuzzy.editDistance1Pairs(keys, "k")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("abcd", "abxd"), ("abcd", "abd"), ("abd", "abxd"),
      ("abcd", "abcde"), ("abxd", "axxd")), s"got $got")
  }

  test("blocking == brute force on the supplier fixture") {
    val sup = Tables.load(spark, "/root/testdata/sf0.001", "supplier")
    val got = Fuzzy.editDistance1Pairs(sup, "s_name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    import org.apache.spark.sql.functions._
    val k = sup.select(col("s_name").as("k")).distinct()
    val brute = k.as("a").crossJoin(k.as("b"))
      .filter(col("a.k") < col("b.k") &&
        levenshtein(col("a.k"), col("b.k")) === 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == brute && got.nonEmpty, s"got=${got.size} brute=${brute.size}")
  }
}
