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

  test("hot variant buckets are capped; coverage degrades as documented") {
    // 12 near-clone keys "k0".."k9","ka","kb": every pair is a
    // substitution at position 2, and their ONLY shared variant is "k"
    // (delete the last char) — a 12-key hot bucket
    val clones = (('0' to '9') ++ Seq('a', 'b')).map(c => s"k$c").toDF("k")
    val capped = Fuzzy.editDistance1Pairs(clones, "k", maxBucket = 5)
      .collect()
    // the hot bucket exceeds the cap and is dropped: no candidate pairs
    // ever materialize (bounded fanout), documented coverage loss
    assert(capped.isEmpty, s"cap did not bound the hot bucket: ${capped.length}")
    // with the cap above the bucket size every pair is found: 12C2 = 66
    val full = Fuzzy.editDistance1Pairs(clones, "k", maxBucket = 100)
      .collect()
    assert(full.length == 66, s"expected 66 clone pairs, got ${full.length}")
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
