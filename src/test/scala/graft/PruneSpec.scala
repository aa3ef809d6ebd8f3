package graft

import org.apache.spark.sql.functions._
import graft.operators.{Prune, Sampling}

/** Bloom-pruned semi-join invariants: zero false negatives (the load-
  * bearing guarantee), bounded false-positive rate, partition-order
  * determinism of the merged sketch, and end-to-end equivalence with a
  * plain semi-join. Plus hash-reservoir determinism/uniformity. */
class PruneSpec extends SparkSpec {
  import spark.implicits._

  test("bloom membership: no false negatives, FPR within 3x of target") {
    val members = (1L to 2000L).map(_ * 7)
    val bytes = Prune.buildBloom(members.toDF("k"), "k", fpp = 0.01)

    val memberHits = members.toDF("k")
      .where(Prune.mightContain(col("k"), bytes)).count()
    assert(memberHits == members.size.toLong,
      "bloom must never drop a true member")

    // probe 20k guaranteed non-members
    val nonMembers = (1L to 20000L).map(_ * 7 + 3)
    val fp = nonMembers.toDF("k")
      .where(Prune.mightContain(col("k"), bytes)).count()
    val fpr = fp.toDouble / nonMembers.size
    assert(fpr < 0.03, s"observed FPR $fpr exceeds 3x the 1% target")
  }

  test("sketch is partition-order independent (bitwise-OR merge)") {
    val keys = (1L to 5000L).map(i => i * 13 % 9973)
    val one = Prune.buildBloom(keys.toDF("k").coalesce(1), "k", fpp = 0.01,
      expectedItems = keys.size)
    val many = Prune.buildBloom(keys.toDF("k").repartition(7), "k", fpp = 0.01,
      expectedItems = keys.size)
    assert(java.util.Arrays.equals(one, many),
      "equally-sized bloom merge must be deterministic across partitionings")
  }

  test("bloomSemiJoin equals the plain semi-join; inexact mode only adds rows") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val sup = Tables.load(spark, "/root/testdata/sf0.001", "supplier")
      .where(col("s_acctbal") > 5000)

    val viaBloom = Prune.bloomSemiJoin(li, "l_suppkey", sup, "s_suppkey")
    val exact = li.join(sup.select(col("s_suppkey").as("k")).distinct(),
      col("l_suppkey") === col("k"), "leftsemi")
    assert(viaBloom.exceptAll(exact).isEmpty && exact.exceptAll(viaBloom).isEmpty,
      "bloom pre-filter + residual join must reproduce the semi-join exactly")

    val inexact = Prune.bloomSemiJoin(li, "l_suppkey", sup, "s_suppkey",
      exact = false)
    assert(exact.exceptAll(inexact).isEmpty,
      "exact=false may keep false positives but must never lose a match")
  }

  test("string keys: byte-level probes, no false negatives, bounded FPR") {
    val members = (1 to 3000).map(i => s"doc chunk fingerprint $i")
    val bytes = Prune.buildBloom(members.toDF("k"), "k", fpp = 0.01)
    val hits = members.toDF("k")
      .where(Prune.mightContain(col("k"), bytes)).count()
    assert(hits == members.size.toLong, "string member dropped")
    val fp = (1 to 20000).map(i => s"absent fingerprint $i").toDF("k")
      .where(Prune.mightContain(col("k"), bytes)).count()
    assert(fp.toDouble / 20000 < 0.03, s"string FPR ${fp / 20000.0}")
    // semi-join equivalence on a string key
    val big = (1 to 500).map(i => (i.toLong, s"doc chunk fingerprint ${i * 7}"))
      .toDF("id", "k")
    val viaBloom = Prune.bloomSemiJoin(big, "k", members.toDF("k"), "k")
      .select("id").collect().map(_.getLong(0)).toSet
    val exact = big.join(members.toDF("k").distinct(), Seq("k"), "leftsemi")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(viaBloom == exact)
  }

  test("null keys never probe true and never enter the sketch") {
    val bytes = Prune.buildBloom(
      Seq(Some(1L), None, Some(2L)).toDF("k"), "k", fpp = 0.01)
    val probed = Seq(Some(1L), None, Some(99L)).toDF("k")
      .where(Prune.mightContain(col("k"), bytes))
      .collect().map(_.getLong(0)).toSet
    assert(probed == Set(1L), s"got $probed")
  }

  test("plan: bloom probe filters the fact scan BEFORE any exchange") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val sup = Tables.load(spark, "/root/testdata/sf0.001", "supplier")
      .where(col("s_acctbal") > 5000)
    val plan = graft.operators.Prune
      .bloomSemiJoin(li, "l_suppkey", sup, "s_suppkey")
      .groupBy("l_suppkey").count()
      .queryExecution.executedPlan.toString
    assert(plan.contains("mightcontainbloom"),
      s"probe expression missing from plan:\n$plan")
    // structural property: the probe's Filter sits DIRECTLY on the fact
    // scan (its immediate child line is the parquet scan) — nothing, in
    // particular no Exchange, between probe and scan
    val lines = plan.linesIterator.toVector
    val i = lines.indexWhere(_.contains("mightcontainbloom"))
    assert(i >= 0 && i + 1 < lines.size &&
      lines(i + 1).toLowerCase.contains("scan") &&
      lines(i + 1).contains("lineitem"),
      s"probe filter must sit directly on the lineitem scan:\n" +
        lines.slice(i, i + 2).mkString("\n"))
  }

  test("property: bloom semi-join ≡ semi-join on random key sets (5 seeded trials)") {
    val rng = new scala.util.Random(99)
    for (trial <- 1 to 5) {
      val big = (1 to 2000).map(_ => rng.nextInt(500).toLong).toDF("k")
      val small = (1 to (rng.nextInt(80) + 1)).map(_ => rng.nextInt(500).toLong)
        .toDF("k")
      val viaBloom = Prune.bloomSemiJoin(big, "k", small, "k",
        fpp = 0.05).collect().map(_.getLong(0)).sorted
      val smallSet = small.collect().map(_.getLong(0)).toSet
      val exact = big.collect().map(_.getLong(0)).filter(smallSet).sorted
      assert(viaBloom.sameElements(exact), s"trial $trial diverged")
    }
  }

  test("hashReservoir: deterministic across partitionings, exactly k per group") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = Sampling.hashReservoir(docs.repartition(1), "source", "doc_id", 3)
      .select("source", "doc_id", "rk").collect().toSet
    val b = Sampling.hashReservoir(docs.repartition(13), "source", "doc_id", 3)
      .select("source", "doc_id", "rk").collect().toSet
    assert(a == b, "sample must be a pure function of ids, not partitioning")
    val sizes = Sampling.hashReservoir(docs, "source", "doc_id", 3)
      .groupBy("source").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 3) && sizes.exists(_ == 3))
  }
}
