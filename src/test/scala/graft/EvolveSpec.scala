package graft

import org.apache.spark.sql.functions._
import graft.operators.Evolve

/** MERGE/CDC semantics edges: null update values must OVERWRITE (the
  * difference between MERGE and a naive coalesce), and diff must be
  * null-safe per column. */
class EvolveSpec extends SparkSpec {
  import spark.implicits._

  test("upsertScd1: replace, insert, persist — and null values overwrite") {
    val current = Seq((1L, Some("a"), 10), (2L, Some("b"), 20), (3L, Some("c"), 30))
      .toDF("k", "name", "v")
    val updates = Seq((2L, None: Option[String], 21), (9L, Some("new"), 90))
      .toDF("k", "name", "v")
    val got = Evolve.upsertScd1(current, updates, "k")
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), r.getInt(2))).toMap
    assert(got(1L) == (Some("a"), 10))         // persisted
    assert(got(2L) == (None, 21), "null in update row must overwrite")
    assert(got(9L) == (Some("new"), 90))       // inserted
    assert(got.size == 4)
  }

  test("applyScd2: closes changed, opens new, no-ops unchanged, keeps history") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val dim = Seq(
      (1L, "a", Some(t("2015-01-01 00:00:00")), Some(t("2020-01-01 00:00:00"))), // history
      (1L, "b", Some(t("2020-01-01 00:00:00")), None), // current, will change
      (2L, "x", Some(t("2020-01-01 00:00:00")), None), // current, update identical
      (3L, "y", Some(t("2020-01-01 00:00:00")), None)) // current, no update
      .toDF("k", "attr", "valid_from", "valid_to")
    val updates = Seq((1L, "b2"), (2L, "x"), (9L, "fresh")).toDF("k", "attr")
    val got = Evolve.applyScd2(dim, updates, "k", "2026-01-01 00:00:00")
    val rows = got.collect().map(r => (r.getLong(0), r.getString(1),
      Option(r.get(2)).map(_.toString), Option(r.get(3)).map(_.toString))).toSet
    assert(rows == Set(
      (1L, "a", Some("2015-01-01 00:00:00.0"), Some("2020-01-01 00:00:00.0")),
      (1L, "b", Some("2020-01-01 00:00:00.0"), Some("2026-01-01 00:00:00.0")),
      (1L, "b2", Some("2026-01-01 00:00:00.0"), None),
      (2L, "x", Some("2020-01-01 00:00:00.0"), None), // unchanged: untouched
      (3L, "y", Some("2020-01-01 00:00:00.0"), None),
      (9L, "fresh", Some("2026-01-01 00:00:00.0"), None)), s"got $rows")
  }

  test("mergeAggregates: one-sided keys, null key group, decimal exactness") {
    val base = Seq((Some(1L), BigDecimal("10.50"), 2L),
      (Some(2L), BigDecimal("5.00"), 1L),
      (None: Option[Long], BigDecimal("1.00"), 1L))
      .toDF("k", "s", "n")
    val delta = Seq((Some(2L), BigDecimal("2.25"), 3L),
      (Some(9L), BigDecimal("7.00"), 1L),
      (None: Option[Long], BigDecimal("0.50"), 2L))
      .toDF("k", "s", "n")
    val got = Evolve.mergeAggregates(base, delta, "k")
      .collect().map(r => Option(r.get(0)) ->
        (r.getDecimal(1).toPlainString, r.getLong(2))).toMap
    assert(got(Some(1L))._1.startsWith("10.5") && got(Some(1L))._2 == 2L) // base-only
    assert(got(Some(2L))._1.startsWith("7.25") && got(Some(2L))._2 == 4L)
    assert(got(Some(9L))._1.startsWith("7.0") && got(Some(9L))._2 == 1L)
    assert(got(None)._1.startsWith("1.5") && got(None)._2 == 3L,
      "null key groups must merge via null-safe equality")
  }

  test("mergeAggregates: both-null merges to null, schema stays stable") {
    // SUM over an all-null group is NULL in SQL; a merge that coalesces
    // to 0 would diverge from the full recompute on exactly that edge
    val base = Seq((1L, Option.empty[java.math.BigDecimal], 1L),
      (2L, Option(new java.math.BigDecimal("3.00")), 1L)).toDF("k", "s", "n")
      .withColumn("s", col("s").cast("decimal(18,2)"))
    val delta = Seq((1L, Option.empty[java.math.BigDecimal], 2L),
      (3L, Option(new java.math.BigDecimal("4.00")), 1L)).toDF("k", "s", "n")
      .withColumn("s", col("s").cast("decimal(18,2)"))
    val once = Evolve.mergeAggregates(base, delta, "k")
    val got = once.collect().map(r => r.getLong(0) ->
      (Option(r.getDecimal(1)).map(_.toPlainString), r.getLong(2))).toMap
    assert(got(1L) == (None, 3L), "all-null sums must merge to null, not 0")
    assert(got(2L) == (Some("3.00"), 1L) && got(3L) == (Some("4.00"), 1L))
    // repeated merges must not widen decimal precision toward the 38 cap
    val twice = Evolve.mergeAggregates(once, delta, "k")
    assert(twice.schema("s").dataType == base.schema("s").dataType,
      s"schema drifted: ${twice.schema("s").dataType}")
  }

  test("snapshotDiff: added / removed / changed, null-safe") {
    val before = Seq((1L, Some(10)), (2L, Some(20)), (3L, None: Option[Int]))
      .toDF("k", "v")
    val after = Seq((2L, Some(21)), (3L, None: Option[Int]), (4L, Some(40)))
      .toDF("k", "v")
    val got = Evolve.snapshotDiff(before, after, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "changed", 4L -> "added"),
      s"got $got") // 3L: null == null, unchanged, absent
  }

  test("applyCdc: last writer wins, deletes drop, untouched keys pass through") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v")
    val feed = Seq(
      (1L, "a1", 5L, "U"), (1L, "a2", 9L, "U"),   // two updates: v9 wins
      (2L, "xx", 3L, "U"), (2L, "xx", 7L, "D"),   // update then delete: gone
      (3L, "c1", 2L, "D"), (3L, "c2", 6L, "U"),   // delete then update: lives
      (5L, "e1", 1L, "U")                          // insert of a new key
    ).toDF("k", "v", "version", "op")
    def run(f: org.apache.spark.sql.DataFrame) =
      Evolve.applyCdc(base, f, "k", "version", "op")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = run(feed)
    assert(got == Map(1L -> "a2", 3L -> "c2", 4L -> "d", 5L -> "e1"),
      s"got $got")
    // version tie: 'U' outranks 'D' (op DESC) so the ordering is total
    val tie = Seq((4L, "t", 1L, "D"), (4L, "t2", 1L, "U"))
      .toDF("k", "v", "version", "op")
    val tieGot = run(tie)
    assert(tieGot(4L) == "t2" && tieGot(1L) == "a", s"tie: $tieGot")
    assert(run(feed.repartition(5)) == got, "cdc changed under repartition")
  }
}
