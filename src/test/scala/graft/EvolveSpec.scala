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
}
