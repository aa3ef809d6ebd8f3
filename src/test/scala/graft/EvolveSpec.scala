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
