package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{EventOps, Sampling, Stats}

/** Round-6 wave semantics against in-memory brute force: sequential
  * pattern mining (gap windows, support prune), calibration binning
  * (integer-exact means, degenerate range), class balancing (exact
  * min-count per class, partition-proof hash order). */
class Wave7Spec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("seqPatterns3: gap-windowed triples, support prune, brute-force parity") {
    // u1: A B C D with tight gaps -> triples ABC, BCD
    // u2: A B C but the B->C gap breaks the window -> no triple
    // u3: A B C tight -> ABC (so ABC support=2, BCD support=1)
    val rows = Seq(
      (1L, ts(0), 1L, "A"), (1L, ts(10), 2L, "B"), (1L, ts(20), 3L, "C"),
      (1L, ts(30), 4L, "D"),
      (2L, ts(0), 5L, "A"), (2L, ts(10), 6L, "B"), (2L, ts(200), 7L, "C"),
      (3L, ts(0), 8L, "A"), (3L, ts(15), 9L, "B"), (3L, ts(25), 10L, "C"),
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.seqPatterns3(rows, "user_id", "ts", "event_id",
        "event_type", maxGapSec = 3600L, minKeys = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(("A", "B", "C", 2L, 2L)),
      s"expected only ABC with occ=2 keys=2, got $got")

    // no prune: BCD appears with support 1
    val all = EventOps.seqPatterns3(rows, "user_id", "ts", "event_id",
        "event_type", maxGapSec = 3600L, minKeys = 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(all == Set(("A", "B", "C"), ("B", "C", "D")), s"got $all")
  }

  test("seqPatterns3: same-timestamp ties ordered by id; partition-proof") {
    val rows = Seq(
      (1L, ts(0), 2L, "B"), (1L, ts(0), 1L, "A"), (1L, ts(5), 3L, "C"))
      .toDF("user_id", "ts", "event_id", "event_type")
    def run(df: org.apache.spark.sql.DataFrame) =
      EventOps.seqPatterns3(df, "user_id", "ts", "event_id", "event_type",
          3600L, 1L)
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(run(rows) == Set(("A", "B", "C")))
    assert(run(rows.repartition(7)) == Set(("A", "B", "C")))
  }

  test("calibrationCurve: integer-exact bins vs brute force; degenerate range") {
    // scores num/den spread over [0,1]; label = score above 0.5
    val data = (0 until 40).map { i =>
      (i.toLong, 40L, i >= 25) // s = i/40
    }.toDF("num", "den", "lab")
    val got = Stats.calibrationCurve(data, col("num"), col("den"),
        col("lab"), k = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // brute force: mn=0, mx=39/40; bin = floor((s-mn)/(mx-mn)*4) capped at 3
    val mn = 0.0; val mx = 39.0 / 40.0
    val expect = (0 until 40).groupBy { i =>
      math.min(math.floor((i / 40.0 - mn) / (mx - mn) * 4).toLong, 3L)
    }.map { case (b, is) =>
      b -> ((is.size.toLong, is.count(_ >= 25).toLong,
        is.map(_.toLong).sum.toDouble / (40.0 * is.size),
        is.count(_ >= 25).toDouble / is.size))
    }
    assert(got == expect, s"got $got\nexpect $expect")

    // all-equal scores: single bin 0, mean exact
    val flat = Seq((3L, 6L, true), (2L, 4L, false)).toDF("num", "den", "lab")
    val g2 = Stats.calibrationCurve(flat, col("num"), col("den"),
        col("lab"), k = 10).collect()
    assert(g2.length == 1 && g2.head.getLong(0) == 0L &&
      g2.head.getDouble(3) == 0.5 && g2.head.getDouble(4) == 0.5)
  }

  test("classBalance: exact min-count per class, deterministic, partition-proof") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val m = counts.values.min
    val got = Sampling.classBalance(docs, "lang", "doc_id")
    val gotCounts = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotCounts.keySet == counts.keySet, "a class vanished")
    assert(gotCounts.values.forall(_ == m), s"not balanced: $gotCounts (m=$m)")
    val a = got.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.classBalance(docs.repartition(13), "lang", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "selection must be partitioning-independent")
  }
}
