package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, EventOps}

/** Handcrafted edges for the round-3 event/text breadth operators:
  * funnel ordering+window rules, gap-fill densification, and the
  * winnowing guarantee (shared run ⇒ shared fingerprint). */
class EventBreadthSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: order matters, window bounds, ties count") {
    val events = Seq(
      // user 1: full funnel, in order, inside windows
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      // user 2: click BEFORE view — must not count as stage 2
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      // user 3: click outside the 1h window
      (3L, "view", ts("2024-01-01 10:00:00")),
      (3L, "click", ts("2024-01-01 11:00:01")),
      // user 4: click at the EXACT same ts as view (ties count, >= semantics)
      (4L, "view", ts("2024-01-01 10:00:00")),
      (4L, "click", ts("2024-01-01 10:00:00")),
      // user 5: never viewed
      (5L, "click", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = EventOps.funnel(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), windowSec = 3600L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 4L, 2 -> 2L, 3 -> 1L), s"got $got")
  }

  test("funnel: greedy earliest completion maximizes later stages") {
    // view 10:00; clicks at 10:30 and 10:50; purchase 11:20. The greedy
    // rule anchors stage 2 at the EARLIEST qualifying click (10:30), so
    // the 11:20 purchase is inside 10:30+1h. Anchoring at 10:50 would
    // also work here, but a non-greedy "latest" rule would shift windows
    // and is not what funnel analytics mean.
    val events = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:30:00")),
      (1L, "click", ts("2024-01-01 10:50:00")),
      (1L, "purchase", ts("2024-01-01 11:20:00")))
      .toDF("user_id", "event_type", "ts")
    val got = EventOps.funnel(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), windowSec = 3600L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 1L, 2 -> 1L, 3 -> 1L), s"got $got")
  }

  test("funnel: repeated stage needs a strictly later event") {
    // one click must not complete a click -> click funnel by itself
    val events = Seq(
      (1L, "click", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-01 10:20:00")))
      .toDF("user_id", "event_type", "ts")
    val got = EventOps.funnel(events, "user_id", "event_type", "ts",
      Seq("click", "click"), windowSec = 3600L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 2L, 2 -> 1L), s"got $got")
  }

  test("gapFillHourly: zero rows for silent hours, running total") {
    val events = Seq(
      (1L, ts("2024-01-01 10:10:00")), (1L, ts("2024-01-01 10:40:00")),
      (1L, ts("2024-01-01 13:05:00")),  // hours 11,12 silent
      (2L, ts("2024-01-01 00:30:00")))  // single-hour user: no gap rows
      .toDF("user_id", "ts")
    val got = EventOps.gapFillHourly(events, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val h0 = ts("2024-01-01 10:00:00").getTime / 3600000L
    assert(got((1L, h0)) == (2L, 2L))
    assert(got((1L, h0 + 1)) == (0L, 2L), "silent hour must appear with n=0")
    assert(got((1L, h0 + 2)) == (0L, 2L))
    assert(got((1L, h0 + 3)) == (1L, 3L))
    assert(got.count(_._1._1 == 1L) == 4 && got.count(_._1._1 == 2L) == 1)
  }

  test("timeWeightedAvg: step weights, tie order, single-event keys absent") {
    val events = Seq(
      // user 1: 10.0 held 10s, 20.0 held 30s, last value carries no weight
      (1L, 1L, ts("2024-01-01 10:00:00"), 10.0),
      (2L, 1L, ts("2024-01-01 10:00:10"), 20.0),
      (3L, 1L, ts("2024-01-01 10:00:40"), 99.0),
      // user 2: tie on ts — event_id orders, so id 4's value gets 0 weight
      (4L, 2L, ts("2024-01-01 10:00:00"), 100.0),
      (5L, 2L, ts("2024-01-01 10:00:00"), 7.0),
      (6L, 2L, ts("2024-01-01 10:00:05"), 1.0),
      // user 3: single event — no interval, no row
      (7L, 3L, ts("2024-01-01 10:00:00"), 5.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = EventOps.timeWeightedAvg(events, "user_id", "ts", "event_id", "value")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((10.0 * 10 + 20.0 * 30) / 40, 40000000L, 2L), s"u1: ${got(1L)}")
    assert(got(2L) == (7.0, 5000000L, 2L), s"u2 (tie): ${got(2L)}")
    assert(!got.contains(3L), "single-event key must drop out")
  }

  test("cohortRetention: first-week cohorts, offsets, revisits deduped") {
    val events = Seq(
      // user 1: first week 0, active weeks 0 and 2 (twice — deduped)
      (1L, ts("1970-01-01 00:00:00")),
      (1L, ts("1970-01-15 00:00:00")),
      (1L, ts("1970-01-16 00:00:00")),
      // user 2: first week 0 only
      (2L, ts("1970-01-02 00:00:00")),
      // user 3: first week 1
      (3L, ts("1970-01-08 00:00:00")))
      .toDF("user_id", "ts")
    val got = EventOps.cohortRetention(events, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 2L, (0L, 2L) -> 1L, (1L, 0L) -> 1L), s"got $got")
  }

  test("winnowing: shared k+w-1 word run guarantees a shared fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta"  // 6 = k+w-1 words
    val docs = Seq(
      (1L, s"one two three $shared four five six seven"),
      (2L, s"red blue $shared green yellow purple orange"),
      (3L, "completely different words with no overlap at all here"),
      (4L, "too short"))  // < k words: no fingerprints
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      "docs sharing a 6-word run must share a fingerprint (MOSS guarantee)")
    assert(fps(3L).intersect(fps(1L)).isEmpty)
    assert(!fps.contains(4L), "short docs yield no fingerprints")
  }

  test("positional shingle generator == posexplode(transform) composition") {
    val tricky = Seq("a b c d e", "a b c ", "x  y z", " a b", "ab", "", "   ",
      "a a a a").toDF("t")
    val viaGen = tricky.select(col("t"),
      graft.functions.Text.explodePositionalShingles(col("t"), 3).as(Seq("pos", "sh")))
    val ws = split(col("t"), " ")
    val viaCols = tricky.select(col("t"), posexplode(
      when(size(ws) >= 3,
        transform(sequence(lit(1), size(ws) - 2),
          i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
            element_at(ws, i + 2))))
        .otherwise(array().cast("array<string>"))))
      .select(col("t"), col("pos"), col("col").as("sh"))
    assert(viaGen.exceptAll(viaCols).count() == 0 &&
      viaCols.exceptAll(viaGen).count() == 0)
  }

  test("winnowing density is ~2/(w+1) of the gram count on the corpus") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val n = Dedup.winnowFingerprints(docs, "doc_id", "text", 3, 4).count().toDouble
    val grams = docs.select(explode(graft.functions.Text.wordShingles(col("text"), 3)))
      .count().toDouble
    val density = n / grams
    // theory: expected 2/(w+1) = 0.4 of positions selected (distinct-ness
    // and short docs pull it down); sanity-band the compression claim
    assert(density > 0.15 && density < 0.6, s"density $density")
  }

  test("ewma: hand-computed recurrence, tie order, partition invariance") {
    import spark.implicits._
    val ts = (i: Int) => new java.sql.Timestamp(1700000000000L + i * 1000L)
    val ev = Seq(
      (1L, ts(1), 10L, 1.0), (1L, ts(2), 11L, 2.0), (1L, ts(3), 12L, 3.0),
      (2L, ts(5), 20L, 4.0), (2L, ts(5), 21L, 8.0) // tie on ts → id order
    ).toDF("user_id", "ts", "event_id", "value")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.EventOps.ewma(df, "user_id", "ts", "event_id", "value", 0.5)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val got = run(ev)
    // user 1: ((0·.5+.5)·.5+1)·.5+1.5 = 2.125; user 2: (0·.5+2)·.5+4 = 5.0
    assert(got(1L) == ((3L, 2.125)), s"user 1: ${got(1L)}")
    assert(got(2L) == ((2L, 5.0)), s"user 2: ${got(2L)}")
    // swapping the tie's ids flips which value decays
    val flipped = Seq((2L, ts(5), 21L, 4.0), (2L, ts(5), 20L, 8.0))
      .toDF("user_id", "ts", "event_id", "value")
    assert(run(flipped)(2L) == ((2L, 4.0)), "tie order must follow the id column")
    assert(run(ev.repartition(5)) == got, "ewma changed under repartition")
  }

  test("markovTransitions: hand-counted matrix, tie order, first events dropped") {
    import spark.implicits._
    val ts = (i: Int) => new java.sql.Timestamp(1700000000000L + i * 1000L)
    // user 1: a→b→a→b ; user 2: a→a (tie on ts resolved by event_id)
    val ev = Seq(
      (1L, ts(1), 10L, "a"), (1L, ts(2), 11L, "b"),
      (1L, ts(3), 12L, "a"), (1L, ts(4), 13L, "b"),
      (2L, ts(5), 21L, "c"), (2L, ts(5), 20L, "a") // id 20 first → a→c
    ).toDF("user_id", "ts", "event_id", "event_type")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.EventOps.markovTransitions(df, "user_id", "ts",
        "event_id", "event_type")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
        .toMap
    val got = run(ev)
    // from a: a→b twice, a→c once (the tie: id 20 'a' precedes id 21 'c')
    assert(got(("a", "b")) == ((2L, 2.0 / 3.0)), s"a->b: ${got.get(("a", "b"))}")
    assert(got(("a", "c")) == ((1L, 1.0 / 3.0)), s"a->c: ${got.get(("a", "c"))}")
    assert(got(("b", "a")) == ((1L, 1.0)), s"b->a: ${got.get(("b", "a"))}")
    assert(got.size == 3, s"unexpected transitions: ${got.keySet}")
    // each user's FIRST event has no from-state and must not be counted
    assert(got.values.map(_._1).sum == 4L)
    assert(run(ev.repartition(7)) == got, "matrix changed under repartition")
  }

  test("holtSmooth == the reference sequential fold, bit for bit; partition-proof") {
    val rnd = new scala.util.Random(11)
    val rows = for (k <- 1 to 5; i <- 1 to 40)
      yield (k.toLong, ts(f"2024-01-01 10:${i / 60}%02d:${i % 60}%02d"),
        (k * 1000 + i).toLong, rnd.nextInt(100).toDouble)
    val df = rows.toDF("k", "ts", "id", "x")
    val (alpha, beta) = (0.3, 0.1)
    val got = graft.operators.EventOps
      .holtSmooth(df, "k", "ts", "id", "x", alpha, beta)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // reference: plain Scala fold in event order
    rows.groupBy(_._1).foreach { case (k, es) =>
      val xs = es.sortBy(e => (e._2.getTime, e._3)).map(_._4)
      var (l, b) = (xs.head, 0.0)
      xs.tail.foreach { x =>
        val ln = alpha * x + (1 - alpha) * (l + b)
        b = beta * (ln - l) + (1 - beta) * b
        l = ln
      }
      val g = got(k)
      assert(g._2 == xs.size.toLong && g._3 == l && g._4 == b &&
        g._5 == l + b, s"key $k: got $g expected ($l, $b)")
    }
    val again = graft.operators.EventOps
      .holtSmooth(df.repartition(7, col("id")), "k", "ts", "id", "x", alpha, beta)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(again == got, "holt state changed under repartition")
  }
}
