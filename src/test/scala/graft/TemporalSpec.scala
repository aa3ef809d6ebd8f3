package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** Semantics of the time-series join operators on handcrafted edges the
  * oracle data may not cover: exact-tie timestamps, keys with no match,
  * bin-boundary distances, empty sides. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin: backward match, ties match, missing -> null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // after r1 -> r1
      (2L, 10L, ts("2024-01-01 11:00:00")),  // exact tie with r2 -> r2
      (3L, 10L, ts("2024-01-01 09:00:00")),  // before any right -> null
      (4L, 20L, ts("2024-01-01 12:00:00")))  // key with no right rows -> null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), 101L),
      (10L, ts("2024-01-01 11:00:00"), 102L))
      .toDF("user_id", "ts", "purchase_id")
    val got = Temporal.asofJoin(left, right, "user_id", "ts", Seq("purchase_id"))
      .select(col("event_id"), col("_asof.purchase_id").as("p"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).contains(101L))
    assert(got(2L).contains(102L), "equal timestamps must match (ts >= semantics)")
    assert(got(3L).isEmpty)
    assert(got(4L).isEmpty)
  }

  test("asofJoin == per-row max-scan on the events fixture") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max(col("event_id")).as("purchase_id"))
    val got = Temporal.asofJoin(clicks, purchases, "user_id", "ts", Seq("purchase_id"))
      .select(col("event_id"), col("_asof.purchase_id").as("p"))
    // reference: correlated max over an inequality join (quadratic — only
    // viable at fixture scale, which is exactly why asofJoin exists)
    val ref = clicks.as("c").join(purchases.as("p"),
      col("c.user_id") === col("p.user_id") && col("c.ts") >= col("p.ts"), "left")
      .groupBy(col("c.event_id").as("event_id"))
      .agg(max(struct(col("p.ts"), col("p.purchase_id"))).getField("purchase_id").as("p"))
    assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0)
  }

  test("asofJoin refuses inputs that collide with its reserved names") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"), "x"))
      .toDF("event_id", "user_id", "ts", "_asof")
    val right = Seq((10L, ts("2024-01-01 09:30:00"), 101L))
      .toDF("user_id", "ts", "purchase_id")
    val err = intercept[IllegalArgumentException] {
      Temporal.asofJoin(left, right, "user_id", "ts", Seq("purchase_id"))
    }
    assert(err.getMessage.contains("_asof"), err.getMessage)
  }

  test("neighborCounts == brute-force count, incl. exact-radius boundary") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:04:59")),  // inside  (299 s)
      (3L, ts("2024-01-01 10:05:00")),  // exactly radius from #1 (inclusive)
      (4L, ts("2024-01-01 10:10:01")),  // outside for #1, inside for #3
      (5L, ts("2024-01-02 00:00:00")))  // isolated -> zero neighbors
      .toDF("event_id", "ts")
    val got = Temporal.neighborCounts(ev, "event_id", "ts", 300)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = ev.as("a").crossJoin(ev.as("b"))
      .filter(col("a.event_id") =!= col("b.event_id") &&
        abs(unix_micros(col("a.ts")) - unix_micros(col("b.ts"))) <= 300000000L)
      .groupBy(col("a.event_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5L) == 0L, "isolated event must appear with zero neighbors")
    assert(got(3L) == brute(3L) && got(1L) == brute(1L))
    assert(got.filter(_._2 > 0) == brute, s"got=$got brute=$brute")
  }

  test("nearestJoin: direction pick, exact-distance tie -> backward, no-match null") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // back 09:00 (1h) vs fwd 12:00 (2h) -> back
      (2L, 10L, ts("2024-01-01 11:30:00")), // back 09:00 (2.5h) vs fwd 12:00 (0.5h) -> fwd
      (3L, 20L, ts("2024-01-01 10:00:00")), // equidistant +/-1h -> tie to back
      (4L, 30L, ts("2024-01-01 10:00:00")), // forward only
      (5L, 40L, ts("2024-01-01 10:00:00"))) // no right rows -> null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:00:00"), 101L),
      (10L, ts("2024-01-01 12:00:00"), 102L),
      (20L, ts("2024-01-01 09:00:00"), 201L),
      (20L, ts("2024-01-01 11:00:00"), 202L),
      (30L, ts("2024-01-01 10:30:00"), 301L))
      .toDF("user_id", "ts", "purchase_id")
    val got = Temporal.nearestJoin(left, right, "user_id", "ts",
        Seq("purchase_id"))
      .select(col("event_id"), col("_nearest.purchase_id").as("p"),
        col("nearest_delta_us"), col("nearest_dir"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got(1L) == ((Some(101L), Some(3600000000L), Some("back"))))
    assert(got(2L) == ((Some(102L), Some(1800000000L), Some("fwd"))))
    assert(got(3L) == ((Some(201L), Some(3600000000L), Some("back"))),
      s"tie must go backward: ${got(3L)}")
    assert(got(4L) == ((Some(301L), Some(1800000000L), Some("fwd"))))
    assert(got(5L) == ((None, None, None)))
  }

  test("saxWords: monotone day quantizes to the expected word; partial days drop") {
    // day 1: 24 slots with value = slot (cents 0..2300): segment sums
    // strictly increase -> ntile(4) over 6 segments = [a,a,b,b,c,d]
    val day1 = (0 until 24).map(h =>
      ("m", java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:30:00"), h.toDouble))
    // day 2: one missing slot -> no word
    val day2 = (0 until 23).map(h =>
      ("m", java.sql.Timestamp.valueOf(f"2024-03-02 $h%02d:30:00"), h.toDouble))
    val got = Temporal.saxWords(
        (day1 ++ day2).toDF("k", "ts", "v"), "k", col("ts"), col("v"))
      .collect().map(r => r.getTimestamp(1).toString.take(10) -> r.getString(2))
      .toMap
    assert(got == Map("2024-03-01" -> "aabbcd"), s"got=$got")
  }
}
