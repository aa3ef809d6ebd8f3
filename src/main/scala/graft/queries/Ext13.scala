package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Pmath

/** Round-8 sixth wave — spectral analysis on the portable trig kernel
  * ([[Pmath.sinColumn]]/[[Pmath.cosColumn]]): the angle is range-
  * reduced with EXACT integer arithmetic (m = k·t mod N, recentred to
  * (−N/2, N/2]) so the trig series only ever sees |θ| ≤ π, where one
  * fixed Horner replays bit-identically on both engines. Sums over the
  * calendar-bounded day spine are spine-ordered folds (the standing
  * bounded-fold device). */
object Ext13 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val dbl = (c: Column) => c.cast("double")

  private def fold(orderCol: String, term: Column, out: String) =
    aggregate(transform(sort_array(collect_list(
      struct(col(orderCol), term.as("t_")))), x => x.getField("t_")),
      lit(0.0), (a, x) => a + x).as(out)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // DFT periodogram of the daily order-count series at harmonics
    // k = 1..8: P_k = (Σ c_t cos θ)² + (Σ c_t sin θ)², θ = 2π·kt/N
    // integer-reduced — the seasonality detector over the calendar-
    // bounded spine; one hash aggregate + 8 bounded folds
    "x_periodogram" -> ((s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderdate").isNotNull)
        .select(to_date(col("o_orderdate")).as("dt"))
      val mn = o.agg(min("dt").as("mnd"),
        (datediff(max("dt"), min("dt")) + 1).cast("long").as("nn"))
      val days = o.crossJoin(broadcast(mn))
        .select(datediff(col("dt"), col("mnd")).cast("long").as("t"),
          col("nn"))
        .groupBy("t", "nn").agg(count(lit(1)).as("c"))
      val grid = days
        .select(col("t"), col("nn"), col("c"),
          explode(sequence(lit(1L), lit(8L))).as("k"))
        .withColumn("m", pmod(col("k") * col("t"), col("nn")))
        .withColumn("m2", when(col("m") * 2 > col("nn"),
          col("m") - col("nn")).otherwise(col("m")))
        .withColumn("th",
          lit(Pmath.TwoPi) * (dbl(col("m2")) / dbl(col("nn"))))
        .withColumn("tc", dbl(col("c")) * Pmath.cosColumn(col("th")))
        .withColumn("ts", dbl(col("c")) * Pmath.sinColumn(col("th")))
      grid.groupBy("k").agg(count(lit(1)).as("n_days"),
          fold("t", col("tc"), "sc"), fold("t", col("ts"), "ss"))
        .select(col("k"), col("n_days"), col("sc"), col("ss"),
          (col("sc") * col("sc") + col("ss") * col("ss")).as("power"))
    }))

  val oracle: Map[String, String] = Map(

    // mirrors the engine: same integer angle reduction, same trig
    // Horner constants, same spine-ordered folds
    "x_periodogram" -> {
      val twoPi = s"CAST('${Pmath.TwoPi}' AS DOUBLE)"
      s"""WITH o AS (SELECT CAST(o_orderdate AS DATE) AS dt FROM orders
              WHERE o_orderdate IS NOT NULL),
         mn AS (SELECT min(dt) AS mnd,
                CAST(datediff('day', min(dt), max(dt)) + 1 AS BIGINT)
                  AS nn FROM o),
         days AS (SELECT CAST(datediff('day', mnd, dt) AS BIGINT) AS t,
                nn, CAST(count(*) AS BIGINT) AS c
              FROM o CROSS JOIN mn GROUP BY 1, 2),
         grid AS (SELECT t, nn, c,
                CAST(unnest(range(1, 9)) AS BIGINT) AS k FROM days),
         g2 AS (SELECT t, nn, c, k, (k * t) % nn AS m FROM grid),
         g3 AS (SELECT t, c, k,
                CASE WHEN m * 2 > nn THEN m - nn ELSE m END AS m2, nn
              FROM g2),
         g4 AS (SELECT t, c, k,
                $twoPi * (CAST(m2 AS DOUBLE) / CAST(nn AS DOUBLE)) AS th
              FROM g3),
         g5 AS (SELECT t, k,
                CAST(c AS DOUBLE) * (${Pmath.cosSqlExpr("th")}) AS tc,
                CAST(c AS DOUBLE) * (${Pmath.sinSqlExpr("th")}) AS ts
              FROM g4),
         agg AS (SELECT k, CAST(count(*) AS BIGINT) AS n_days,
                list_sum(list(tc ORDER BY t)) AS sc,
                list_sum(list(ts ORDER BY t)) AS ss
              FROM g5 GROUP BY k)
         SELECT k, n_days, sc, ss, sc * sc + ss * ss AS power
         FROM agg"""
    })
}
