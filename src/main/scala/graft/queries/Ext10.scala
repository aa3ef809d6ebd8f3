package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Pmath
import graft.operators.{Rank, Stats, Temporal}

/** Round-8 third wave — nonparametric / categorical-association
  * statistics on the standing exact recipes:
  *
  *  - the distinct-value spine with [[Rank.withCumSums]] (integer
  *    2·midrank) for Brunner–Munzel placements and the Mood median
  *    test's exact lower median;
  *  - bounded-categorical folds (sorted `collect_list` + `aggregate`)
  *    for the ≤ k·m-term double sums — fixed op order on both engines;
  *  - the [[Pmath.lnColumn]] portable ln on ≥ 1 integer ratios for the
  *    Theil-U entropies;
  *  - pure integer counting for Goodman–Kruskal λ and l-diversity.
  */
object Ext10 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val dbl = (c: Column) => c.cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brunner–Munzel relative-effect test of document length for
    // lang='en' vs the rest — the variance-robust Mann–Whitney: does
    // one population stochastically dominate, without assuming equal
    // shapes. Placements from ONE value spine, integer accumulation,
    // one-row double epilogue (see Stats.brunnerMunzel scaladoc).
    "x_brunner_munzel" -> ((s, d) =>
      Stats.brunnerMunzel(
        t(s, d, "documents").filter(col("n_chars").isNotNull),
        col("lang") === "en", "n_chars")),

    // Mood's median test of n_chars across languages: exact global
    // lower median off the value spine (cum ≥ (n+1) div 2 — pure
    // integer), k×2 above/≤ contingency, χ² via the sorted ≤ k-term
    // fold. The scale-robust "do groups share a center" screen.
    "x_mood_median" -> ((s, d) => {
      val f = t(s, d, "documents").filter(col("n_chars").isNotNull)
        .select(col("lang").as("g"), col("n_chars").as("v"))
      val perV = f.groupBy("v").agg(count(lit(1)).as("cnt"))
      val sp = Rank.withCumSums(perV, Seq("v"), Seq("cnt" -> "cum"))
      val tot = f.agg(count(lit(1)).as("n"))
      val med = sp.crossJoin(broadcast(tot))
        .filter(expr("cum >= (n + 1) div 2")).agg(min("v").as("med"))
      val perG = f.crossJoin(broadcast(med)).groupBy("g").agg(
        sum(when(col("v") > col("med"), 1L).otherwise(0L)).as("ag"),
        count(lit(1)).as("ng"))
      val t2 = perG.agg(sum("ag").as("aa"), sum("ng").as("nn"),
        count(lit(1)).as("k"))
      val terms = perG.crossJoin(broadcast(t2))
        .withColumn("ead", dbl(col("ng")) * dbl(col("aa")) / dbl(col("nn")))
        .withColumn("ebd",
          dbl(col("ng")) * dbl(col("nn") - col("aa")) / dbl(col("nn")))
        .withColumn("tg",
          (dbl(col("ag")) - col("ead")) * (dbl(col("ag")) - col("ead")) /
            col("ead") +
          (dbl(col("ng") - col("ag")) - col("ebd")) *
            (dbl(col("ng") - col("ag")) - col("ebd")) / col("ebd"))
      terms.agg(max("k").as("k"), max("nn").as("n"),
          max("aa").as("n_above"),
          aggregate(transform(sort_array(collect_list(
            struct(col("g"), col("tg")))), x => x.getField("tg")),
            lit(0.0), (a, x) => a + x).as("chi2"))
        .crossJoin(broadcast(med))
        .select(col("med"), col("n"), col("k"), col("n_above"), col("chi2"))
    }),

    // Theil's uncertainty coefficient U(lang | source): how much of
    // the language entropy the source column explains — the asymmetric
    // (directional) categorical association, the feature-screening
    // companion of x_cramers_v / x_mutual_info. Both entropies are
    // ≤ |X|·|Y|-term folds of integer-ratio portable lns.
    "x_theil_u" -> ((s, d) => {
      val cells = t(s, d, "documents")
        .groupBy(col("source").as("x"), col("lang").as("y"))
        .agg(count(lit(1)).as("c"))
      val margY = cells.groupBy("y").agg(sum("c").as("cy"))
      val margX = cells.groupBy("x").agg(sum("c").as("cx"))
      val tot = cells.agg(sum("c").as("n"))
      val hy = margY.crossJoin(broadcast(tot))
        .withColumn("tv", dbl(col("cy")) / dbl(col("n")) *
          Pmath.lnColumn(dbl(col("n")) / dbl(col("cy"))))
        .agg(aggregate(transform(sort_array(collect_list(
          struct(col("y"), col("tv")))), x => x.getField("tv")),
          lit(0.0), (a, x) => a + x).as("h_y"))
      val hyx = cells.join(margX, Seq("x")).crossJoin(broadcast(tot))
        .withColumn("tv", dbl(col("c")) / dbl(col("n")) *
          Pmath.lnColumn(dbl(col("cx")) / dbl(col("c"))))
        .agg(aggregate(transform(sort_array(collect_list(
          struct(col("x"), col("y"), col("tv")))), x => x.getField("tv")),
          lit(0.0), (a, x) => a + x).as("h_yx"))
      hy.crossJoin(hyx).crossJoin(broadcast(tot))
        .select(col("n"), col("h_y"), col("h_yx"),
          ((col("h_y") - col("h_yx")) / col("h_y")).as("theil_u"))
    }),

    // Goodman–Kruskal λ(lang | source): proportional reduction in
    // prediction error from knowing the source — the zero-arithmetic
    // categorical association (pure max/sum counting, one division).
    "x_gk_lambda" -> ((s, d) => {
      val cells = t(s, d, "documents")
        .groupBy(col("source").as("x"), col("lang").as("y"))
        .agg(count(lit(1)).as("c"))
      val smax = cells.groupBy("x").agg(max("c").as("mx"))
        .agg(sum("mx").as("sum_max_x"))
      val mm = cells.groupBy("y").agg(sum("c").as("cy"))
        .agg(max("cy").as("max_marg"))
      val tot = cells.agg(sum("c").as("n"))
      smax.crossJoin(mm).crossJoin(tot)
        .select(col("n"), col("sum_max_x"), col("max_marg"),
          (dbl(col("sum_max_x") - col("max_marg")) /
            dbl(col("n") - col("max_marg"))).as("lambda_yx"))
    }),

    // 1-D Kalman denoise of the daily revenue series: exact integer
    // cents per day (the deterministic-sum device), one division to
    // the observation, then the sequential filter fold — engine
    // aggregate-fold vs oracle recursive CTE, bit-exact (only IEEE
    // +,−,×,÷ in fixed order). q=10, r=400, diffuse p0=10000.
    "x_kalman_1d" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(datediff(col("ts").cast("date"),
          lit("2024-01-01").cast("date")).cast("long").as("day_idx"))
        .agg(sum(floor(col("value") * lit(100.0)).cast("long")).as("cents"))
        .select(col("day_idx"),
          (col("cents").cast("double") / lit(100.0)).as("z"))
      Temporal.kalman1d(daily, "day_idx", "z",
        q = 10.0, r = 400.0, p0 = 10000.0)
    }),

    // Croston intermittent-demand forecast of daily error counts over
    // the DENSE day spine (zero days left-joined in): size and
    // interval smoothed separately at α=0.1, one row per demand day
    "x_croston" -> ((s, d) => {
      val ev = t(s, d, "events")
      val dayIdx = datediff(col("ts").cast("date"),
        lit("2024-01-01").cast("date")).cast("long")
      val perDay = ev.filter(col("event_type") === "error")
        .groupBy(dayIdx.as("day_idx")).agg(count(lit(1)).as("demand"))
      val spine = ev.agg(max(dayIdx).as("mx"))
        .select(explode(sequence(lit(0L), col("mx"))).as("day_idx"))
        .join(perDay, Seq("day_idx"), "left")
        .select(col("day_idx"),
          coalesce(col("demand"), lit(0L)).as("demand"))
      Temporal.croston(spine, "day_idx", "demand", alpha = 0.1)
    }),

    // Aalen–Johansen cumulative incidence: time (hours) from each
    // user's first event to their first purchase vs first error —
    // competing exits, censored at the last event if neither; ties go
    // to purchase. The multi-outcome funnel curve x_survival can't
    // express (1−KM per cause overstates both).
    "x_competing_risks" -> ((s, d) => {
      val users = t(s, d, "events").groupBy("user_id").agg(
        min(unix_micros(col("ts"))).as("first_us"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts"))))
          .as("p_us"),
        min(when(col("event_type") === "error", unix_micros(col("ts"))))
          .as("e_us"),
        max(unix_micros(col("ts"))).as("last_us"))
      Stats.competingRisks(users,
        expr("(coalesce(least(p_us, e_us), last_us) - first_us)" +
          " div 3600000000"),
        col("p_us").isNotNull &&
          (col("e_us").isNull || col("p_us") <= col("e_us")),
        col("e_us").isNotNull &&
          (col("p_us").isNull || col("e_us") < col("p_us")))
    }),

    // distinct-l-diversity audit: the k-anonymity companion — for each
    // (source, length-bucket) quasi-identifier group, how many DISTINCT
    // sensitive values (lang) appear; reported as the l histogram. A
    // group with l = 1 leaks its members' language outright.
    "x_ldiversity" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy(col("source"), expr("n_chars div 500").as("bkt"))
        .agg(countDistinct("lang").as("l_distinct"), count(lit(1)).as("n"))
        .groupBy("l_distinct")
        .agg(count(lit(1)).as("n_groups"), sum("n").as("n_rows"))),
  )

  // ---------------------------------------------------------------- SQL

  val oracle: Map[String, String] = Map(

    // mirrors Stats.brunnerMunzel: value spine with two cumulative
    // sums, integer placement cores in HUGEINT, the identical
    // fixed-order double epilogue (decimal→double via VARCHAR)
    "x_brunner_munzel" ->
      """WITH f AS (SELECT n_chars AS v,
                CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS ya
              FROM documents WHERE n_chars IS NOT NULL),
         g AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt,
                CAST(sum(ya) AS BIGINT) AS ca FROM f GROUP BY v),
         s AS (SELECT cnt, ca,
                CAST(sum(cnt) OVER w AS BIGINT) AS cum,
                CAST(sum(ca) OVER w AS BIGINT) AS cuma
              FROM g WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW)),
         m AS (SELECT cnt, ca, cnt - ca AS cb, cum, cuma,
                2 * (cum - cnt) + cnt + 1 AS mm2,
                2 * (cuma - ca) + ca + 1 AS ma2,
                2 * ((cum - cuma) - (cnt - ca)) + (cnt - ca) + 1 AS mb2
              FROM s),
         acc AS (SELECT
                sum(ca::HUGEINT * mm2) AS sra,
                sum(cb::HUGEINT * mm2) AS srb,
                sum(ca::HUGEINT * (mm2 - ma2)) AS ua,
                sum(cb::HUGEINT * (mm2 - mb2)) AS ub,
                sum(ca::HUGEINT * (mm2 - ma2)::HUGEINT * (mm2 - ma2))
                  AS qa,
                sum(cb::HUGEINT * (mm2 - mb2)::HUGEINT * (mm2 - mb2))
                  AS qb
              FROM m),
         t AS (SELECT CAST(sum(ya) AS BIGINT) AS n1,
                CAST(count(*) - sum(ya) AS BIGINT) AS n2 FROM f),
         e AS (SELECT *, CAST(n1 AS DOUBLE) AS n1d,
                CAST(n2 AS DOUBLE) AS n2d FROM acc CROSS JOIN t),
         e2 AS (SELECT *,
                CAST(CAST(sra AS VARCHAR) AS DOUBLE) / (2.0 * n1d) AS m1d,
                CAST(CAST(srb AS VARCHAR) AS DOUBLE) / (2.0 * n2d) AS m2d
              FROM e),
         e3 AS (SELECT *, (n1d + 1.0) - 2.0 * m1d AS ka,
                (n2d + 1.0) - 2.0 * m2d AS kb FROM e2),
         e4 AS (SELECT *,
                (CAST(CAST(qa AS VARCHAR) AS DOUBLE)
                 + 2.0 * ka * CAST(CAST(ua AS VARCHAR) AS DOUBLE)
                 + n1d * ka * ka) / (4.0 * (n1d - 1.0)) AS v1,
                (CAST(CAST(qb AS VARCHAR) AS DOUBLE)
                 + 2.0 * kb * CAST(CAST(ub AS VARCHAR) AS DOUBLE)
                 + n2d * kb * kb) / (4.0 * (n2d - 1.0)) AS v2
              FROM e3),
         e5 AS (SELECT *, n1d * v1 + n2d * v2 AS vs FROM e4)
         SELECT n1, n2,
                (m2d - (n2d + 1.0) / 2.0) / n1d AS p_hat,
                n1d * n2d * (m2d - m1d) / ((n1d + n2d) * sqrt(vs))
                  AS w_stat,
                vs * vs / ((n1d * v1) * (n1d * v1) / (n1d - 1.0)
                         + (n2d * v2) * (n2d * v2) / (n2d - 1.0))
                  AS df_hat
         FROM e5""",

    "x_mood_median" ->
      """WITH f AS (SELECT lang AS g, n_chars AS v FROM documents
              WHERE n_chars IS NOT NULL),
         perv AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt
              FROM f GROUP BY v),
         sp AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v ROWS BETWEEN
                UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
              FROM perv),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
         med AS (SELECT min(v) AS med FROM sp CROSS JOIN tot
              WHERE cum >= (n + 1) // 2),
         perg AS (SELECT g,
                CAST(sum(CASE WHEN v > med THEN 1 ELSE 0 END) AS BIGINT)
                  AS ag,
                CAST(count(*) AS BIGINT) AS ng
              FROM f CROSS JOIN med GROUP BY g),
         t2 AS (SELECT CAST(sum(ag) AS BIGINT) AS aa,
                CAST(sum(ng) AS BIGINT) AS nn,
                CAST(count(*) AS BIGINT) AS k FROM perg),
         tm AS (SELECT g, ag, ng, aa, nn, k,
                CAST(ng AS DOUBLE) * CAST(aa AS DOUBLE)
                  / CAST(nn AS DOUBLE) AS ead,
                CAST(ng AS DOUBLE) * CAST(nn - aa AS DOUBLE)
                  / CAST(nn AS DOUBLE) AS ebd
              FROM perg CROSS JOIN t2),
         tg AS (SELECT g, aa, nn, k,
                (CAST(ag AS DOUBLE) - ead) * (CAST(ag AS DOUBLE) - ead)
                  / ead
              + (CAST(ng - ag AS DOUBLE) - ebd)
                * (CAST(ng - ag AS DOUBLE) - ebd) / ebd AS tg
              FROM tm),
         fo AS (SELECT max(k) AS k, max(nn) AS n, max(aa) AS n_above,
                list_reduce(list_prepend(CAST('0.0' AS DOUBLE),
                  list(tg ORDER BY g)), (a, x) -> a + x) AS chi2
              FROM tg)
         SELECT med, n, k, n_above, chi2 FROM fo CROSS JOIN med""",

    "x_theil_u" -> {
      val (chainY, lastY) = Pmath.lnSqlChainCtes("my", "thy",
        Seq("CAST(n AS DOUBLE) / CAST(cy AS DOUBLE)" -> "ln_y"),
        carry = Seq("y", "cy", "n"))
      val (chainC, lastC) = Pmath.lnSqlChainCtes("cl", "thc",
        Seq("CAST(cx AS DOUBLE) / CAST(c AS DOUBLE)" -> "ln_c"),
        carry = Seq("x", "y", "c", "cx", "n"))
      s"""WITH cells AS (SELECT source AS x, lang AS y,
                CAST(count(*) AS BIGINT) AS c
              FROM documents GROUP BY source, lang),
         mx AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx
              FROM cells GROUP BY x),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
         my AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy, n
              FROM cells CROSS JOIN tot GROUP BY y, n),
         cl AS (SELECT c0.x, c0.y, c0.c, mx.cx, tot.n
              FROM cells c0 JOIN mx USING (x) CROSS JOIN tot),
         $chainY,
         $chainC,
         hy AS (SELECT list_reduce(list_prepend(CAST('0.0' AS DOUBLE),
                list(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE) * ln_y
                  ORDER BY y)), (a, x) -> a + x) AS h_y FROM $lastY),
         hyx AS (SELECT list_reduce(list_prepend(CAST('0.0' AS DOUBLE),
                list(CAST(c AS DOUBLE) / CAST(n AS DOUBLE) * ln_c
                  ORDER BY x, y)), (a, x) -> a + x) AS h_yx FROM $lastC)
         SELECT n, h_y, h_yx, (h_y - h_yx) / h_y AS theil_u
         FROM hy CROSS JOIN hyx CROSS JOIN tot"""
    },

    "x_gk_lambda" ->
      """WITH cells AS (SELECT source AS x, lang AS y,
                CAST(count(*) AS BIGINT) AS c
              FROM documents GROUP BY source, lang),
         smax AS (SELECT CAST(sum(mx) AS BIGINT) AS sum_max_x FROM
                (SELECT max(c) AS mx FROM cells GROUP BY x)),
         mm AS (SELECT CAST(max(cy) AS BIGINT) AS max_marg FROM
                (SELECT CAST(sum(c) AS BIGINT) AS cy FROM cells
                 GROUP BY y)),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells)
         SELECT n, sum_max_x, max_marg,
                CAST(sum_max_x - max_marg AS DOUBLE)
                  / CAST(n - max_marg AS DOUBLE) AS lambda_yx
         FROM smax CROSS JOIN mm CROSS JOIN tot""",

    // the filter trajectory replayed as a bounded recursive CTE: base
    // branch literals CAST AS DOUBLE (DuckDB would otherwise unify the
    // union type to DECIMAL), recursive arm repeats the engine's exact
    // op order with P⁺ = p + 10.0 spelled out textually
    "x_kalman_1d" ->
      """WITH RECURSIVE daily AS (
           SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT)
                    AS day_idx,
                  CAST(sum(CAST(floor(value * 100.0) AS BIGINT))
                    AS BIGINT) AS cents
           FROM events GROUP BY 1),
         sp AS (SELECT row_number() OVER (ORDER BY day_idx) AS i, day_idx,
                CAST(cents AS DOUBLE) / 100.0 AS z FROM daily),
         kal AS (
           SELECT CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS day_idx,
                  CAST(0.0 AS DOUBLE) AS z, CAST(0.0 AS DOUBLE) AS x,
                  CAST(10000.0 AS DOUBLE) AS p, CAST(0.0 AS DOUBLE) AS kg
           UNION ALL
           SELECT s2.i, s2.day_idx, s2.z,
                  k.x + ((k.p + 10.0) / ((k.p + 10.0) + 400.0))
                    * (s2.z - k.x) AS x,
                  (1.0 - (k.p + 10.0) / ((k.p + 10.0) + 400.0))
                    * (k.p + 10.0) AS p,
                  (k.p + 10.0) / ((k.p + 10.0) + 400.0) AS kg
           FROM kal k JOIN sp s2 ON s2.i = k.i + 1)
         SELECT day_idx, z, x AS x_filt, p AS p_var, kg AS k_gain
         FROM kal WHERE i >= 1""",

    "x_croston" ->
      """WITH RECURSIVE err AS (
           SELECT CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT)
                    AS day_idx,
                  CAST(count(*) AS BIGINT) AS demand
           FROM events WHERE event_type = 'error' GROUP BY 1),
         mxd AS (SELECT CAST(max(CAST(ts AS DATE) - DATE '2024-01-01')
                   AS BIGINT) AS mx FROM events),
         sp AS (SELECT CAST(g.i AS BIGINT) AS day_idx,
                CAST(COALESCE(e.demand, 0) AS BIGINT) AS demand
                FROM (SELECT unnest(range(0, mx + 1)) AS i FROM mxd) g
                LEFT JOIN err e ON e.day_idx = g.i),
         c AS (
           SELECT CAST(-1 AS BIGINT) AS day_idx, CAST(0 AS BIGINT)
                    AS demand,
                  false AS seen, CAST(0.0 AS DOUBLE) AS zh,
                  CAST(0.0 AS DOUBLE) AS ph, CAST(1.0 AS DOUBLE) AS qq
           UNION ALL
           SELECT s.day_idx, s.demand,
                  k.seen OR s.demand > 0 AS seen,
                  CASE WHEN s.demand > 0 THEN
                    CASE WHEN k.seen THEN
                      k.zh + 0.1 * (CAST(s.demand AS DOUBLE) - k.zh)
                    ELSE CAST(s.demand AS DOUBLE) END
                  ELSE k.zh END AS zh,
                  CASE WHEN s.demand > 0 THEN
                    CASE WHEN k.seen THEN k.ph + 0.1 * (k.qq - k.ph)
                    ELSE k.qq END
                  ELSE k.ph END AS ph,
                  CASE WHEN s.demand > 0 THEN CAST(1.0 AS DOUBLE)
                  ELSE k.qq + 1.0 END AS qq
           FROM c k JOIN sp s ON s.day_idx = k.day_idx + 1)
         SELECT day_idx, demand, zh AS z_hat, ph AS p_hat,
                zh / ph AS forecast
         FROM c WHERE demand > 0""",

    "x_competing_risks" ->
      """WITH RECURSIVE u AS (SELECT user_id,
                min(epoch_us(ts)) AS first_us,
                min(CASE WHEN event_type = 'purchase'
                    THEN epoch_us(ts) END) AS p_us,
                min(CASE WHEN event_type = 'error'
                    THEN epoch_us(ts) END) AS e_us,
                max(epoch_us(ts)) AS last_us
              FROM events GROUP BY user_id),
         f AS (SELECT CAST((COALESCE(least(p_us, e_us), last_us)
                  - first_us) // 3600000000 AS BIGINT) AS t,
               CASE WHEN p_us IS NOT NULL
                    AND (e_us IS NULL OR p_us <= e_us)
                    THEN 1 ELSE 0 END AS e1,
               CASE WHEN e_us IS NOT NULL
                    AND (p_us IS NULL OR e_us < p_us)
                    THEN 1 ELSE 0 END AS e2
               FROM u),
         pt AS (SELECT t, CAST(count(*) AS BIGINT) AS n_all,
                CAST(sum(e1) AS BIGINT) AS d1,
                CAST(sum(e2) AS BIGINT) AS d2 FROM f GROUP BY t),
         tt AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM f),
         ev AS (SELECT t, n_risk, d1, d2 FROM (
                SELECT t, d1, d2,
                  n_total - COALESCE(CAST(sum(n_all) OVER
                    (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING) AS BIGINT), 0) AS n_risk
                FROM pt CROSS JOIN tt) rk
                WHERE d1 + d2 > 0),
         sp AS (SELECT row_number() OVER (ORDER BY t) AS i, t,
                n_risk, d1, d2 FROM ev),
         c AS (
           SELECT CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS t,
                  CAST(0 AS BIGINT) AS n_risk, CAST(0 AS BIGINT) AS d1,
                  CAST(0 AS BIGINT) AS d2, CAST(1.0 AS DOUBLE) AS s,
                  CAST(0.0 AS DOUBLE) AS c1, CAST(0.0 AS DOUBLE) AS c2
           UNION ALL
           SELECT s2.i, s2.t, s2.n_risk, s2.d1, s2.d2,
                  k.s * (1.0 - CAST(s2.d1 + s2.d2 AS DOUBLE)
                    / CAST(s2.n_risk AS DOUBLE)) AS s,
                  k.c1 + k.s * (CAST(s2.d1 AS DOUBLE)
                    / CAST(s2.n_risk AS DOUBLE)) AS c1,
                  k.c2 + k.s * (CAST(s2.d2 AS DOUBLE)
                    / CAST(s2.n_risk AS DOUBLE)) AS c2
           FROM c k JOIN sp s2 ON s2.i = k.i + 1)
         SELECT t AS t_dur, n_risk, d1 AS d_cause1, d2 AS d_cause2,
                c1 AS cif_cause1, c2 AS cif_cause2, s AS surv_all
         FROM c WHERE i >= 1""",

    "x_ldiversity" ->
      """WITH g AS (SELECT source, n_chars // 500 AS bkt,
                CAST(count(DISTINCT lang) AS BIGINT) AS l_distinct,
                CAST(count(*) AS BIGINT) AS n
              FROM documents GROUP BY source, n_chars // 500)
         SELECT l_distinct, CAST(count(*) AS BIGINT) AS n_groups,
                CAST(sum(n) AS BIGINT) AS n_rows
         FROM g GROUP BY l_distinct""",
  )
}
