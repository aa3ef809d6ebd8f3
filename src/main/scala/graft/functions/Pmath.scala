package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable transcendental math: `ln` computed from IEEE +,−,×,÷ only,
  * so the SAME bits come out of Spark and of any engine that folds the
  * same expression (the differential-oracle requirement).
  *
  * Why: `Math.log` (JVM) and `std::log` (DuckDB) disagree in the last
  * ulp for ~0.1% of inputs (measured: 1/1000 over the BM25 idf domain)
  * — enough to break a hash-compared oracle on any score that passes
  * through a logarithm. Basic IEEE arithmetic, by contrast, is exactly
  * specified, and decimal literals parse correctly-rounded on both
  * sides (the repo's corr/centroid oracles already lean on this).
  *
  * Algorithm (domain [1, 2⁴⁰), the N/df shapes of retrieval scoring):
  * exact power-of-two range reduction x = 2ᵏ·m with m ∈ [1,2) — the
  * 2⁻ᵏ multiplications are exponent shifts, error-free — then the
  * atanh series ln(m) = 2·(t + t³/3 + … + t¹⁹/19), t = (m−1)/(m+1) ≤
  * 1/3, evaluated in a FIXED Horner order. Truncation error < 1e-11
  * relative — imperceptible for scoring, and identical on every
  * engine, which is the point. k·ln2 terms are precomputed literals.
  *
  * [[lnColumn]] (the Spark side) and [[lnSqlCtes]] (the oracle side)
  * are generated from the SAME constant table in this file, so the two
  * implementations cannot drift.
  */
object Pmath {

  private val MaxK = 40
  private[graft] val Ln2 = 0.6931471805599453
  /** Horner coefficients, outermost first: 1/3, 1/5, …, 1/19. */
  private[graft] val coeffs: Seq[Double] = (1 to 9).map(i => 1.0 / (2 * i + 1))
  /** (threshold 2^i, scale 2^-i, literal i·ln2) for i = MaxK..1. */
  private[graft] val reduction: Seq[(Double, Double, Double)] =
    (MaxK to 1 by -1).map(i => (math.pow(2, i), math.pow(2, -i), i * Ln2))

  /** Lossless literal: Java Double.toString round-trips, and a STRING →
    * DOUBLE cast parses it back correctly rounded to identical bits.
    * The string detour is load-bearing: a bare 17-digit SQL literal is
    * typed DECIMAL, and DECIMAL→DOUBLE conversion double-rounds (int128
    * mantissa rounds into double, then the 10⁻ˢᶜᵃˡᵉ division rounds
    * again) — the same last-ulp trap the corr oracle documents. */
  private def d(x: Double): String = s"CAST('${x.toString}' AS DOUBLE)"

  /** Let-binding for Column expressions: evaluate `x` ONCE into a lambda
    * variable and build `f` over that variable. Without this, every use
    * site of an intermediate (m appears in t twice, t² nine times in the
    * Horner chain…) would SUBSTITUTE the whole sub-tree — the ln below
    * multiplies out to ~10⁵ Catalyst nodes per call and a 30 s+
    * analysis/Janino stall; with binding it is a few hundred nodes. The
    * single-element transform is the standard Column-level `let`. */
  private[graft] def bind(x: Column)(f: Column => Column): Column =
    element_at(transform(array(x), f), 1)

  /** Portable ln as a Column (domain [1, 2⁴⁰); returns 0 at x = 1).
    * Backed by the native codegen expression
    * [[graft.plans.PortableLn]] — straight-line fused Java, no per-row
    * allocations; generated from the same constant table as the lambda
    * form and the SQL replay. */
  def lnColumn(x0: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.PortableLn(ColumnBridge.expression(
      x0.cast("double"))))
  }

  /** The HOF/lambda reference form of [[lnColumn]] — kept as the
    * executable specification: PmathSpec asserts the native expression
    * matches it bit-for-bit over a dense domain sweep. */
  private[graft] def lnColumnLambda(x0: Column): Column = bind(x0) { x =>
    val m0 = reduction.foldLeft(when(lit(false), lit(0.0))) {
      case (w, (thresh, scale, _)) => w.when(x >= thresh, x * lit(scale))
    }.otherwise(x)
    val kln2 = reduction.foldLeft(when(lit(false), lit(0.0))) {
      case (w, (thresh, _, kl)) => w.when(x >= thresh, lit(kl))
    }.otherwise(lit(0.0))
    bind(m0) { m =>
      bind((m - lit(1.0)) / (m + lit(1.0))) { t =>
        bind(t * t) { t2 =>
          val inner = coeffs.reverse.tail.foldLeft(lit(coeffs.last)) {
            (acc, c) => lit(c) + t2 * acc
          }
          kln2 + lit(2.0) * (t * (lit(1.0) + t2 * inner))
        }
      }
    }
  }

  /** The SQL replay: three CTE-layer column lists that compute
    * `outCol` = portable ln of `inCol` with the exact same constants
    * and operation order as [[lnColumn]]. Splice as:
    * {{{
    * a AS (SELECT *, <layer1> FROM prev),   -- m, kln2
    * b AS (SELECT *, <layer2> FROM a),      -- t, t2 via (t)*(t)
    * c AS (SELECT *, <layer3> FROM b)       -- outCol
    * }}} */
  def lnSqlCtes(inCol: String, outCol: String): (String, String, String) = {
    val whensM = reduction.map { case (th, sc, _) =>
      s"WHEN $inCol >= ${d(th)} THEN $inCol * ${d(sc)}"
    }.mkString(" ")
    val whensK = reduction.map { case (th, _, kl) =>
      s"WHEN $inCol >= ${d(th)} THEN ${d(kl)}"
    }.mkString(" ")
    val layer1 =
      s"CASE $whensM ELSE $inCol END AS pln_m, CASE $whensK ELSE 0.0 END AS pln_kln2"
    val layer2 =
      "(pln_m - 1.0) / (pln_m + 1.0) AS pln_t"
    val inner = coeffs.reverse.tail.foldLeft(d(coeffs.last)) {
      (acc, c) => s"${d(c)} + pln_t2 * ($acc)"
    }
    // t2 inlined as (pln_t * pln_t) so layer3 needs only layer2's output
    val layer3 =
      s"pln_kln2 + 2.0 * (pln_t * (1.0 + (pln_t * pln_t) * (${inner
        .replace("pln_t2", "(pln_t * pln_t)")}))) AS $outCol"
    (layer1, layer2, layer3)
  }

  // ---- portable exp ----------------------------------------------------

  /** 1/ln2, correctly rounded (Java literal round-trip). */
  private[graft] val InvLn2 = 1.4426950408889634
  /** exp(r) Taylor coefficients 1/i!, i = 0..13, innermost-last: the
    * Horner chain c0 + r·(c1 + r·(… + r·c13)). |r| ≤ ln2/2 after range
    * reduction, so truncation < 1e-17 relative — below double ulp. */
  private[graft] val expCoeffs: Seq[Double] =
    (0 to 13).map(i => 1.0 / (1 to i).foldLeft(1.0)(_ * _))
  private[graft] val ExpMaxK = 60
  /** Exact power-of-two table for the 2ᵏ scaling: every 2ᵏ with
    * |k| ≤ 60 is an exact double, and multiplying by it is an
    * error-free exponent shift. */
  private[graft] val pow2: Seq[(Long, Double)] =
    (-ExpMaxK to ExpMaxK).map(k => (k.toLong, math.pow(2.0, k)))

  /** Portable exp as a Column. Range reduction x = k·ln2 + r with
    * k = ⌊x/ln2 + ½⌋ (floor is exact; the product/add are single IEEE
    * ops, so k is identical on every engine), fixed-order Horner for
    * exp(r), exact 2ᵏ scaling. Backed by the native codegen expression
    * [[graft.plans.PortableExp]] — generated from the same constant
    * table as [[expColumnLambda]] and [[expSqlChainCtes]].
    *
    * The input is CLAMPED to ±40 in ALL THREE forms (ADVICE r08: off
    * the documented domain the lambda went NaN past |k| > 60, the SQL
    * CASE went NULL, and the native scalb stayed finite — three
    * different answers). exp(±40) saturation is deterministic and
    * identical across engines; callers that clamp tighter (the ±30
    * graded convention) are unaffected. */
  private[graft] val ExpClamp = 40.0
  private def clampExp(x: Column): Column =
    least(greatest(x.cast("double"), lit(-ExpClamp)), lit(ExpClamp))
  def expColumn(x0: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.PortableExp(ColumnBridge.expression(
      clampExp(x0))))
  }

  /** The HOF/lambda reference form of [[expColumn]] — the executable
    * specification PmathSpec sweeps against the native expression. */
  private[graft] def expColumnLambda(x0: Column): Column = bind(clampExp(x0)) { x =>
    bind(floor(x * lit(InvLn2) + lit(0.5))) { kk =>
      bind(x - kk.cast("double") * lit(Ln2)) { r =>
        val p = expCoeffs.reverse.tail.foldLeft(lit(expCoeffs.last)) {
          (acc, c) => lit(c) + r * acc
        }
        val scale = pow2.foldLeft(when(lit(false), lit(0.0))) {
          case (w, (k, v)) => w.when(kk === lit(k), lit(v))
        }.otherwise(lit(Double.NaN))
        p * scale
      }
    }
  }

  /** N sequential portable-exp chains over one row set — the exp
    * analog of [[lnSqlChainCtes]]. `specs` is (inputExprSql, outCol)
    * per exp; `carry` the base columns every chain must keep. Each
    * chain replays [[expColumn]]'s exact op order: BIGINT k from the
    * floor, r = x − k·ln2, the fixed Horner, a 121-branch exact-2ᵏ
    * CASE. */
  def expSqlChainCtes(baseCte: String, prefix: String,
                      specs: Seq[(String, String)],
                      carry: Seq[String]): (String, String) = {
    val horner = expCoeffs.reverse.tail.foldLeft(d(expCoeffs.last)) {
      (acc, c) => s"${d(c)} + pexp_r * ($acc)"
    }
    val scaleCase = pow2.map { case (k, v) =>
      s"WHEN $k THEN ${d(v)}"
    }.mkString("CASE pexp_kk ", " ", " END")
    var prev = baseCte
    val out = Seq.newBuilder[String]
    specs.zipWithIndex.foreach { case ((inExpr, outCol), j) =>
      val keep = (carry ++ specs.take(j).map(_._2)).mkString(", ")
      val (n0, n1, n2) = (s"${prefix}_${j}a", s"${prefix}_${j}b",
        s"${prefix}_${j}c")
      out += (s"$n0 AS (SELECT $keep, least(greatest(CAST(($inExpr) " +
        s"AS DOUBLE), ${d(-ExpClamp)}), ${d(ExpClamp)}) AS expin FROM $prev)")
      out += (s"$n1 AS (SELECT *, CAST(floor(expin * ${d(InvLn2)} + 0.5) " +
        s"AS BIGINT) AS pexp_kk FROM $n0)")
      out += (s"$n2 AS (SELECT $keep, " +
        s"(($horner)) * ($scaleCase) AS $outCol FROM " +
        s"(SELECT *, expin - CAST(pexp_kk AS DOUBLE) * ${d(Ln2)} " +
        s"AS pexp_r FROM $n1))")
      prev = n2
    }
    (out.result().mkString(",\n          "), prev)
  }

  // ---- portable sin/cos (reduced domain) -------------------------------

  /** 2π, correctly rounded. */
  private[graft] val TwoPi = 6.283185307179586
  /** Maclaurin coefficients in u = θ²: sin θ = θ·Σ sc_n uⁿ,
    * cos θ = Σ cc_n uⁿ, n = 0..12. The VALUES need not be exactly
    * (−1)ⁿ/(2n+1)! — they are computed once here and embedded as the
    * same literal on both engines, which is all portability needs;
    * truncation at |θ| ≤ π is < 1e-12 and identical everywhere. */
  private[graft] val sinCoeffs: Seq[Double] = (0 to 12).map { n =>
    val f = (1 to (2 * n + 1)).foldLeft(1.0)(_ * _)
    (if (n % 2 == 0) 1.0 else -1.0) / f
  }
  private[graft] val cosCoeffs: Seq[Double] = (0 to 12).map { n =>
    val f = (1 to (2 * n)).foldLeft(1.0)(_ * _)
    (if (n % 2 == 0) 1.0 else -1.0) / f
  }

  private def horner(u: Column, cs: Seq[Double]): Column =
    cs.reverse.tail.foldLeft(lit(cs.last)) { (acc, c) => lit(c) + u * acc }

  /** Portable sin for |θ| ≤ π (callers range-reduce with exact integer
    * arithmetic — e.g. θ = 2π·m/N with m ∈ (−N/2, N/2]): one fixed
    * Horner in θ², the same IEEE sequence on every engine. */
  def sinColumn(theta: Column): Column = bind(theta.cast("double")) { th =>
    bind(th * th) { u => th * horner(u, sinCoeffs) }
  }

  /** Portable cos for |θ| ≤ π — see [[sinColumn]]. */
  def cosColumn(theta: Column): Column = bind(theta.cast("double")) { th =>
    bind(th * th) { u => horner(u, cosCoeffs) }
  }

  private def hornerSql(u: String, cs: Seq[Double]): String =
    cs.reverse.tail.foldLeft(d(cs.last)) { (acc, c) =>
      s"${d(c)} + $u * ($acc)"
    }

  /** SQL replay of [[sinColumn]]/[[cosColumn]]: expressions over a
    * θ column (θ² is inlined as (θ·θ), matching the engine's single
    * bind). */
  def sinSqlExpr(thetaCol: String): String =
    s"$thetaCol * (${hornerSql(s"($thetaCol * $thetaCol)", sinCoeffs)})"
  def cosSqlExpr(thetaCol: String): String =
    s"(${hornerSql(s"($thetaCol * $thetaCol)", cosCoeffs)})"

  /** N sequential [[lnSqlCtes]] chains over one row set — for oracles
    * that need several portable lns per row (Naive Bayes likelihoods,
    * G² cells). `specs` is (inputExprSql, outCol) per ln; `carry` the
    * base columns every chain must keep. Returns the comma-joined CTE
    * definitions (splice after a `,`) and the final CTE name, which
    * exposes `carry ++ specs.map(outCol)`. Intermediate pln_* columns
    * are dropped between chains so the names never collide. */
  def lnSqlChainCtes(baseCte: String, prefix: String,
                     specs: Seq[(String, String)],
                     carry: Seq[String]): (String, String) = {
    var prev = baseCte
    val out = Seq.newBuilder[String]
    specs.zipWithIndex.foreach { case ((inExpr, outCol), j) =>
      val keep = (carry ++ specs.take(j).map(_._2)).mkString(", ")
      val (l1, l2, l3) = lnSqlCtes("lnin", outCol)
      val (n0, n1, n2, n3) = (s"${prefix}_${j}a", s"${prefix}_${j}b",
        s"${prefix}_${j}c", s"${prefix}_${j}d")
      out += s"$n0 AS (SELECT $keep, CAST(($inExpr) AS DOUBLE) AS lnin FROM $prev)"
      out += s"$n1 AS (SELECT *, $l1 FROM $n0)"
      out += s"$n2 AS (SELECT *, $l2 FROM $n1)"
      out += s"$n3 AS (SELECT $keep, $outCol FROM (SELECT *, $l3 FROM $n2))"
      prev = n3
    }
    (out.result().mkString(",\n          "), prev)
  }
}
