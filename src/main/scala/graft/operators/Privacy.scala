package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing for published datasets (Sweeney k-anonymity,
  * Machanavajjhala l-diversity): before a table leaves the warehouse,
  * every quasi-identifier combination must be shared by ≥ k rows, and
  * each such group must carry ≥ l distinct sensitive values (else the
  * group re-identifies or attribute-discloses its members). This is the
  * release gate a data-governance pipeline runs next to PII redaction
  * ([[graft.functions.Text.redactPii]]).
  */
object Privacy {

  /** Per-QI-group audit: group key, size, distinct sensitive values,
    * and the k/l pass flags. Everything is one hash aggregate keyed on
    * the quasi-identifier tuple — count and count(distinct sensitive)
    * both collapse map-side, so the shuffle carries group-level rows
    * (bounded by the QI domain product, not the table). Exact integers
    * throughout. */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String],
                      sensitiveCol: Column, k: Long, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymityAudit: need at least one QI column")
    require(k >= 1 && l >= 1,
      s"kAnonymityAudit: k and l must be >= 1, got k=$k l=$l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(sensitiveCol).as("n_sensitive"))
      .withColumn("k_ok", col("n") >= k)
      .withColumn("l_ok", col("n_sensitive") >= l)
  }

  /** ε-differentially-private noisy count release (the Laplace
    * mechanism, Dwork et al. 2006): per group, release
    * count + Lap(1/ε) — the sensitivity of a count query is 1. The
    * publication-side companion to the k-anonymity audit: instead of
    * gating the exact histogram, perturb it.
    *
    * The Laplace draw is DETERMINISTIC and replayable (this is a
    * differential-testing engine): u comes from the md5 of the group
    * key + salt (v = 2h+1 over 17 bits, never exactly ½), and the
    * inverse CDF ln runs through the portable series —
    * noise = sign(u−½)/ε · (ln 65536 − ln m), m = 65536·(1−2|u−½|)
    * ∈ [1, 65536], both ln args integer. Swap the salt for a fresh
    * draw; a production deployment would swap the md5 for a secret
    * keyed PRF, which changes none of the plumbing.
    *
    * Scale shape: one hash-aggregate count + map-side noise — nothing
    * beyond the count's own shuffle. */
  def dpNoisyCounts(df: DataFrame, keyCol: String, epsilon: Double,
                    salt: String): DataFrame = {
    import graft.functions.Pmath
    val counts = df.groupBy(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("n"))
    val h = conv(substring(md5(concat(col("k"), lit("|" + salt))), 1, 4),
      16, 10).cast("long")
    val v = h * 2 + 1
    val m = lit(65536L) - abs(v - 65536L)
    val sgn = when(v > 65536L, lit(1.0)).otherwise(lit(-1.0))
    val noise = (lit(1.0 / epsilon) * sgn *
      (Pmath.lnColumn(lit(65536L)) - Pmath.lnColumn(m))).as("noise")
    counts.select(col("k").as(keyCol), col("n"), noise)
      .withColumn("release", col("n").cast("double") + col("noise"))
  }
}
