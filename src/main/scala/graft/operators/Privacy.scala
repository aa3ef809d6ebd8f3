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
}
