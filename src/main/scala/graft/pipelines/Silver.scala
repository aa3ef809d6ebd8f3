package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Cleanse._

/** Silver-layer cleansing pipelines (SURVEY.md §3.2) — pure
  * `DataFrame => DataFrame` table functions with I/O injected, mirroring
  * /root/reference/scripts/silver/load_silver.py:55-221 operator-for-
  * operator, but as a single declarative Project+Filter per table so
  * Catalyst collapses everything into one whole-stage-codegen'd scan
  * stage (no shuffle anywhere in silver).
  *
  * Non-determinism in the reference (`datetime.now()` bounds at
  * load_silver.py:131,187) is replaced by an explicit `asOf` parameter.
  *
  * Title-casing is the FAITHFUL Python `str.title()` via the custom
  * [[graft.plans.TitleCasePy]] codegen expression ("o'brien"→"O'Brien",
  * like pandas), so reference_diff.py matches the reference's output
  * exactly — the former initcap deviation (SURVEY §7.4.1) is closed.
  */
object Silver {

  /** Cleansing order in the reference (load_silver.py:63-107): title-case
    * text cols FIRST, then IBAN upper, then email regex (so surviving
    * emails are the *title-cased* form — load-bearing order), then phone. */
  private val textCols =
    Seq("name", "email", "phone", "address", "company_name", "client_type", "risk_level")

  private def cleanTextCols(df: DataFrame): DataFrame =
    textCols.foldLeft(df) { (acc, c) =>
      if (acc.columns.contains(c)) acc.withColumn(c, titleCasePy(col(c))) else acc
    }

  /** clients: title-case text, validate (title-cased) email, strip phone
    * (load_silver.py:55-107; no row filter on clients). */
  def clients(df: DataFrame): DataFrame = {
    val t = cleanTextCols(df)
    t.withColumn("email", validEmail(col("email")))
      .withColumn("phone", normalizePhone(col("phone")))
  }

  /** crm_clients: drop null client_id, then the same text pipeline plus
    * IBAN upper-case (load_silver.py:59,82-85). */
  def crmClients(df: DataFrame): DataFrame = {
    val t = cleanTextCols(df.na.drop(Seq("client_id")))
    t.withColumn("iban_account_number", upperTrim(col("iban_account_number")))
      .withColumn("email", validEmail(col("email")))
      .withColumn("phone", normalizePhone(col("phone")))
  }

  /** vehicles: drop null client_id; title-case brand/model; year ∈
    * [1900, asOfYear]; plate → [A-Z0-9] (load_silver.py:116-146). */
  def vehicles(df: DataFrame, asOfYear: Int): DataFrame =
    df.na.drop(Seq("client_id"))
      .withColumn("brand", titleCasePy(col("brand")))
      .withColumn("model", titleCasePy(col("model")))
      .withColumn("year", validRange(col("year"), 1900, asOfYear))
      .withColumn("plate", normalizePlate(col("plate")))

  /** policies: drop null client_id/vehicle_id; coverage/status domain
    * whitelists (title-cased); premium > 0 rounded (load_silver.py:148-172). */
  def policies(df: DataFrame): DataFrame =
    df.na.drop(Seq("client_id", "vehicle_id"))
      .withColumn("coverage",
        domainWhitelistPy(col("coverage"), Seq("Básica", "Intermedia", "Premium")))
      .withColumn("status",
        domainWhitelistPy(col("status"), Seq("Activa", "Vencida", "Cancelada")))
      .withColumn("premium", positiveRound2(col("premium")))

  /** claims: drop null policy_id; dates parsed, future → null (the
    * "2030-01-01" sentinel); claim_type whitelist; amount > 0 rounded —
    * null amounts are KEPT (asymmetry vs payments, SURVEY §7.4.6)
    * (load_silver.py:174-202). */
  def claims(df: DataFrame, asOf: String): DataFrame =
    df.na.drop(Seq("policy_id"))
      .withColumn("claim_date", validDateUpTo(col("claim_date"), asOf))
      .withColumn("claim_type", domainWhitelistPy(col("claim_type"),
        Seq("Colisión", "Robo", "Daños Por Clima", "Incendio", "Otros")))
      .withColumn("amount", positiveRound2(col("amount")))

  /** payments: drop null policy_id; lenient date parse then DROP
    * unparseable; amount > 0 rounded then DROP non-positive rows
    * (load_silver.py:204-221). */
  def payments(df: DataFrame): DataFrame =
    df.na.drop(Seq("policy_id"))
      .withColumn("payment_date", coerceLenient(col("payment_date")))
      .na.drop(Seq("payment_date"))
      .withColumn("amount", positiveRound2(col("amount")))
      .na.drop(Seq("amount"))
}
