package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded Spark-native synthetic source (SURVEY.md §2.1 S6, §2.7 G1/G2) —
  * the reference's Faker generator
  * (/root/reference/scripts/data_sources/generate_raw_data.py:24-140)
  * re-expressed as distributed, DETERMINISTIC column expressions.
  *
  * The reference is unseeded; the engine derives every pseudo-random value
  * from `xxhash64(row_id, salt, seed)`, which is (a) reproducible across
  * runs and partitionings — unlike `rand(seed)`, which depends on the
  * partition layout — and (b) embarrassingly parallel: `spark.range(n)`
  * scales to any row count with no driver-side state. Dirty-data injection
  * rates (nulls, empty strings, negatives, the future-date sentinel)
  * follow FIXTURES.md §A exactly.
  */
object Gen {

  /** Deterministic uniform in [0,1) from an id column and a salt. */
  private def u(c: Column, salt: Int, seed: Long): Column =
    pmod(xxhash64(c, lit(salt), lit(seed)), lit(1000000000L)) / 1e9

  /** Deterministic pick from a literal vocabulary. */
  private def pick(c: Column, salt: Int, seed: Long, vs: Seq[String]): Column =
    element_at(array(vs.map(lit): _*),
      (pmod(xxhash64(c, lit(salt), lit(seed)), lit(vs.size)) + 1).cast("int"))

  private def nullIf(p: Double, c: Column, value: Column): Column =
    when(c >= p, value) // c is a uniform; < p → null

  private val firstNames = Seq("maría", "josé", "antonio", "carmen", "david",
    "lucía", "manuel", "sara", "  pablo", "elena ")
  private val lastNames = Seq("garcía", "lópez", "martínez", "o'brien",
    "fernández", "sánchez", "DíAZ", "romero", "navarro", "ruiz")
  private val streets = Seq("calle mayor", "avenida del sol", "plaza españa",
    "camino real", "paseo de gracia")
  private val brands = Seq("toyota", "ford", " renault", "seat", "VOLKSWAGEN")
  private val models = Seq("corolla", "fiesta", "clio", "ibiza", "golf ")
  private val emailDomains = Seq("example.com", "mail.es", "test.org", "bad_domain", "x")

  private def clientId(idx: Column): Column =
    substring(md5(concat(lit("c"), idx.cast("string"))), 1, 8)
  private def policyId(idx: Column): Column =
    substring(md5(concat(lit("p"), idx.cast("string"))), 1, 8)
  private def vehicleId(idx: Column): Column =
    substring(md5(concat(lit("v"), idx.cast("string"))), 1, 8)

  private def fullName(id: Column, salt: Int, seed: Long): Column =
    concat(pick(id, salt, seed, firstNames), lit(" "),
      pick(id, salt + 1, seed, lastNames))

  /** Email mix: some syntactically invalid (bad domain / missing TLD) so
    * silver's E3 has work to do. */
  private def email(id: Column, salt: Int, seed: Long): Column =
    concat(regexp_replace(lower(fullName(id, salt + 2, seed)), "[^a-z]", ""),
      lit("@"), pick(id, salt + 3, seed, emailDomains))

  private def phone(id: Column, salt: Int, seed: Long): Column =
    concat(lit("(+34) 6"), (pmod(xxhash64(id, lit(salt + 4), lit(seed)), lit(90000000L)) + 10000000L).cast("string"))

  private def address(id: Column, salt: Int, seed: Long): Column =
    concat(pick(id, salt + 5, seed, streets), lit(" "),
      (pmod(xxhash64(id, lit(salt + 6), lit(seed)), lit(200L)) + 1).cast("string"),
      lit("\npiso "), (pmod(xxhash64(id, lit(salt + 7), lit(seed)), lit(9L)) + 1).cast("string"))

  private def dateStr(id: Column, salt: Int, seed: Long, fromYear: Int, days: Int): Column =
    date_format(date_add(to_date(lit(f"$fromYear%04d-01-01")),
      pmod(xxhash64(id, lit(salt), lit(seed)), lit(days.toLong)).cast("int")), "yyyy-MM-dd")

  // ---- the 6 source tables (row counts default to the reference's) ----

  def clients(spark: SparkSession, n: Long = 5000, seed: Long = 42): DataFrame = {
    val id = col("id")
    spark.range(n).select(
      clientId(id).as("client_id"),
      fullName(id, 10, seed).as("name"),
      nullIf(0.10, u(id, 11, seed), email(id, 12, seed)).as("email"),
      when(u(id, 13, seed) >= 0.10, phone(id, 14, seed)).otherwise(lit("")).as("phone"),
      address(id, 15, seed).as("address"))
  }

  /** 70% deterministic sample of clients (G1, generate_raw_data.py:41) with
    * CRM-specific dirt: 30% fully upper-cased names, empty-string rates per
    * FIXTURES.md §A. */
  def crmClients(spark: SparkSession, n: Long = 5000, seed: Long = 42): DataFrame = {
    val id = col("id")
    spark.range(n).filter(u(id, 20, seed) < 0.70).select(
      clientId(id).as("client_id"),
      when(u(id, 21, seed) < 0.30, upper(fullName(id, 10, seed)))
        .otherwise(fullName(id, 10, seed)).as("name"),
      nullIf(0.20, u(id, 22, seed), email(id, 12, seed)).as("email"),
      when(u(id, 23, seed) >= 0.20, phone(id, 14, seed)).otherwise(lit("")).as("phone"),
      when(u(id, 24, seed) >= 0.30, address(id, 15, seed)).otherwise(lit("")).as("address"),
      when(u(id, 25, seed) >= 0.70,
        concat(lit("es"), lpad(pmod(xxhash64(id, lit(26), lit(seed)), lit(100000000L)).cast("string"), 22, "0")))
        .otherwise(lit("")).as("iban_account_number"),
      when(u(id, 27, seed) >= 0.70, concat(pick(id, 28, seed, lastNames), lit(" S.L.")))
        .otherwise(lit("")).as("company_name"),
      pick(id, 29, seed, Seq("gold", "silver", "bronze")).as("client_type"),
      pick(id, 30, seed, Seq("low", "medium", "high")).as("risk_level"),
      (u(id, 31, seed) < 0.5).as("marketing_opt_in"))
  }

  def vehicles(spark: SparkSession, n: Long = 5000, nClients: Long = 5000,
               seed: Long = 42): DataFrame = {
    val id = col("id")
    spark.range(n).select(
      vehicleId(id).as("vehicle_id"),
      nullIf(0.05, u(id, 40, seed),
        clientId(pmod(xxhash64(id, lit(41), lit(seed)), lit(nClients)))).as("client_id"),
      pick(id, 42, seed, brands).as("brand"),
      pick(id, 43, seed, models).as("model"),
      (pmod(xxhash64(id, lit(44), lit(seed)), lit(30L)) + 1995).cast("int").as("year"),
      concat(pmod(xxhash64(id, lit(45), lit(seed)), lit(10000L)).cast("string"),
        lit(" -"), pick(id, 46, seed, Seq("bcd", "fgh", "jkl"))).as("plate"))
  }

  def policies(spark: SparkSession, n: Long = 5000, nClients: Long = 5000,
               nVehicles: Long = 5000, seed: Long = 42): DataFrame = {
    val id = col("id")
    spark.range(n).select(
      policyId(id).as("policy_id"),
      nullIf(0.05, u(id, 50, seed),
        clientId(pmod(xxhash64(id, lit(51), lit(seed)), lit(nClients)))).as("client_id"),
      nullIf(0.05, u(id, 52, seed),
        vehicleId(pmod(xxhash64(id, lit(53), lit(seed)), lit(nVehicles)))).as("vehicle_id"),
      pick(id, 54, seed, Seq("Básica", "Intermedia", "Premium")).as("coverage"),
      pick(id, 55, seed, Seq("Activa", "Vencida", "Cancelada")).as("status"),
      round(u(id, 56, seed) * 2800 + 200, 2).as("premium"))
  }

  /** claims: 5% future-date sentinel "2030-01-01"
    * (generate_raw_data.py:106) — silver's E12 must null it. */
  def claims(spark: SparkSession, n: Long = 2500, nPolicies: Long = 5000,
             seed: Long = 42): DataFrame = {
    val id = col("id")
    spark.range(n).select(
      substring(md5(concat(lit("cl"), id.cast("string"))), 1, 8).as("claim_id"),
      nullIf(0.10, u(id, 60, seed),
        policyId(pmod(xxhash64(id, lit(61), lit(seed)), lit(nPolicies)))).as("policy_id"),
      when(u(id, 62, seed) < 0.05, lit("2030-01-01"))
        .otherwise(dateStr(id, 63, seed, 2020, 1800)).as("claim_date"),
      pick(id, 64, seed,
        Seq("Colisión", "Robo", "Daños por clima", "Incendio", "Otros")).as("claim_type"),
      round(u(id, 65, seed) * 19900 + 100, 2).as("amount"))
  }

  /** payments: amounts uniform in [-100, 3000) — negatives deliberately
    * injected (generate_raw_data.py:119); silver DROPS those rows. */
  def payments(spark: SparkSession, n: Long = 5000, nPolicies: Long = 5000,
               seed: Long = 42): DataFrame = {
    val id = col("id")
    spark.range(n).select(
      substring(md5(concat(lit("pay"), id.cast("string"))), 1, 8).as("payment_id"),
      nullIf(0.10, u(id, 70, seed),
        policyId(pmod(xxhash64(id, lit(71), lit(seed)), lit(nPolicies)))).as("policy_id"),
      round(u(id, 72, seed) * 3100 - 100, 2).as("amount"),
      dateStr(id, 73, seed, 2021, 1400).as("payment_date"))
  }

  def all(spark: SparkSession, scale: Double = 1.0, seed: Long = 42): Map[String, DataFrame] = {
    val nC = (5000 * scale).toLong max 1
    val nV = (5000 * scale).toLong max 1
    val nP = (5000 * scale).toLong max 1
    Map(
      "clients" -> clients(spark, nC, seed),
      "crm_clients" -> crmClients(spark, nC, seed),
      "vehicles" -> vehicles(spark, nV, nC, seed),
      "policies" -> policies(spark, nP, nC, nV, seed),
      "claims" -> claims(spark, (2500 * scale).toLong max 1, nP, seed),
      "payments" -> payments(spark, nP, nP, seed))
  }
}
