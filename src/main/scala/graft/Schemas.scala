package graft

import org.apache.spark.sql.types._

/** Explicit schemas for the 6 insurance source tables (SURVEY.md §1.3).
  *
  * The reference never declares schemas — types come from pandas CSV
  * inference (/root/reference/scripts/bronze/load_bronze.py:35). An engine
  * must not depend on inference, so we declare what pandas would infer.
  * Every field is nullable (nulls are injected at generation time,
  * generate_raw_data.py:31-32,75,90-91,105-106,118). Dates arrive as
  * strings and only become timestamps in silver (load_silver.py:183,211).
  */
object Schemas {

  private def s(name: String) = StructField(name, StringType, nullable = true)
  private def d(name: String) = StructField(name, DoubleType, nullable = true)

  val clients: StructType = StructType(Seq(
    s("client_id"), s("name"), s("email"), s("phone"), s("address")))

  val crmClients: StructType = StructType(Seq(
    s("client_id"), s("name"), s("email"), s("phone"), s("address"),
    s("iban_account_number"), s("company_name"), s("client_type"),
    s("risk_level"), StructField("marketing_opt_in", BooleanType, nullable = true)))

  val vehicles: StructType = StructType(Seq(
    s("vehicle_id"), s("client_id"), s("brand"), s("model"),
    StructField("year", IntegerType, nullable = true), s("plate")))

  val policies: StructType = StructType(Seq(
    s("policy_id"), s("client_id"), s("vehicle_id"), s("coverage"),
    s("status"), d("premium")))

  val claims: StructType = StructType(Seq(
    s("claim_id"), s("policy_id"), s("claim_date"), s("claim_type"),
    d("amount")))

  val payments: StructType = StructType(Seq(
    s("payment_id"), s("policy_id"), d("amount"), s("payment_date")))

  val all: Map[String, StructType] = Map(
    "clients" -> clients, "crm_clients" -> crmClients,
    "vehicles" -> vehicles, "policies" -> policies,
    "claims" -> claims, "payments" -> payments)
}
