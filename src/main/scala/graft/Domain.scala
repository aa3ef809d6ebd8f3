package graft

import java.sql.Timestamp

/** Typed models for the insurance domain (SURVEY.md §1.3) — `Dataset[T]`
  * sugar over the canonical DataFrame pipelines for callers who want
  * compile-time field checks. The engine itself stays untyped (the
  * reference's schemas are inferred/dynamic, §1.2); these mirror the
  * silver-layer shapes (dates already parsed to timestamps). */
object Domain {
  case class Client(client_id: Option[String], name: Option[String],
                    email: Option[String], phone: Option[String],
                    address: Option[String])

  case class CrmClient(client_id: Option[String], name: Option[String],
                       email: Option[String], phone: Option[String],
                       address: Option[String],
                       iban_account_number: Option[String],
                       company_name: Option[String],
                       client_type: Option[String], risk_level: Option[String],
                       marketing_opt_in: Option[Boolean])

  case class Vehicle(vehicle_id: Option[String], client_id: Option[String],
                     brand: Option[String], model: Option[String],
                     year: Option[Int], plate: Option[String])

  case class Policy(policy_id: Option[String], client_id: Option[String],
                    vehicle_id: Option[String], coverage: Option[String],
                    status: Option[String], premium: Option[Double])

  case class Claim(claim_id: Option[String], policy_id: Option[String],
                   claim_date: Option[Timestamp], claim_type: Option[String],
                   amount: Option[Double])

  case class Payment(payment_id: Option[String], policy_id: Option[String],
                     amount: Option[Double], payment_date: Option[Timestamp])

  case class ClientSummary(client_id: Option[String],
                           total_policies: Option[Long],
                           total_premium: Option[Double],
                           active_policies: Option[Long],
                           total_payments: Option[Double],
                           num_payments: Option[Long],
                           last_payment_date: Option[Timestamp],
                           total_claims: Option[Double],
                           num_claims: Option[Long],
                           payment_to_premium_ratio: Option[Double],
                           claim_ratio: Option[Double],
                           avg_payment: Option[Double],
                           avg_claim: Option[Double])
}
