package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Cleanse, Exact}

/** Gold-layer dimensional model (SURVEY.md §3.3) — the reference's three
  * builders (/root/reference/scripts/gold/load_gold.py:50-140) plus
  * `fact_payments`, which README.md:47 declares but never implements
  * (SURVEY §1.3); ours is the obvious payments ⟕ policies FK resolution.
  *
  * Scale design: the dimension sides of every join are small (≤ |clients|),
  * so they are `broadcast()` — no shuffle for the joins. The only wide
  * operations are the three groupBy(client_id) aggregates, which shuffle
  * once on the natural key; AQE coalesces their output partitions.
  *
  * Faithful pandas quirks, kept deliberately:
  *  - pandas `groupby` drops null keys (payments/claims whose policy_id
  *    didn't resolve to a client) — we filter client_id IS NOT NULL before
  *    aggregating (Spark would otherwise keep a null group).
  *  - ratio columns divide aggregates; pandas emits inf/NaN on zero/NaN
  *    denominators, we emit null ([[Cleanse.safeDiv]], SURVEY §7.4.3).
  */
object Gold {

  /** dim_clients = clients ⟕ crm[client_id, client_type, risk_level,
    * marketing_opt_in] (load_gold.py:56-73). */
  def dimClients(clients: DataFrame, crm: DataFrame): DataFrame =
    clients.join(
      broadcast(crm.select("client_id", "client_type", "risk_level", "marketing_opt_in")),
      Seq("client_id"), "left")

  /** dim_vehicles: surrogate key + 7-col projection + distinct
    * (load_gold.py:77-90). */
  def dimVehicles(vehicles: DataFrame): DataFrame =
    vehicles.withColumn("vehicle_key", col("vehicle_id"))
      .select("vehicle_key", "vehicle_id", "client_id", "brand", "model", "year", "plate")
      .dropDuplicates()

  /** fact_client_summary (load_gold.py:94-140): three per-client aggregates
    * left-joined onto the distinct client spine, plus 4 derived ratios. */
  def factClientSummary(clients: DataFrame, policies: DataFrame,
                        payments: DataFrame, claims: DataFrame): DataFrame = {
    val policiesAgg = policies.groupBy("client_id").agg(
      count(col("policy_id")).as("total_policies"),
      Exact.moneySum(col("premium")).as("total_premium"),
      Exact.countIf(col("status") === "Activa").as("active_policies"))

    // FK map reused by payments and claims (load_gold.py:112, cached in
    // the reference by virtue of being a materialized frame).
    val policiesMin = policies.select("policy_id", "client_id").dropDuplicates()

    val paymentsAgg = payments
      .join(broadcast(policiesMin), Seq("policy_id"), "left")
      .filter(col("client_id").isNotNull) // pandas groupby drops null keys
      .groupBy("client_id").agg(
        Exact.moneySum(col("amount")).as("total_payments"),
        count(col("payment_id")).as("num_payments"),
        max(col("payment_date")).as("last_payment_date"))

    val claimsAgg = claims
      .join(broadcast(policiesMin), Seq("policy_id"), "left")
      .filter(col("client_id").isNotNull)
      .groupBy("client_id").agg(
        Exact.moneySum(col("amount")).as("total_claims"),
        count(col("claim_id")).as("num_claims"))

    clients.select("client_id").dropDuplicates()
      .join(policiesAgg, Seq("client_id"), "left")
      .join(paymentsAgg, Seq("client_id"), "left")
      .join(claimsAgg, Seq("client_id"), "left")
      .withColumn("payment_to_premium_ratio",
        Cleanse.safeDiv(col("total_payments"), col("total_premium")))
      .withColumn("claim_ratio",
        Cleanse.safeDiv(col("total_claims"), col("total_premium")))
      .withColumn("avg_payment",
        Cleanse.safeDiv(col("total_payments"), col("num_payments")))
      .withColumn("avg_claim",
        Cleanse.safeDiv(col("total_claims"), col("num_claims")))
  }

  /** fact_payments — declared in the reference README (:47) with no
    * implementation; semantics embedded at load_gold.py:112-113:
    * payments ⟕ policies(policy_id → client_id, vehicle_id). */
  def factPayments(payments: DataFrame, policies: DataFrame): DataFrame =
    payments.join(
      broadcast(policies.select("policy_id", "client_id", "vehicle_id").dropDuplicates()),
      Seq("policy_id"), "left")
}
