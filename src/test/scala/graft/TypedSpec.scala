package graft

import graft.sources.Gen
import graft.pipelines.{Gold, Silver}

/** Dataset[T] surface: the untyped pipelines round-trip through the typed
  * models with full schema compatibility (encoder-checked). */
class TypedSpec extends SparkSpec {
  import spark.implicits._
  import Domain._

  test("silver outputs decode into typed Datasets") {
    val pol = Silver.policies(Gen.policies(spark, 300, 300, 300)).as[Policy]
    assert(pol.collect().forall(p => p.client_id.isDefined && p.vehicle_id.isDefined))
    val pay = Silver.payments(Gen.payments(spark, 300, 300)).as[Payment]
    assert(pay.collect().forall(_.amount.exists(_ > 0)))
  }

  test("gold fact decodes into ClientSummary and typed logic composes") {
    val clients = Silver.clients(Gen.clients(spark, 200))
    val policies = Silver.policies(Gen.policies(spark, 200, 200, 200))
    val payments = Silver.payments(Gen.payments(spark, 200, 200))
    val claims = Silver.claims(Gen.claims(spark, 100, 200), "2026-01-01 00:00:00")
    val fact = Gold.factClientSummary(clients, policies, payments, claims)
      .as[ClientSummary]
    val rows = fact.collect()
    assert(rows.length == 200)
    // typed filter/map: Catalyst still prunes via the encoder schema
    val active = fact.filter(_.active_policies.exists(_ > 0))
      .map(r => r.client_id.get)
    assert(active.collect().toSet.subsetOf(rows.flatMap(_.client_id).toSet))
  }
}
