package graft

import org.apache.spark.sql.functions._
import graft.sources.Gen

/** Seeded generator properties (SURVEY.md §2.1 S6, §2.7 G1/G2). */
class GenSpec extends SparkSpec {

  test("same seed => identical data regardless of partitioning") {
    val a = Gen.clients(spark, 1000, seed = 7).repartition(2)
      .orderBy("client_id").collect()
    val b = Gen.clients(spark, 1000, seed = 7).repartition(13)
      .orderBy("client_id").collect()
    assert(a.sameElements(b))
  }

  test("different seeds => different data") {
    val a = Gen.clients(spark, 100, seed = 1).orderBy("client_id").collect()
    val b = Gen.clients(spark, 100, seed = 2).orderBy("client_id").collect()
    assert(!a.sameElements(b))
  }

  test("G1: crm is ~70% sample of clients with matching ids") {
    val clients = Gen.clients(spark, 2000)
    val crm = Gen.crmClients(spark, 2000)
    val n = crm.count()
    assert(n > 1300 && n < 1500, s"sample size $n")
    // every crm client_id exists in clients (FK integrity of the sample)
    assert(crm.join(clients, Seq("client_id"), "left_anti").count() == 0)
  }

  test("G2: null injection rates approximately honored") {
    val v = Gen.vehicles(spark, 4000, 4000)
    val nullRate = v.filter(col("client_id").isNull).count().toDouble / 4000
    assert(nullRate > 0.03 && nullRate < 0.07, s"client_id null rate $nullRate")
    val p = Gen.payments(spark, 4000, 4000)
    val negRate = p.filter(col("amount") <= 0).count().toDouble / 4000
    assert(negRate > 0.01 && negRate < 0.06, s"negative amount rate $negRate")
  }

  test("claims: ~5% future sentinel dates") {
    val c = Gen.claims(spark, 4000, 4000)
    val futRate = c.filter(col("claim_date") === "2030-01-01").count().toDouble / 4000
    assert(futRate > 0.03 && futRate < 0.07, s"sentinel rate $futRate")
  }

  test("true fraction sample with seed is reproducible (G1 rand form)") {
    val df = Gen.clients(spark, 1000)
    val s1 = df.sample(withReplacement = false, 0.7, seed = 42).count()
    val s2 = df.sample(withReplacement = false, 0.7, seed = 42).count()
    assert(s1 == s2 && s1 > 600 && s1 < 800)
  }

  test("FK ids join back to their parent tables") {
    val clients = Gen.clients(spark, 500)
    val policies = Gen.policies(spark, 500, 500, 500)
    val orphan = policies.filter(col("client_id").isNotNull)
      .join(clients, Seq("client_id"), "left_anti").count()
    assert(orphan == 0)
  }
}
