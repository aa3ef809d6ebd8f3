package graft

/** Driver-contract consistency: the gate silently downgrades any query
  * whose oracle key doesn't match (rows-only check instead of
  * hash-compare), and a duplicate query name across Parity/Ext would
  * silently shadow one implementation — both must be build failures
  * here, not silent grade losses. */
class ContractSpec extends SparkSpec {

  test("every oracle key names an existing query (no typo'd keys)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("Parity/Ext/Ext2 query names don't collide") {
    val e2q = (graft.queries.Parity.queries.keySet ++
      graft.queries.Ext.queries.keySet)
      .intersect(graft.queries.Ext2.queries.keySet)
    assert(e2q.isEmpty, s"shadowed queries: $e2q")
    val e2o = (graft.queries.Parity.oracle.keySet ++
      graft.queries.Ext.oracle.keySet)
      .intersect(graft.queries.Ext2.oracle.keySet)
    assert(e2o.isEmpty, s"shadowed oracles: $e2o")
  }

  test("Parity and Ext query names don't collide") {
    val overlap = graft.queries.Parity.queries.keySet
      .intersect(graft.queries.Ext.queries.keySet)
    assert(overlap.isEmpty, s"shadowed queries: $overlap")
    val oracleOverlap = graft.queries.Parity.oracle.keySet
      .intersect(graft.queries.Ext.oracle.keySet)
    assert(oracleOverlap.isEmpty, s"shadowed oracles: $oracleOverlap")
  }

  test("graded-surface census matches the documented counts") {
    val n = SparkEntry.queries.size
    val exact = SparkEntry.oracleSql.size
    info(s"graded queries: $n; exact oracles: $exact; rows-only: ${n - exact}")
    assert(n == 354 && exact == 350,
      s"census drifted ($n/$exact) — update README/SCALE counts and this spec")
  }
}
