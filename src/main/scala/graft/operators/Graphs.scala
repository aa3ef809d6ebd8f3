package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators for the dedup pipeline (SURVEY.md §2.10): near-dup
  * detectors ([[Dedup]]) emit PAIRS, but dropping duplicates from a corpus
  * needs CLUSTERS — the transitive closure of the pair graph, with one
  * canonical representative per cluster. This is the standard last stage
  * of a corpus-dedup pipeline (pairs → components → keep min-id doc).
  */
object Graphs {

  /** Connected components by iterative min-label propagation: every node
    * starts labeled with itself; each round it adopts the minimum label
    * among itself and its neighbors; at fixpoint the label is the
    * component's minimum node id.
    *
    * Scale shape: each round is one equi-join (edges ⋈ labels, keyed on
    * node) plus one hash aggregation — fully distributed, no driver-side
    * graph. Rounds = graph diameter, the right trade for dedup graphs
    * (near-dup clusters are shallow: bounded diameter, tiny components).
    * For adversarially deep graphs the literature's fix is the
    * large-star/small-star reformulation (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14) which converges in
    * O(log²) rounds — same join-per-round shape, so it can slot in here
    * without changing callers. Each round's result is persisted and the
    * previous round unpersisted, so round N costs one pass, not N
    * (lineage re-execution), and the convergence probe is a cheap
    * limit-1 count of changed labels.
    *
    * Input: an edge list (undirected; orientation and duplicates don't
    * matter). Output: (id, component) for every node that appears in at
    * least one edge; component = min node id of the component. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .distinct().persist()
    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("comp", col("id")).persist()
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("v"), col("comp").as("vcomp")), Seq("v"))
        .groupBy(col("u").as("id")).agg(min(col("vcomp")).as("nbr"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr"), col("comp"))).as("comp"))
        .persist()
      val changed = next
        .join(labels.select(col("id"), col("comp").as("old")), Seq("id"))
        .filter(col("comp") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      it += 1
    }
    sym.unpersist()
    // labels that never reached fixpoint are WRONG (a component would be
    // split) — refuse rather than return silently-bad clusters; diameter
    // > maxIter means this graph needs the large-star/small-star variant
    if (!converged) {
      labels.unpersist()
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $maxIter rounds " +
          "(graph diameter exceeds maxIter); raise maxIter or use a " +
          "logarithmic-round variant for deep graphs")
    }
    labels.select(col("id"), col("comp").as("component"))
  }

  /** Cluster assignment for dedup: every doc that appears in ≥ 1 pair,
    * with its cluster representative (min doc id in the component) and
    * the cluster size — the "which copies do I drop" table (keep rows
    * where doc_id = cluster_rep, drop the rest). */
  def dedupClusters(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
    val sizes = cc.groupBy("component").agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, Seq("component"))
      .select(col("id").as("doc_id"), col("component").as("cluster_rep"),
        col("cluster_size"))
  }
}
