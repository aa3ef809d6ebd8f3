package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.CheckpointBlocks

/** Grid-blocked spatial self-join — the canonical "all pairs within
  * radius" shape (geo proximity, sensor co-location, spatial dedup).
  * A naive radius join is the O(n²) cross product; the grid block
  * assigns every point to a radius-sized square cell so any qualifying
  * pair must sit in the same OR adjacent cells — each left point probes
  * its 3×3 cell neighborhood and only those candidates get the exact
  * distance test. The same decomposition every spatial engine uses
  * (geohash prefix joins, S2 cell covers, PostGIS && + ST_DWithin).
  */
object Spatial {

  /** All unordered point pairs with squared L2 distance ≤ radius².
    * Coordinates must be non-negative integral columns; everything —
    * cells, candidate keys, distances — stays in exact integer
    * arithmetic (no trig, no floats), so the operator is
    * exact-oracle-able and the oracle can brute-force the quadratic
    * form at test scale.
    *
    * Returns (id_a, id_b, d2) with id_a < id_b; each pair emitted
    * exactly once (the left side explodes to its 9 neighbor cells, the
    * right side keeps its home cell — a candidate appears once per
    * ordered pair and the id ordering keeps one).
    *
    * Scale shape: a 9× narrow fanout of (id, x, y, cell) on one side,
    * one equi-join on the cell key, a codegen integer filter. Shuffle
    * volume is 9·n + n rows, never n². Skew bound: a cell holds the
    * points inside one radius² square, so the per-key join fanout is
    * density-bounded, not data-bounded; a corpus with pathological
    * point pileups caps it the fuzzy-join way (count cells first, cap
    * or sub-split the hot ones). */
  def gridRadiusJoin(df: DataFrame, idCol: String, xCol: String,
                     yCol: String, radius: Long): DataFrame = {
    require(radius >= 1, s"gridRadiusJoin: radius must be >= 1, got $radius")
    def idiv(a: Column, b: Long) = call_function("div", a, lit(b))
    val pts = df.select(col(idCol).as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"),
      idiv(col(xCol).cast("long"), radius).as("cx"),
      idiv(col(yCol).cast("long"), radius).as("cy"))
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val probes = pts.select(col("id").as("id_a"), col("x").as("xa"),
        col("y").as("ya"), explode(offsets).as("o"),
        col("cx"), col("cy"))
      .select(col("id_a"), col("xa"), col("ya"),
        (col("cx") + col("o.dx")).as("cx"), (col("cy") + col("o.dy")).as("cy"))
    val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    probes.join(
        pts.select(col("id").as("id_b"), col("x").as("xb"),
          col("y").as("yb"), col("cx"), col("cy")),
        Seq("cx", "cy"))
      .where(col("id_a") < col("id_b") && d2 <= radius * radius)
      .select(col("id_a"), col("id_b"), d2.as("d2"))
  }

  /** DBSCAN (Ester et al., KDD'96) composed from the proven pieces: the
    * grid-blocked radius join finds every ε-neighbor pair (never n²),
    * one hash aggregate counts neighborhoods, and connected components
    * over the CORE-CORE ε-graph forms the clusters — the standard
    * distributed-DBSCAN decomposition (MR-DBSCAN / DBSCAN-on-Spark all
    * reduce to exactly this: blocked neighbor join + parallel CC).
    *
    * Semantics, pinned deterministic:
    *  - core: |N_ε(p)| ≥ minPts COUNTING p itself (the textbook count);
    *  - cluster label: the MINIMUM core id of the core-connected
    *    component (isolated cores label themselves);
    *  - border (non-core with ≥1 core ε-neighbor): joins the MINIMUM
    *    cluster among its core neighbors — classic DBSCAN leaves border
    *    assignment scan-order-dependent; the min rule makes it a
    *    function of the data, which is what a hash-graded oracle and a
    *    100 TB rerun both need;
    *  - noise: everything else (cluster null).
    *
    * Returns (id, role ∈ core|border|noise, cluster nullable).
    *
    * Scale shape: everything is ε-neighbor joins and id-keyed hash
    * aggregates off the density-bounded grid join; CC is the bounded-
    * round localCheckpoint'd propagation (components above the density
    * threshold can percolate, so the label step must be the iterative
    * one, not a collect). */
  def dbscan(df: DataFrame, idCol: String, xCol: String, yCol: String,
             eps: Long, minPts: Int): DataFrame = {
    require(minPts >= 1, s"dbscan: minPts must be >= 1, got $minPts")
    val pairs = gridRadiusJoin(df, idCol, xCol, yCol, eps)
      .select("id_a", "id_b").persist()
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("nb"))
      .union(pairs.select(col("id_b").as("id"), col("id_a").as("nb")))
    val roles = df.select(col(idCol).as("id"))
      .join(sym.groupBy("id").agg(count(lit(1)).as("n_nb")), Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("n_nb"), lit(0L)) + 1 >= minPts).as("is_core"))
      .persist()
    val coreIds = roles.filter(col("is_core")).select("id")
    val coreEdges = pairs
      .join(coreIds.select(col("id").as("id_a")), Seq("id_a"))
      .join(coreIds.select(col("id").as("id_b")), Seq("id_b"))
    // cores connected to no other core never enter CC — they label
    // themselves via the coalesce; CC output is (id, component=min id).
    // The LOG-ROUND variant is mandatory here, not an option: a cluster
    // is by construction a dense blob at the density threshold, and its
    // ε-graph diameter grows with its spatial extent — at sf0.1 the
    // largest cluster already exceeds min-label propagation's 25-round
    // budget, while large-star/small-star closes it in O(log²) rounds.
    val comps = Graphs.connectedComponentsLogRounds(coreEdges, "id_a", "id_b")
    val coreClusters = coreIds
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))
    val borderAssign = sym
      .join(coreClusters.select(col("id").as("nb"), col("cluster")), Seq("nb"))
      .groupBy("id").agg(min(col("cluster")).as("bcluster"))
    val out = roles
      .join(coreClusters, Seq("id"), "left")
      .join(borderAssign, Seq("id"), "left")
      .select(col("id"),
        when(col("is_core"), lit("core"))
          .when(col("bcluster").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        when(col("is_core"), col("cluster"))
          .otherwise(col("bcluster")).as("cluster"))
      .localCheckpoint(true)
    pairs.unpersist(); roles.unpersist()
    CheckpointBlocks.release(comps)
    out
  }
}
