package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text
import graft.operators.{Dedup, Graphs, Prune, Sampling, Skyline}

/** Round-6 extension wave: scan-side join pruning, deterministic
  * sampling, market-basket association mining, and seasonal anomaly
  * baselines — operators a warehouse-plus-training-pipeline engine needs
  * that the earlier waves didn't cover.
  *
  * Oracle policy follows [[Ext]]: exact DuckDB SQL wherever the math is
  * portable (integer/decimal accumulation, md5 ordering, straight-line
  * double ops), rows-only + ScalaTest bounds where internals are
  * engine-specific (sketch bytes).
  */
object Ext2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** DuckDB rendering of [[Text.normText]] (same string as [[Ext]]'s). */
  private val dNorm6 =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Bloom-pruned semi-join: sketch the filtered supplier key set, scan-
    // filter lineitem with the codegen'd membership probe (false
    // positives only — never drops a match), then the exact residual
    // semi-join. Result ≡ plain semi-join; the plan difference is that
    // the fact scan discards ~half its rows BEFORE any exchange. At
    // 100 TB the sketch is MBs while the key set is too large to inline
    // into a scan predicate.
    "x_bloom_join" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val sup = t(s, d, "supplier").where(col("s_acctbal") > 5000)
      Prune.bloomSemiJoin(li, "l_suppkey", sup, "s_suppkey", fpp = 0.01)
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("revenue"))
    }),

    // Deterministic uniform k-per-source document sample (the
    // "reservoir" every corpus QA loop needs — inspect 5 random-but-
    // reproducible docs per source). Hash-order selection, pre-shuffle
    // top-k via WindowGroupLimit.
    "x_reservoir" -> ((s, d) =>
      Sampling.hashReservoir(t(s, d, "documents"), "source", "doc_id", k = 5)
        .select("source", "doc_id", "rk")),

    // Association rules over order baskets: distinct (order, part) items,
    // same-order pair derivation (fanout ≤ C(13,2) per order — bounded by
    // basket size, the skew guard), then support / confidence / lift per
    // directed rule x→y with min pair support 3. The basket count joins
    // in as a 1-row broadcast frame, not a driver action.
    "x_assoc_rules" -> ((s, d) => {
      val items = t(s, d, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val pairs = items.as("a").join(items.as("b"), Seq("o"))
        .where(col("a.p") < col("b.p"))
        .select(col("a.p").as("x"), col("b.p").as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
        .where(col("n_xy") >= 3)
      val directed = pairs.union(
        pairs.select(col("y").as("x"), col("x").as("y"), col("n_xy")))
      val itemSup = items.groupBy("p").agg(count(lit(1)).as("n_p"))
      val baskets = items.select("o").distinct()
        .agg(count(lit(1)).as("n_baskets"))
      directed
        .join(itemSup.select(col("p").as("x"), col("n_p").as("n_x")), Seq("x"))
        .join(itemSup.select(col("p").as("y"), col("n_p").as("n_y")), Seq("y"))
        .crossJoin(broadcast(baskets))
        .select(col("x"), col("y"), col("n_xy"),
          (col("n_xy").cast("double") / col("n_x").cast("double"))
            .as("confidence"),
          (col("n_xy").cast("double") * col("n_baskets").cast("double") /
            (col("n_x").cast("double") * col("n_y").cast("double")))
            .as("lift"))
    }),

    // Seasonal anomaly baseline: hour-of-day × event-type profile
    // (decimal-exact sums → straight-line double mean/std), events
    // flagged at |z| > 3 against their own season. Two hash aggregates +
    // one broadcast-sized join back onto the stream — the shape that
    // stays two-pass at any scale.
    "x_seasonal_baseline" -> ((s, d) => {
      val dec = col("value").cast("decimal(18,2)")
      def dbl(c: org.apache.spark.sql.Column) = c.cast("string").cast("double")
      val ev = t(s, d, "events")
        .withColumn("hod", hour(col("ts")))
      val prof = ev.groupBy("event_type", "hod")
        .agg(count(lit(1)).as("n"), sum(dec).as("sx"), sum(dec * dec).as("sxx"))
        .select(col("event_type"), col("hod"), col("n"),
          (dbl(col("sx")) / dbl(col("n"))).as("mu"),
          sqrt((dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx")) / dbl(col("n"))) /
            (dbl(col("n")) - lit(1.0))).as("sigma"))
      ev.join(broadcast(prof), Seq("event_type", "hod"))
        .where(col("sigma") > 0 &&
          abs((col("value") - col("mu")) / col("sigma")) > lit(3.0))
        .select(col("event_id"), col("event_type"), col("hod"), col("value"),
          col("mu"), col("sigma"),
          ((col("value") - col("mu")) / col("sigma")).as("z"))
    }),

    // Hierarchy walk through Spark's OWN SQL front end (WITH RECURSIVE,
    // new in Spark 4): depth of every node in the heap-numbered binary
    // tree derived from part keys (parent p → children 2p, 2p+1). The
    // oracle runs the IDENTICAL text in DuckDB — the one operator class
    // where both engines execute true recursion.
    "x_recursive_cte" -> ((s, d) => {
      t(s, d, "part").createOrReplaceTempView("gq6_part")
      s.sql(recursiveWalkSql("gq6_part"))
    }),

    // The same reachability computed by the GENERIC iterative BFS
    // operator (frontier expansion, per-round checkpoints) — the form
    // that scales past SQL recursion limits; graded against the DuckDB
    // recursive CTE.
    "x_shortest_path" -> ((s, d) => {
      val part = t(s, d, "part")
        .select(col("p_partkey").cast("long").as("p"))
      val m = part.agg(max(col("p")).as("m"))
      val base = part.crossJoin(broadcast(m)).where(col("p") >= 1)
      val edges = base.where(col("p") * 2 <= col("m"))
        .select(col("p").as("src"), (col("p") * 2).as("dst"))
        .union(base.where(col("p") * 2 + 1 <= col("m"))
          .select(col("p").as("src"), (col("p") * 2 + 1).as("dst")))
      val sources = part.where(col("p") === 1).select(col("p").as("id"))
      Graphs.shortestPaths(edges, "src", "dst", sources, "id",
        maxHops = 16, directed = true)
        .select(col("id").as("node"), col("dist"))
    }),

    // Sorted-neighborhood near-dup pass: the lexicographic blocking
    // family (complement to the inverted-index / LSH passes) — one sort
    // shuffle, window-local comparisons only.
    "x_sorted_neighborhood" -> ((s, d) =>
      Dedup.sortedNeighborhood(t(s, d, "documents"), "doc_id", "text",
        window = 4, threshold = 0.5)),

    // Unicode ingest normalization through the custom codegen
    // expressions: decompose vowels with combining marks (the dirty-
    // ingest shape), NFC-recompose, accent-fold. The corpus is ASCII, so
    // the accented forms are derived in-query — identically in the
    // oracle — to exercise the real normalization path.
    "x_unicode_norm" -> ((s, d) => {
      val dirty = regexp_replace(
        regexp_replace(col("c_name"), "e", "e\u0301"),
        "o", "o\u0302")
      t(s, d, "customer").select(col("c_custkey"),
        Text.nfcUnicode(dirty).as("composed"),
        Text.stripAccents(Text.nfcUnicode(dirty)).as("stripped"))
    }),

    // Pareto frontier (max price, min size): two-phase local/global
    // skyline — each partition reduces to its own frontier before one
    // task folds the survivors.
    "x_skyline" -> ((s, d) =>
      Skyline.skyline2D(t(s, d, "part"), "p_retailprice", "p_size")),

    // Mergeable distinct-count sketches (Apache DataSketches HLL via
    // Spark's hll_* functions): per-source sketches roll up to the
    // global estimate by sketch UNION — the one-pass architecture that
    // answers "distinct per partition AND overall" without rescanning.
    // Approximate by design → rows-only; ExtensionsSpec bounds the error
    // and asserts union-merge consistency.
    "x_hll_rollup" -> ((s, d) => {
      val sk = t(s, d, "documents").groupBy("source")
        .agg(hll_sketch_agg(col("text")).as("sk"))
      sk.select(col("source"), hll_sketch_estimate(col("sk")).as("n_approx"))
        .unionByName(sk.agg(hll_union_agg(col("sk")).as("g"))
          .select(lit("__all__").as("source"),
            hll_sketch_estimate(col("g")).as("n_approx")))
    }))

  /** The recursive tree walk, shared verbatim between Spark (over the
    * `gq6_part` view) and DuckDB (over `part`). */
  private def recursiveWalkSql(partTable: String): String =
    s"""WITH RECURSIVE walk (node, depth) AS (
          SELECT CAST(1 AS BIGINT) AS node, 0 AS depth
          UNION ALL
          SELECT e.child, w.depth + 1
          FROM walk w
          JOIN (SELECT parent, child FROM (
                  SELECT CAST(p_partkey AS BIGINT) AS parent,
                         CAST(p_partkey AS BIGINT) * 2 AS child
                  FROM $partTable WHERE p_partkey >= 1
                  UNION ALL
                  SELECT CAST(p_partkey AS BIGINT),
                         CAST(p_partkey AS BIGINT) * 2 + 1
                  FROM $partTable WHERE p_partkey >= 1) c
                WHERE child <= (SELECT MAX(CAST(p_partkey AS BIGINT))
                                FROM $partTable)) e
            ON e.parent = w.node)
        SELECT node, depth FROM walk"""

  val oracle: Map[String, String] = Map(

    "x_bloom_join" ->
      """SELECT l_suppkey, count(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 5000)
         GROUP BY l_suppkey""",

    "x_reservoir" ->
      """SELECT source, doc_id, rk FROM (
           SELECT source, doc_id,
                  row_number() OVER (PARTITION BY source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
           FROM documents)
         WHERE rk <= 5""",

    "x_assoc_rules" ->
      """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                        FROM lineitem),
         pairs AS (SELECT a.p AS x, b.p AS y, count(*) AS n_xy
                   FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
                   GROUP BY 1, 2 HAVING count(*) >= 3),
         directed AS (SELECT x, y, n_xy FROM pairs
                      UNION ALL SELECT y, x, n_xy FROM pairs),
         sup AS (SELECT p, count(*) AS n_p FROM items GROUP BY 1),
         nb AS (SELECT count(DISTINCT o) AS n_baskets FROM items)
         SELECT d.x, d.y, d.n_xy,
                d.n_xy::DOUBLE / sx.n_p::DOUBLE AS confidence,
                d.n_xy::DOUBLE * nb.n_baskets::DOUBLE /
                  (sx.n_p::DOUBLE * sy.n_p::DOUBLE) AS lift
         FROM directed d
         JOIN sup sx ON sx.p = d.x
         JOIN sup sy ON sy.p = d.y
         CROSS JOIN nb""",

    "x_seasonal_baseline" ->
      """WITH ev AS (SELECT *, hour(ts) AS hod FROM events),
         m AS (SELECT event_type, hod, count(*) AS n,
                      sum(CAST(value AS DECIMAL(18,2))) AS sx,
                      sum(CAST(value AS DECIMAL(18,2)) *
                          CAST(value AS DECIMAL(18,2))) AS sxx
               FROM ev GROUP BY 1, 2),
         prof AS (SELECT event_type, hod, n,
                  CAST(CAST(sx AS VARCHAR) AS DOUBLE) /
                    CAST(CAST(n AS VARCHAR) AS DOUBLE) AS mu,
                  sqrt((CAST(CAST(sxx AS VARCHAR) AS DOUBLE) -
                        CAST(CAST(sx AS VARCHAR) AS DOUBLE) *
                        CAST(CAST(sx AS VARCHAR) AS DOUBLE) /
                        CAST(CAST(n AS VARCHAR) AS DOUBLE)) /
                       (CAST(CAST(n AS VARCHAR) AS DOUBLE) - 1.0)) AS sigma
                  FROM m)
         SELECT ev.event_id, ev.event_type, ev.hod, ev.value, prof.mu,
                prof.sigma, (ev.value - prof.mu) / prof.sigma AS z
         FROM ev JOIN prof USING (event_type, hod)
         WHERE prof.sigma > 0
           AND abs((ev.value - prof.mu) / prof.sigma) > 3.0""",

    "x_sorted_neighborhood" ->
      s"""WITH b AS (SELECT doc_id AS id, $dNorm6 AS k,
                     list_distinct(string_split($dNorm6, ' ')) AS ws
              FROM documents),
         l AS (SELECT id, ws,
                 lead(struct_pack(id := id, ws := ws), 1) OVER w AS n1,
                 lead(struct_pack(id := id, ws := ws), 2) OVER w AS n2,
                 lead(struct_pack(id := id, ws := ws), 3) OVER w AS n3
               FROM b WINDOW w AS (PARTITION BY substr(k, 1, 1)
                                   ORDER BY k, id)),
         p AS (SELECT id, ws, unnest([n1, n2, n3]) AS nb FROM l),
         j AS (SELECT id, nb.id AS nid,
                      len(list_intersect(ws, nb.ws)) AS i,
                      len(ws) + len(nb.ws) AS s
               FROM p WHERE nb.id IS NOT NULL)
         SELECT least(id, nid) AS doc_a, greatest(id, nid) AS doc_b,
                i::DOUBLE / (s - i)::DOUBLE AS jaccard
         FROM j WHERE s - i > 0 AND i::DOUBLE / (s - i)::DOUBLE >= 0.5""",

    "x_unicode_norm" ->
      """SELECT c_custkey,
           nfc_normalize(replace(replace(c_name, 'e', 'e' || chr(769)),
                                 'o', 'o' || chr(770))) AS composed,
           strip_accents(
             nfc_normalize(replace(replace(c_name, 'e', 'e' || chr(769)),
                                   'o', 'o' || chr(770)))) AS stripped
         FROM customer""",

    "x_skyline" ->
      """SELECT CAST(p_retailprice AS DOUBLE) AS x,
                CAST(p_size AS DOUBLE) AS y
         FROM part p1
         WHERE NOT EXISTS (
           SELECT 1 FROM part p2
           WHERE p2.p_retailprice >= p1.p_retailprice
             AND p2.p_size <= p1.p_size
             AND (p2.p_retailprice > p1.p_retailprice
                  OR p2.p_size < p1.p_size))""",

    "x_recursive_cte" -> recursiveWalkSql("part"),

    // the BFS result over the heap tree IS the recursive walk's depth
    // table (cast to match the operator's output types)
    "x_shortest_path" ->
      s"""SELECT node, CAST(depth AS INT) AS dist
          FROM (${recursiveWalkSql("part")})""")
}
