package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact rank / running-sum spines.
  *
  * The rank-statistics family (Spearman, Mann–Whitney, Kruskal–Wallis,
  * KS, AUC, order-statistic picks) all need "running total in value
  * order" over a spine whose cardinality is DATA-sized when the ranked
  * column is continuous (~unique per row). The naive
  * `Window.orderBy(v)` with no partition key plans a single-partition
  * Exchange — every spine row through ONE task, a straight
  * one-executor bottleneck at 100 TB.
  *
  * [[withCumSums]] is the classic distributed-rank recipe instead:
  *
  *  1. range-partition the spine on the order columns (the sort
  *     spreads over all tasks; RangePartitioner boundaries are sampled
  *     with deterministic seeds),
  *  2. per-partition running sums via a PARTITIONED window keyed on
  *     `spark_partition_id()` (captured as a column value before the
  *     window's hash exchange moves rows, so it survives the move),
  *  3. per-partition totals → prefix offsets via one ordered window
  *     over ≤ `spark.sql.shuffle.partitions` rows (parameter-bounded,
  *     the same budget as an IVF centroid collect — never data-sized),
  *  4. broadcast the offsets back and add.
  *
  * Exactness: sums stay in the input's integer/decimal type and
  * addition is associative, so the result is bit-identical to the
  * single-partition window and every DuckDB oracle is unchanged. Range
  * partitioning puts equal order-tuples in one partition and orders
  * partitions by value, so global order is the concatenation of local
  * orders — the invariant the offset addition relies on.
  *
  * Cost: two spine shuffles (range + the window's hash on _pid)
  * instead of one single-partition funnel — narrow rows, fully
  * parallel, the shape that survives a 100× scale-up.
  *
  * CORRECTNESS PREREQUISITE — the range-partitioned spine is
  * MATERIALIZED (persist MEMORY_AND_DISK) before `_pid` fans out to
  * its two consumers (the per-partition window and the per-partition
  * totals/patch aggregate). Without it each consumer plans its OWN
  * range exchange (column pruning makes the two exchanges non-equal,
  * so ReuseExchange cannot deduplicate them), and each exchange's
  * RangePartitioner samples with a seed derived from its own rdd.id —
  * the two evaluations can and do pick DIFFERENT boundaries, so the
  * `_pid` labels in the window rows and in the offset table describe
  * different row sets and the added offsets are garbage. This is not
  * theoretical: the round-10 sf0.1 sweep caught x_conformal's k-th
  * order statistic landing 9 433 ranks off (and a repeat run landed
  * elsewhere — per-run nondeterminism), while every sf0.01 run had
  * passed. The persist pins one materialization of (row, _pid) that
  * both consumers read; the cached blocks are disk-backed (no
  * eviction loss) and are freed by the context cleaner on GC or by
  * CheckpointBlocks.releaseAll between bench measurements.
  */
object Rank {

  /** Materialize the range-partitioned spine so `_pid` is assigned
    * exactly once — see the object doc's CORRECTNESS PREREQUISITE. */
  private def pinned(ranged: DataFrame): DataFrame =
    ranged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Append exact global running sums to `spine`.
    *
    * @param spine     input frame; one row per rank position (callers
    *                  pre-aggregate to distinct values or carry a
    *                  unique tiebreak column in `orderCols`)
    * @param orderCols global order, compared as a tuple left to right
    *                  (callers must not pass NULLs in these columns —
    *                  pre-filter or coalesce first; range partitioning
    *                  and window sort would both put them first, but
    *                  null ranks are meaningless)
    * @param cums      (sourceCol → outputCol): each output is the
    *                  running sum of its source over the global order
    * @param inclusive true → rows up to AND INCLUDING the current row
    *                  (row_number shape when the source is lit(1));
    *                  false → strictly-preceding rows (cum-before
    *                  shape), 0 for the first row
    */
  def withCumSums(spine: DataFrame, orderCols: Seq[String],
                  cums: Seq[(String, String)],
                  inclusive: Boolean = true): DataFrame = {
    require(cums.nonEmpty, "Rank.withCumSums: need at least one sum")
    val ranged = pinned(spine.repartitionByRange(orderCols.map(col): _*)
      .withColumn("_pid", spark_partition_id()))
    val hi = if (inclusive) 0L else -1L
    val wLocal = Window.partitionBy("_pid")
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, hi)
    val local = cums.foldLeft(ranged) { case (d, (src, out)) =>
      d.withColumn(out, coalesce(sum(col(src)).over(wLocal), lit(0L)))
    }
    // per-partition totals → exclusive prefix offsets; the ordered
    // window here runs over at most the shuffle-partition count of
    // rows — parameter-bounded by construction, never data-sized
    val wOff = BoundedWindow.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val totals = ranged.groupBy("_pid")
      .agg(sum(col(cums.head._1)).as(s"_t_${cums.head._2}"),
        cums.tail.map { case (src, out) => sum(col(src)).as(s"_t_$out") }: _*)
    val offs = totals.select(col("_pid") +: cums.map { case (_, out) =>
      coalesce(sum(col(s"_t_$out")).over(wOff), lit(0L)).as(s"_o_$out")
    }: _*)
    val joined = local.join(broadcast(offs), Seq("_pid"))
    cums.foldLeft(joined) { case (d, (_, out)) =>
      d.withColumn(out, col(out) + col(s"_o_$out"))
    }.drop("_pid" +: cums.map { case (_, out) => s"_o_$out" }: _*)
  }

  /** Append the exact global RUNNING MAX of `srcCol` over `orderCols`
    * as `outCol`, distributed exactly like [[withCumSums]] — max is
    * associative, so per-range-partition running maxima plus a
    * parameter-bounded broadcast of strictly-preceding partition
    * maxima reproduce the single-partition window bit for bit.
    * `inclusive = false` gives the strictly-preceding max (NULL on the
    * global first row) — the late-arrival / high-watermark shape. */
  def withCumMax(spine: DataFrame, orderCols: Seq[String], srcCol: String,
                 outCol: String, inclusive: Boolean = true): DataFrame = {
    val ranged = pinned(spine.repartitionByRange(orderCols.map(col): _*)
      .withColumn("_pid", spark_partition_id()))
    val hi = if (inclusive) 0L else -1L
    val wLocal = Window.partitionBy("_pid")
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, hi)
    val local = ranged.withColumn(outCol, max(col(srcCol)).over(wLocal))
    val wOff = BoundedWindow.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = ranged.groupBy("_pid").agg(max(col(srcCol)).as("_t"))
      .select(col("_pid"), max(col("_t")).over(wOff).as("_prevmax"))
    local.join(broadcast(offs), Seq("_pid"))
      .withColumn(outCol, greatest(
        coalesce(col(outCol), col("_prevmax")),
        coalesce(col("_prevmax"), col(outCol))))
      .drop("_pid", "_prevmax")
  }

  /** Append the NEXT row's `srcCol` (SQL `lead(src, 1)`) over the
    * global `orderCol` order as `outCol`, distributed: a per-range-
    * partition lead patched at partition boundaries with the next
    * partition's first value. `orderCol` must be row-unique (a
    * distinct-value spine); `outCol` is NULL on the global last row.
    *
    * Same scale contract as [[withCumSums]]: the only ordered global
    * window runs over one row per range partition (parameter-bounded),
    * and the patch table is broadcast. Empty range partitions simply
    * don't appear in the patch table, so `lead` over the present
    * partition ids still hands the correct next-first value across
    * them. */
  def withLead1(spine: DataFrame, orderCol: String, srcCol: String,
                outCol: String): DataFrame = {
    val ranged = pinned(spine.repartitionByRange(col(orderCol))
      .withColumn("_pid", spark_partition_id()))
    val wLocal = Window.partitionBy("_pid").orderBy(col(orderCol))
    val local = ranged.withColumn(outCol, lead(col(srcCol), 1).over(wLocal))
    val wNext = BoundedWindow.orderBy("_pid")
    // patch ONLY the last row of each range partition (identified by
    // its max orderCol) — coalescing on NULL output would also clobber
    // a mid-partition row whose next srcCol is legitimately NULL, so
    // the boundary row is matched positionally instead; if the next
    // partition's first srcCol IS null, the patched lead is null too,
    // exactly as SQL lead(src, 1) would produce
    val patch = ranged.groupBy("_pid")
      .agg(min_by(col(srcCol), col(orderCol)).as("_first"),
        max(col(orderCol)).as("_last_ord"))
      .select(col("_pid"), col("_last_ord"),
        lead(col("_first"), 1).over(wNext).as("_next_first"))
    local.join(broadcast(patch), Seq("_pid"))
      .withColumn(outCol,
        when(col(orderCol) === col("_last_ord"), col("_next_first"))
          .otherwise(col(outCol)))
      .drop("_pid", "_next_first", "_last_ord")
  }

  /** [[withCumSums]] and [[withLead1]] FUSED over one spine: running
    * sums AND the next row's `leadSrc` in a single distributed pass.
    *
    * The CDF-over-intervals family (Wasserstein, energy distance) needs
    * both the running counts and the gap to the next distinct value;
    * chaining the two standalone operators pays the range exchange, the
    * spine pin, and the data-sized WindowExec TWICE on the same rows —
    * measured as the whole x_wasserstein persist regression in round 10
    * (1.13 → 2.03 s). Fused, there is ONE range partitioning, ONE
    * pinned materialization, ONE WindowExec (same partition/order spec,
    * two frames — Spark evaluates both in a single exchange+sort), and
    * ONE parameter-bounded `_pid` aggregate carrying the sum totals and
    * the lead boundary patch together.
    *
    * Bit-exactness: the sums and the boundary-patched lead are the
    * identical expressions the standalone operators compute, so results
    * (and every DuckDB oracle) are unchanged. `orderCol` must be
    * row-unique (a distinct-value spine), as for [[withLead1]]. */
  def withCumSumsLead1(spine: DataFrame, orderCol: String,
                       cums: Seq[(String, String)],
                       leadSrc: String, leadOut: String,
                       inclusive: Boolean = true): DataFrame = {
    require(cums.nonEmpty, "Rank.withCumSumsLead1: need at least one sum")
    // leadSrc must be an INPUT column of the spine: the lead and its
    // min_by boundary patch read the pre-offset, partition-local values,
    // so naming a cums output here would silently lead the UNFINALIZED
    // running sum (missing the cross-partition offset), not the value
    // the chained withCumSums→withLead1 composition would produce.
    require(!cums.exists(_._2 == leadSrc),
      s"Rank.withCumSumsLead1: leadSrc '$leadSrc' collides with a cums " +
        "output column; lead a spine input column instead")
    val ranged = pinned(spine.repartitionByRange(col(orderCol))
      .withColumn("_pid", spark_partition_id()))
    val hi = if (inclusive) 0L else -1L
    val wLocal = Window.partitionBy("_pid").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, hi)
    val wLead = Window.partitionBy("_pid").orderBy(col(orderCol))
    val local = cums.foldLeft(ranged) { case (d, (src, out)) =>
      d.withColumn(out, coalesce(sum(col(src)).over(wLocal), lit(0L)))
    }.withColumn(leadOut, lead(col(leadSrc), 1).over(wLead))
    // ONE per-partition aggregate: sum totals for the offsets AND the
    // (first value, last order key) pair for the lead boundary patch
    val totals = ranged.groupBy("_pid").agg(
      sum(col(cums.head._1)).as(s"_t_${cums.head._2}"),
      (cums.tail.map { case (src, out) => sum(col(src)).as(s"_t_$out") } ++
        Seq(min_by(col(leadSrc), col(orderCol)).as("_first"),
          max(col(orderCol)).as("_last_ord"))): _*)
    val wOff = BoundedWindow.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = BoundedWindow.orderBy("_pid")
    val offs = totals.select(
      col("_pid") +: col("_last_ord") +:
        lead(col("_first"), 1).over(wNext).as("_next_first") +:
        cums.map { case (_, out) =>
          coalesce(sum(col(s"_t_$out")).over(wOff), lit(0L)).as(s"_o_$out")
        }: _*)
    val joined = local.join(broadcast(offs), Seq("_pid"))
      // patch ONLY the last row of each range partition (see withLead1)
      .withColumn(leadOut,
        when(col(orderCol) === col("_last_ord"), col("_next_first"))
          .otherwise(col(leadOut)))
    cums.foldLeft(joined) { case (d, (_, out)) =>
      d.withColumn(out, col(out) + col(s"_o_$out"))
    }.drop("_pid" :: "_next_first" :: "_last_ord" ::
      cums.map { case (_, out) => s"_o_$out" }.toList: _*)
  }

  /** Global row_number over `orderCols` (which must be row-unique —
    * include a tiebreak column) as a LONG column `outCol`, distributed
    * per [[withCumSums]]. */
  def withRowNumber(df: DataFrame, orderCols: Seq[String],
                    outCol: String): DataFrame =
    withCumSums(df.withColumn("_one", lit(1L)), orderCols,
      Seq("_one" -> outCol), inclusive = true).drop("_one")

  /** SQL ntile(k) reconstructed from a global row_number `rn` (1-based
    * LONG) and the total row count `n` — bit-identical to the window
    * function's bucketing (sizes differ by at most one; the first
    * n mod k buckets take the extra row), but computable from a
    * DISTRIBUTED rank instead of a single-partition ntile window.
    * Integer arithmetic only. */
  def ntileCol(rn: Column, n: Column, k: Int): Column = {
    // exact integral division (SQL `div` / IntegralDivide): Column./
    // is double division and would round on data-sized counts
    def idiv(a: Column, b: Column) = call_function("div", a, b)
    val q = idiv(n, lit(k.toLong))   // base bucket size
    val r = n % k                    // buckets that take one extra row
    val cut = r * (q + 1)            // rows covered by the bigger buckets
    when(q === 0L, rn)               // n < k: one row per bucket
      .when(rn <= cut, idiv(rn - 1, q + 1) + 1)
      .otherwise(r + idiv(rn - cut - 1, q) + 1)
      .cast("int")
  }
}
