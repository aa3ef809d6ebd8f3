package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted sampling (SURVEY.md §2.10): systematic probability-
  * proportional-to-size selection — the deterministic, single-pass
  * weighted sampler. Rows are laid on a [0, W) number line as weight-
  * sized segments in a fixed order; k evenly-spaced boundaries pick the
  * rows they land in, so selection probability ∝ weight and heavy rows
  * are near-certain picks. (The classic alternative, Efraimidis-Spirakis
  * u^(1/w) keys, needs pow/ln — transcendentals whose last-ulp behavior
  * differs across engines; systematic PPS is INTEGER arithmetic end to
  * end, so the oracle is exact.)
  *
  * Scale shape: two window passes over one shuffle on the group key
  * (cumulative weight + group total), then a narrow filter. No
  * collect, no per-group loops; k is a constant.
  */
object Sampling {

  /** k-per-group systematic PPS sample. `weightCents` must be a
    * non-negative integral Column (e.g. money as cents); `orderCol`
    * fixes the traversal order (determinism). A row is selected iff a
    * boundary j·W/k (j = 1..k) falls inside its segment — evaluated as
    * an integer-division crossing, no floats anywhere. Rows heavier
    * than W/k span multiple boundaries but emit once, so a group can
    * return slightly fewer than k rows (documented PPS behavior). */
  def systematicPps(df: DataFrame, groupCol: String, orderCol: String,
                    weightCents: Column, k: Int): DataFrame = {
    val byGroup = Window.partitionBy(groupCol)
    val cum = Window.partitionBy(groupCol).orderBy(orderCol)
    df.withColumn("_w", weightCents)
      .withColumn("_cum", sum(col("_w")).over(cum))
      .withColumn("_total", sum(col("_w")).over(byGroup))
      // the division sits inside when(): an all-zero-weight group has
      // _total = 0 and must yield NO picks, not an ANSI DIVIDE_BY_ZERO
      // that kills every other group's sample
      .filter(when(col("_total") > 0,
        expr(s"((_cum - _w) * $k) div _total") <
          expr(s"(_cum * $k) div _total")).otherwise(false))
      .drop("_w", "_cum", "_total")
  }

  /** Deterministic train/val/test assignment by content-free id hash —
    * the split must be a PURE function of the id (stable across reruns,
    * partitionings, and engines; never rand()), and md5 is the portable
    * family the engine standardizes on. `bucket` = the id's first 4 md5
    * hex chars mod 100; cuts at `trainPct` and `trainPct+valPct`.
    *
    * Scale shape: a narrow projection — no shuffle, no state. This is
    * the operator that makes "which split was this example in?" a
    * reproducible question three years later. */
  def hashSplit(df: DataFrame, idCol: String,
                trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"hashSplit: bad cuts ($trainPct, $valPct)")
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("long") % 100
    df.withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Deterministic "reservoir": a uniform k-per-group sample as the k
    * rows with the smallest md5(id) per group — the distributed stand-in
    * for sequential reservoir sampling (which is order-dependent and
    * unreproducible under repartitioning). Hash order is uniform over
    * ids, pure (same sample on every rerun and engine), and mergeable:
    * the k smallest of a union = k smallest of each part's k smallest,
    * which is exactly what Spark's WindowGroupLimit pushdown executes —
    * each map task keeps its local top-k BEFORE the shuffle, so the
    * exchange carries ≤ k·parts rows, not the table.
    *
    * Returns the sampled rows with their `rk` (1..k) selection rank. */
  def hashReservoir(df: DataFrame, groupCol: String, idCol: String,
                    k: Int): DataFrame = {
    require(k > 0, s"hashReservoir: k must be positive, got $k")
    val w = Window.partitionBy(groupCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Class-balanced downsampling: every class keeps exactly
    * min-class-count rows, chosen by the [[hashReservoir]] hash order —
    * the standard rebalancing step before training on a skewed label
    * (a 40%-English corpus becomes uniform over languages without any
    * RNG, and the same rows are kept on every engine and rerun).
    *
    * The min class count is ONE scalar from a |classes|-row aggregate —
    * a parameter-bounded driver action (the 1-row argmax discipline,
    * cf. [[graft.operators.Prune]]), taken deliberately so the rank
    * filter is a LITERAL: Spark then plans the per-class window as a
    * WindowGroupLimit — every map task keeps its local k smallest
    * hashes BEFORE the shuffle, so the exchange carries ≤ k·parts rows
    * instead of the corpus, and the per-class partitions downstream of
    * the limit are k-bounded, never data-sized. A column-valued bound
    * would lose that pushdown and funnel whole classes through single
    * tasks. */
  def classBalance(df: DataFrame, classCol: String, idCol: String): DataFrame = {
    val row = df.groupBy(classCol).agg(count(lit(1)).as("n"))
      .agg(min(col("n"))).head
    if (row.isNullAt(0)) df.withColumn("rk", lit(1)).limit(0) // empty input
    else hashReservoir(df, classCol, idCol, row.getLong(0).toInt)
  }

  /** Curriculum ordering (Bengio et al. 2009 applied to corpus
    * assembly): a deterministic global training sequence that presents
    * easy buckets first — rows order by (difficulty bucket, md5(id),
    * id) and receive a GLOBAL 1-based sequence number through the
    * distributed rank ([[Rank.withRowNumber]]: range-partitioned
    * spine + broadcast prefix offsets — never a single-partition
    * window). The md5 shuffles within a bucket so the curriculum is
    * stable across reruns but not input-ordered. */
  def curriculumOrder(df: DataFrame, idCol: String,
                      difficultyCol: Column): DataFrame =
    Rank.withRowNumber(
      df.select(col(idCol).as("id"), difficultyCol.as("bucket"),
        md5(col(idCol).cast("string")).as("h")),
      Seq("bucket", "h", "id"), "seq")
      .select(col("id").as(idCol), col("bucket"), col("h"), col("seq"))
}
