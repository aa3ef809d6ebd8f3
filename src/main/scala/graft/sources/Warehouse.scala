package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse-layout sinks for the 100 TB design point (SURVEY.md §4):
  * hive-style partitioned parquet (partition pruning at the scan) and
  * bucketed tables (co-located joins/aggregations with NO shuffle on the
  * bucket key). The reference writes flat single-object parquet
  * (load_bronze.py:55-62) — at cluster scale, layout IS the optimization.
  */
object Warehouse {

  /** Partitioned parquet: directory per partition value; scans with a
    * partition predicate read only matching directories. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Bucketed + sorted table: rows hash-bucketed by the (join/agg) key.
    * Two tables bucketed the same way join with zero Exchange — the
    * shuffle happens once at WRITE time, then every downstream join/agg
    * on that key is narrow. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Morton (Z-order) value of two non-negative integer keys: bit j of x
    * lands at bit 2j, bit j of y at 2j+1, so sorting by the z-value keeps
    * rows close in BOTH dimensions close in the file order — the standard
    * multi-dimensional clustering trick (a single-column sort clusters
    * one dimension perfectly and scatters the other; Z-order gives every
    * dimension locality, so min/max file stats prune on either
    * predicate). Pure shift/mask arithmetic — portable to any engine,
    * exact-oracle-able. `bits` per dimension (≤ 31). */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { j =>
      shiftleft(shiftright(x.cast("long"), j).bitwiseAND(lit(1L)), 2 * j)
        .bitwiseOR(
          shiftleft(shiftright(y.cast("long"), j).bitwiseAND(lit(1L)), 2 * j + 1))
    }.reduce(_.bitwiseOR(_))

  /** Z-ordered parquet: range-partition AND sort the data by the Morton
    * value of two query dimensions, so every file covers a small square-
    * ish region of (x, y) space and carries tight min/max footer stats on
    * BOTH columns — a point/box query on either dimension prunes most
    * files at planning time. This is layout-as-operator, like bucketing:
    * one shuffle at write time buys every later scan its pruning. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    bits: Int, numFiles: Int): Unit =
    df.withColumn("_z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Bucket-level table digest — the Merkle-style sync primitive for
    * replica reconciliation at warehouse scale: hash every row, assign
    * it to one of `nBuckets` key-derived buckets, and reduce each bucket
    * to a single md5 over its key-sorted row hashes. Two replicas
    * compare nBuckets digest rows instead of the full table; only
    * buckets whose digests differ need row-level diffing
    * ([[graft.operators.Evolve.snapshotDiff]] on that key range). All
    * hashing is md5 over explicit string renderings with a '|' field
    * separator and a NULL sentinel, so the digest is engine-portable
    * (the winnowing recipe) — an independent system can compute the same
    * digests to audit a migration.
    *
    * One narrow hash pass + one bucket-keyed aggregate. Round 10
    * replaced the bucket reduction (was: md5 over the bucket's
    * key-sorted hash concat): that form concentrated |table|/nBuckets
    * row hashes as ONE string on ONE row — the pageRank collect_list
    * ceiling. The digest is now the ADDITIVE MULTISET HASH: the sum of
    * the bucket's 52-bit md5 row-hash prefixes in decimal(38,0), mod
    * 2⁶¹−1 — associative, so map-side partial aggregation and AQE
    * skew-split hold and per-row aggregate state is one number; any
    * changed/added/dropped row shifts the sum except with ~2⁻⁵²
    * collision chance, and order-invariance holds by construction
    * instead of by a sort. */
  def tableDigest(df: DataFrame, keyCol: String, nBuckets: Int): DataFrame = {
    val rendered = df.columns.map(c =>
      coalesce(col(c).cast("string"), lit("\u0000NULL"))).toSeq
    val hashed = df.select(col(keyCol).cast("string").as("k"),
      md5(concat_ws("|", rendered: _*)).as("rh"))
      .withColumn("bucket",
        (conv(substring(md5(col("k")), 1, 4), 16, 10).cast("long")
          % nBuckets).cast("int"))
    hashed.groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(conv(substring(col("rh"), 1, 13), 16, 10).cast("long")
            .cast("decimal(38,0)")),
          lit("2305843009213693951").cast("decimal(38,0)"))
          .cast("long").as("digest"))
  }

  /** Small-file compaction — the warehouse maintenance pass every
    * streaming/incremental sink eventually needs: a table accreted in
    * many tiny files (one per micro-batch/task) pays per-file open and
    * footer costs on every scan and floods the driver with splits.
    * Rewrites the table into ⌈bytes / targetFileBytes⌉ files via a
    * round-robin repartition (no key: compaction must not skew — every
    * output file gets an even share). Returns (filesBefore, filesAfter,
    * bytes). Data content is preserved exactly; only layout changes.
    * The write lands in `outPath` (swap-in is the caller's atomic
    * rename/metastore step — compacting in place would race readers). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long): (Int, Int, Long) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    def dataFiles(p: String) =
      fs.globStatus(new org.apache.hadoop.fs.Path(p + "/*.parquet")).toSeq
    val before = dataFiles(inPath)
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inPath).repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    (before.size, dataFiles(outPath).size, bytes)
  }

  /** ANALYZE-style table statistics: per column min / max / exact NDV /
    * null count, ALL columns in ONE scan (a single wide aggregate — the
    * planner-feeding profile a warehouse maintains per table). Numeric
    * min/max surface as double (selection, not arithmetic — exact),
    * timestamps as formatted UTC strings (the engine's portable date
    * form), strings as-is. One shuffle-free partial/final aggregate;
    * at 100 TB this is the same single pass ANALYZE TABLE costs —
    * PROVIDED `exactNdv = false`. Exact multi-column countDistinct makes
    * Catalyst EXPAND the input once per distinct aggregate (an 11-column
    * profile benched 25 s at sf0.1 vs sub-second approx): the 100 TB
    * default is the HLL sketch (approx_count_distinct, one pass, no
    * expand); `exactNdv = true` is the differential-oracle form, for
    * tables where the expansion is affordable. */
  def analyzeStats(df: DataFrame, exactNdv: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{DateType, StringType, TimestampNTZType, TimestampType}
    val aggs = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      val (mn, mx) = f.dataType match {
        case TimestampType | TimestampNTZType | DateType =>
          (date_format(min(c), "yyyy-MM-dd HH:mm:ss"),
            date_format(max(c), "yyyy-MM-dd HH:mm:ss"))
        case StringType => (min(c), max(c))
        case _ => (min(c).cast("double"), max(c).cast("double"))
      }
      val ndv = if (exactNdv) countDistinct(c) else approx_count_distinct(c)
      Seq(mn.as(s"${f.name}_min"), mx.as(s"${f.name}_max"),
        ndv.as(s"${f.name}_ndv"),
        (count(lit(1)) - count(c)).as(s"${f.name}_nulls"))
    }.toSeq
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Referential-integrity audit of a foreign key — the pre-join
    * health check a warehouse runs before trusting a star join:
    * orphan child rows (FK value absent from the parent), unreferenced
    * parent rows, null FKs, and the fanout factor. Both sides collapse
    * to per-key counts FIRST (one shuffle each), then a single
    * full-outer key join aggregates to one row — the join carries
    * key-level rows, never the tables. Rates are single divisions of
    * exact counts. */
  def fkAudit(child: DataFrame, childKey: String, parent: DataFrame,
              parentKey: String): DataFrame = {
    val ck = child.groupBy(col(childKey).as("k"))
      .agg(count(lit(1)).as("nc"))
    val pk = parent.groupBy(col(parentKey).as("k"))
      .agg(count(lit(1)).as("np"))
    // a NULL FK key never joins, so the null-key child row survives the
    // full outer unmatched and is split out as n_null_fk (no extra pass)
    ck.join(pk, Seq("k"), "full_outer")
      .agg(
        sum(coalesce(col("nc"), lit(0L))).as("n_child"),
        sum(coalesce(col("np"), lit(0L))).as("n_parent"),
        sum(when(col("np").isNull && col("k").isNotNull, col("nc"))
          .otherwise(0L)).as("n_orphan_child"),
        sum(when(col("nc").isNull, col("np")).otherwise(0L))
          .as("n_unreferenced_parent"),
        count(when(col("nc").isNotNull && col("np").isNotNull, 1))
          .as("n_matched_keys"),
        sum(when(col("k").isNull, col("nc")).otherwise(0L))
          .as("n_null_fk"))
      .select(col("n_child"), col("n_parent"), col("n_orphan_child"),
        col("n_unreferenced_parent"), col("n_matched_keys"),
        col("n_null_fk"),
        (col("n_orphan_child").cast("double") /
          col("n_child").cast("double")).as("orphan_rate"),
        ((col("n_child") - col("n_orphan_child")).cast("double") /
          col("n_parent").cast("double")).as("fanout"))
  }
}
