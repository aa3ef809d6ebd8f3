package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.Schemas
import graft.pipelines.{Gold, Silver}

/** Sources, sinks, and the medallion runner (SURVEY.md §2.1 S1-S5, §3).
  *
  * The reference hand-rolls S3 I/O with boto3 + in-memory Arrow buffers
  * (load_bronze.py:45-71); on Spark the same surface is just the DataFrame
  * reader/writer — pass an `s3a://bucket/key` path and the hadoop-aws
  * committer replaces all of it (S5: credentials via
  * `spark.hadoop.fs.s3a.*` session config, no engine code needed).
  * Paths here are opaque: local FS in tests, `s3a://` in production.
  *
  * S5 testability (investigated, infeasible offline): an in-container
  * s3a round-trip would need BOTH a mock S3 endpoint (none installed)
  * AND the `hadoop-aws` + `aws-sdk-bundle` jars — and /opt/spark/jars
  * ships neither, with no artifact egress to fetch them. The s3a mapping
  * therefore stays config-documented (set `fs.s3a.endpoint`,
  * `fs.s3a.access.key`, `fs.s3a.secret.key`, `fs.s3a.path.style.access`
  * for any S3-compatible store) and every I/O path below is exercised on
  * file:// URIs, which drive the identical Hadoop FileSystem code path
  * above the scheme.
  */
object Io {

  /** S1: CSV scan with a declared schema — the engine never relies on
    * inference (SURVEY §1.2). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").option("multiLine", "true")
      .schema(schema).csv(path)

  /** S1 hardened: CSV scan with ROW-level dirty-data handling — the
    * reference isolates failures per FILE (try/except-continue,
    * load_bronze.py:98-101); at warehouse scale the unit of damage is
    * the row. PERMISSIVE (default) quarantines each unparseable row's
    * raw text into `corruptCol` (nulls elsewhere) so bad rows are
    * queryable instead of fatal; `drop = true` silently discards them
    * (DROPMALFORMED) for pipelines that prefer loss to quarantine.
    * DROPMALFORMED caveat: malformed-ness is decided by the columns a
    * query actually reads — a zero-column plan (count(*)) never parses,
    * so it counts RAW lines; audit row counts with a full projection. */
  def readCsvRobust(spark: SparkSession, path: String, schema: StructType,
                    corruptCol: String = "_corrupt_record",
                    drop: Boolean = false): DataFrame = {
    val base = spark.read.option("header", "true")
    if (drop)
      base.option("mode", "DROPMALFORMED").schema(schema).csv(path)
    else
      base.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corruptCol)
        .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
        .csv(path)
  }

  /** S2: CSV sink (header row, like to_csv(index=False)). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** S4: parquet scan. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S3: parquet sink (overwrite, matching put_object semantics). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Evolved-schema scan: union the schemas of every file footer under
    * `path` (columns added by later writers surface as nulls in older
    * files) — the read side of additive schema evolution, which a
    * long-lived warehouse needs when producers gain columns between
    * backfills. Spark's default read takes ONE file's schema and
    * silently drops the others' extras; mergeSchema pays one extra
    * footer pass to see the union. */
  def readParquetEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** JSONL scan (one JSON object per line — the LLM-corpus interchange
    * format). Schema is DECLARED like every other source here: inference
    * would scan the data twice and silently widen types between runs. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSONL sink. Spark's json writer emits one object per line; nulls are
    * omitted per JSON convention (round-trip restores them as nulls via
    * the declared schema). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Raw text scan: one row per line in a `value` column — the entry
    * point for unstructured corpora before any parsing. */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** ORC scan/sink — the other columnar warehouse format (Hive
    * ecosystems); built into Spark, same pushdown/pruning machinery as
    * parquet. Exercised by an exact round-trip in PipelineSpec. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** XML scan/sink — built into Spark 4's sql module (the spark-xml
    * merge); `rowTag` names the per-record element. The declared schema
    * keeps types stable (XML carries none) and restores omitted
    * elements as nulls, mirroring the JSONL convention. Exercised by an
    * exact round-trip in PipelineSpec. */
  def readXml(spark: SparkSession, path: String, schema: StructType,
              rowTag: String = "row"): DataFrame =
    spark.read.option("rowTag", rowTag).schema(schema).xml(path)

  def writeXml(df: DataFrame, path: String, rowTag: String = "row"): Unit =
    df.write.mode(SaveMode.Overwrite).option("rowTag", rowTag).xml(path)

  private val tables = Seq("clients", "crm_clients", "vehicles", "policies",
    "claims", "payments")

  /** Per-table error isolation policy for the medallion runner.
    *
    * The reference CONTINUES past a failing table (load_bronze.py:98-101,
    * logging and moving on); a production runner wants that as a POLICY,
    * not a hardcoded choice — silent table drops corrupt downstream joins,
    * but one poisoned table shouldn't always sink a 50-table load either.
    *  - [[ErrorPolicy.FailFast]] (default): first failure propagates.
    *  - [[ErrorPolicy.Continue]]: remaining tables still load; failures
    *    are RETURNED (never swallowed) for the caller to alert on. */
  sealed trait ErrorPolicy
  object ErrorPolicy {
    case object FailFast extends ErrorPolicy
    case object Continue extends ErrorPolicy
  }

  private def guarded(policy: ErrorPolicy)
                     (steps: Seq[(String, () => Unit)]): Seq[(String, Throwable)] =
    steps.flatMap { case (name, run) =>
      try { run(); Nil }
      catch {
        // NonFatal only: an OOM/interrupt must crash the runner, not be
        // filed away as a per-table failure on a broken JVM
        case scala.util.control.NonFatal(e) if policy == ErrorPolicy.Continue =>
          Seq(name -> e)
      }
    }

  /** Bronze (§3.1): raw CSV → parquet, one narrow no-shuffle job per table.
    * Returns the per-table failures under [[ErrorPolicy.Continue]]
    * (empty on success); propagates the first under FailFast. */
  def runBronze(spark: SparkSession, rawDir: String, bronzeDir: String,
                policy: ErrorPolicy = ErrorPolicy.FailFast): Seq[(String, Throwable)] =
    guarded(policy)(tables.map { t =>
      t -> (() => writeParquet(
        readCsv(spark, s"$rawDir/$t", Schemas.all(t)), s"$bronzeDir/$t"))
    })

  /** Silver (§3.2): per-table cleanse, still shuffle-free. */
  def runSilver(spark: SparkSession, bronzeDir: String, silverDir: String,
                asOf: String, asOfYear: Int,
                policy: ErrorPolicy = ErrorPolicy.FailFast): Seq[(String, Throwable)] = {
    def rd(t: String) = readParquet(spark, s"$bronzeDir/$t")
    guarded(policy)(Seq(
      "clients" -> (() => writeParquet(Silver.clients(rd("clients")), s"$silverDir/clients")),
      "crm_clients" -> (() => writeParquet(Silver.crmClients(rd("crm_clients")), s"$silverDir/crm_clients")),
      "vehicles" -> (() => writeParquet(Silver.vehicles(rd("vehicles"), asOfYear), s"$silverDir/vehicles")),
      "policies" -> (() => writeParquet(Silver.policies(rd("policies")), s"$silverDir/policies")),
      "claims" -> (() => writeParquet(Silver.claims(rd("claims"), asOf), s"$silverDir/claims")),
      "payments" -> (() => writeParquet(Silver.payments(rd("payments")), s"$silverDir/payments"))))
  }

  /** Gold (§3.3): the dimensional model. */
  def runGold(spark: SparkSession, silverDir: String, goldDir: String): Unit = {
    def rd(t: String) = readParquet(spark, s"$silverDir/$t")
    writeParquet(Gold.dimClients(rd("clients"), rd("crm_clients")), s"$goldDir/dim_clients")
    writeParquet(Gold.dimVehicles(rd("vehicles")), s"$goldDir/dim_vehicles")
    writeParquet(Gold.factClientSummary(rd("clients"), rd("policies"),
      rd("payments"), rd("claims")), s"$goldDir/fact_client_summary")
    writeParquet(Gold.factPayments(rd("payments"), rd("policies")), s"$goldDir/fact_payments")
  }

  /** Full medallion pipeline: generate → bronze → silver → gold. */
  def runAll(spark: SparkSession, baseDir: String, scale: Double = 1.0,
             seed: Long = 42, asOf: String = "2026-01-01 00:00:00",
             asOfYear: Int = 2026): Unit = {
    Gen.all(spark, scale, seed).foreach { case (t, df) =>
      writeCsv(df, s"$baseDir/raw/$t")
    }
    runBronze(spark, s"$baseDir/raw", s"$baseDir/bronze")
    runSilver(spark, s"$baseDir/bronze", s"$baseDir/silver", asOf, asOfYear)
    runGold(spark, s"$baseDir/silver", s"$baseDir/gold")
  }
}
