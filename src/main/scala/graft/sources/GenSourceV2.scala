package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{Filter, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 synthetic-events source — the engine's generator
  * ([[Gen]]) re-expressed through Spark's connector API so the OPTIMIZER
  * can reach it: column pruning arrives via
  * `SupportsPushDownRequiredColumns` (un-projected fields are never
  * generated), and `event_id` range predicates arrive via
  * `SupportsPushDownFilters` and SHRINK the generated id ranges
  * source-side (the DSv2 analogue of parquet row-group pruning — the
  * skipped rows are never materialized anywhere).
  *
  * Determinism: every field of row `id` is a pure function of
  * (seed, id) through the splitmix64 finalizer — independent of
  * partitioning, so `numPartitions` is a pure parallelism knob, the
  * partition-independence contract [[Gen]] established.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.GenSourceV2")
  *   .option("rows", 100000).option("seed", 42)
  *   .option("numPartitions", 8).load()
  * }}}
  *
  * Scale: rows are generated per partition with O(1) state; a 100 TB
  * synthetic load is CPU-bound and embarrassingly parallel, and range
  * pushdown keeps selective scans proportional to the SELECTED id
  * span, not the table size.
  */
class GenSourceV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSourceV2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // option keys arrive case-insensitively; probe both spellings
    def opt(k: String, d: String): String =
      Option(properties.get(k))
        .orElse(Option(properties.get(k.toLowerCase)))
        .getOrElse(d)
    new GenSourceV2.EventsTable(opt("rows", "1000").toLong,
      opt("seed", "42").toLong, opt("numPartitions", "4").toInt)
  }
}

object GenSourceV2 {

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  private val eventTypes =
    Array("click", "error", "purchase", "signup", "view")

  /** splitmix64 finalizer — the standard public-domain mixer. */
  private[sources] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private class EventsTable(rows: Long, seed: Long, parts: Int)
      extends Table with SupportsRead {
    override def name(): String = s"graft_gen_events($rows, $seed)"
    override def schema(): StructType = GenSourceV2.schema
    override def capabilities(): util.Set[TableCapability] =
      Set(TableCapability.BATCH_READ).asJava
    override def newScanBuilder(
        options: CaseInsensitiveStringMap): ScanBuilder =
      new EventsScanBuilder(rows, seed, parts)
  }

  private class EventsScanBuilder(rows: Long, seed: Long, parts: Int)
      extends ScanBuilder with SupportsPushDownRequiredColumns
      with SupportsPushDownFilters {
    private var required: StructType = GenSourceV2.schema
    private var lo = 0L
    private var hi = rows // exclusive
    private var pushed: Array[Filter] = Array.empty

    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema

    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      val (accepted, rejected) = filters.partition {
        case GreaterThan("event_id", _: Long) => true
        case GreaterThanOrEqual("event_id", _: Long) => true
        case LessThan("event_id", _: Long) => true
        case LessThanOrEqual("event_id", _: Long) => true
        case _ => false
      }
      accepted.foreach {
        case GreaterThan("event_id", v: Long) => lo = math.max(lo, v + 1)
        case GreaterThanOrEqual("event_id", v: Long) => lo = math.max(lo, v)
        case LessThan("event_id", v: Long) => hi = math.min(hi, v)
        case LessThanOrEqual("event_id", v: Long) => hi = math.min(hi, v + 1)
        case _ => ()
      }
      pushed = accepted
      // range filters are fully enforced source-side; nothing residual
      rejected
    }

    override def pushedFilters(): Array[Filter] = pushed

    override def build(): Scan = new Scan with Batch {
      override def readSchema(): StructType = required
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val span = math.max(0L, hi - lo)
        val per = math.max(1L, (span + parts - 1) / parts)
        (0 until parts).iterator
          .map(p => (lo + p * per, math.min(hi, lo + (p + 1) * per)))
          .filter { case (s, e) => s < e }
          .map { case (s, e) =>
            EventsPartition(s, e, seed, required.fieldNames): InputPartition
          }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        EventsReaderFactory
    }
  }

  private case class EventsPartition(start: Long, end: Long, seed: Long,
                                     fields: Array[String])
      extends InputPartition

  private object EventsReaderFactory extends PartitionReaderFactory {
    override def createReader(
        partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[EventsPartition]
      new PartitionReader[InternalRow] {
        private var id = p.start - 1
        override def next(): Boolean = { id += 1; id < p.end }
        override def get(): InternalRow = {
          val vals: Array[Any] = p.fields.map {
            case "event_id" => id
            case "user_id" => java.lang.Math.floorMod(
              mix(p.seed ^ (id * 31L)), 1000L)
            case "event_type" => UTF8String.fromString(
              eventTypes(java.lang.Math.floorMod(
                mix(p.seed ^ (id * 131L)), eventTypes.length.toLong).toInt))
            case "value" =>
              // uniform cents in [0.01, 500.00], exactly two decimals
              (java.lang.Math.floorMod(
                mix(p.seed ^ (id * 631L)), 50000L) + 1) / 100.0
            case other =>
              throw new IllegalArgumentException(s"unknown field $other")
          }
          InternalRow.fromSeq(vals.toIndexedSeq)
        }
        override def close(): Unit = ()
      }
    }
  }
}
