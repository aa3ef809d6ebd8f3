package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build side of [[graft.operators.Prune.bloomSemiJoin]] — a
  * mergeable membership sketch over a long key column, evaluated to its
  * serialized bytes.
  *
  * This is the hand-rolled twin of what Spark's AQE runtime filtering
  * (`InjectRuntimeFilter`) does internally for shuffle joins: build a
  * compact bit-set of the dim side's join keys and discard fact rows
  * BEFORE they reach the shuffle. Owning the sketch (instead of hoping the
  * optimizer injects one) lets a pipeline prune across stage boundaries
  * the optimizer can't see — e.g. filter a 100 TB scan against keys
  * produced by a previous job, where the key SET is far too big to
  * broadcast-join cheaply but its bloom is a few MB.
  *
  * Merge is a bitwise OR of equally-sized filters, so the result is
  * partition-order independent (deterministic across shuffles) — unlike
  * count-based sketches. No-false-negative is the load-bearing guarantee:
  * the residual exact join only ever removes rows, never restores them.
  */
case class BloomSketchAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, "bloom sizing needs a positive expected item count")
  require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")

  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): TypeCheckResult =
    BloomKey.check(child.dataType, "graft_bloom_agg")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  // lazy: the child is an unresolved attribute at construction time —
  // dataType only becomes callable after analysis
  @transient private lazy val isString = child.dataType == StringType

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) {
      if (isString) buf.putBinary(v.asInstanceOf[UTF8String].getBytes)
      else buf.putLong(v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other); buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomSketchAgg =
    copy(child = newChildren.head)
}

/** Probe side: `bloom.mightContainLong(key)` as a codegen scalar, the
  * filter living OUTSIDE the row loop. The serialized sketch is a
  * constructor argument (driver-side bytes from a [[BloomSketchAgg]]
  * collect), deserialized once per task via `ctx.addReferenceObj` — the
  * generated code is a single virtual call per row, so the probe stays
  * inside whole-stage codegen and the big-side scan never materializes
  * anything per-row. */
case class MightContainBloom(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    BloomKey.check(child.dataType, "graft_bloom_contains")

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => bloom.mightContainBinary(s.getBytes)
    case l: java.lang.Long => bloom.mightContainLong(l)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    if (child.dataType == StringType)
      defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c.getBytes())")
    else defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MightContainBloom =
    copy(child = newChild)
}

/** Key-type contract shared by the two bloom expressions: integral keys
  * probe as longs, text keys as their UTF-8 bytes (no hashing to long
  * first — a truncated hash would make "result ≡ semi-join" only
  * almost-surely true; the byte form keeps it exact). */
private[plans] object BloomKey {
  def check(dt: DataType, name: String): TypeCheckResult = dt match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires a BIGINT or STRING key, got ${other.catalogString} " +
        "(cast integral keys to long explicitly)")
  }
}
