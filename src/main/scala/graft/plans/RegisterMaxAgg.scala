package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise MAX of fixed-length byte arrays — the HyperLogLog /
  * HyperANF register-merge aggregate ([[graft.operators.Graphs
  * .hyperANF]]).
  *
  * The relational register form (one (id, bucket, m) row per occupied
  * register) is oracle-replayable but pays a 64× row fan-out through
  * every frontier⋈adjacency join: at sf0.1 the HyperANF rounds shuffled
  * ~70M (b, m) rows each and x_eff_diameter cost 20.8 s. Packing the 64
  * registers into ONE array<tinyint> column and merging with this
  * aggregate makes the join move one narrow row per (edge, neighbor)
  * and the merge a map-side-combinable ObjectHashAggregate — the same
  * numbers, 64× fewer shuffled rows.
  *
  * Semantics: byte-wise max across all input arrays (register value 0 =
  * empty register, and max against 0 is the identity — exactly HLL
  * register-merge). Max is commutative and associative, so partial
  * aggregation and any partition order produce the identical result —
  * the property that licenses the packed engine plan against the
  * row-form DuckDB oracle (same register values, same census). Null
  * input rows are skipped; all arrays must share one length (the first
  * seen fixes it — a mismatch throws rather than silently truncating).
  */
case class RegisterMaxAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "register_max"

  // empty sentinel = "no input yet"; real buffers are never 0-length
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def maxInto(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other.clone()
    require(buf.length == other.length,
      s"register_max: mixed register widths ${buf.length} vs ${other.length}")
    var i = 0
    while (i < buf.length) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else maxInto(buf, v.asInstanceOf[ArrayData].toByteArray())
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    maxInto(buf, other)

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(b => b: Any))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): RegisterMaxAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RegisterMaxAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RegisterMaxAgg =
    copy(child = newChildren.head)
}
