package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native
  * `TypedImperativeAggregate` — the frequent-items aggregate for corpus
  * vocab/top-terms at 100 TB, where exact per-term counts would shuffle
  * the whole token stream but the sketch keeps ≤ `k` counters per
  * partition and merges associatively.
  *
  * Guarantees (classic MG, preserved under merge): any item with true
  * frequency > n/(k+1) is IN the sketch, and every reported count
  * underestimates the true count by at most n/(k+1) (n = items seen).
  * Counts are approximate and merge-order dependent — rows-only /
  * ScalaTest-verified, never an exact-oracle path (that's what the exact
  * `x_doc_top_terms` aggregation is for at oracle scale).
  *
  * This is the engine's one `TypedImperativeAggregate` (arbitrary
  * mutable state + explicit serialize/merge), complementing the
  * `Aggregator`-based UDAF (CountIfAgg), codegen scalar expressions
  * (ArrayDot, TitleCasePy), native Generators (shingles), and the custom
  * physical operator (TopKPerKey).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[String, Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  // map<term, count>: the surviving counters (≤ k entries)
  override def dataType: DataType = MapType(StringType, LongType, false)

  override def createAggregationBuffer(): mutable.LinkedHashMap[String, Long] =
    mutable.LinkedHashMap.empty[String, Long]

  private def offer(buf: mutable.LinkedHashMap[String, Long],
                    term: String, weight: Long): Unit = {
    buf.get(term) match {
      case Some(c) => buf(term) = c + weight
      case None if buf.size < k => buf(term) = weight
      case None =>
        // decrement-all by the offered weight, capped at the smallest
        // counter (batched form of MG's decrement step)
        val dec = math.min(weight, buf.valuesIterator.min)
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - dec)
        buf.foreach { case (t, c) => if (c <= 0) dead += t }
        dead.foreach(buf.remove)
        val rest = weight - dec
        if (rest > 0 && buf.size < k) buf(term) = rest
    }
  }

  override def update(buf: mutable.LinkedHashMap[String, Long],
                      input: InternalRow): mutable.LinkedHashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: mutable.LinkedHashMap[String, Long],
                     other: mutable.LinkedHashMap[String, Long]): mutable.LinkedHashMap[String, Long] = {
    other.foreach { case (t, c) => offer(buf, t, c) }
    buf
  }

  override def eval(buf: mutable.LinkedHashMap[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (t, c) => (-c, t) }
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(sorted.map(_._2).toArray[Any]))
  }

  override def serialize(buf: mutable.LinkedHashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LinkedHashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf(new String(b, "UTF-8")) = in.readLong()
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}
