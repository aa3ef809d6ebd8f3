package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.sql.execution.SparkStrategy

/** Whole-operator custom plan (SURVEY.md §7.3 ladder, step c): top-k rows
  * per key — the ANN/re-rank primitive — as a native
  * LogicalPlan → Strategy → SparkPlan chain.
  *
  * The composable form (`row_number().over(Window.partitionBy(key)
  * .orderBy(...)) <= k`) forces a FULL SORT of every key group under
  * WindowExec; this operator keeps a bounded k-element heap per key
  * (O(n log k), memory k·|keys-per-partition| rows) after the same
  * hash-partition exchange, then emits ranked rows. Output, ordering and
  * tie-breaks are identical to the window form — TopKSpec proves
  * row-for-row equality, so the DuckDB row_number oracle still applies.
  */
case class TopKPerKeyNode(partExprs: Seq[Expression], order: Seq[SortOrder],
                          k: Int, rankAttr: Attribute, child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rank is generated here, not consumed from the child (CheckAnalysis
  // flags any output attr outside producedAttributes ∪ inputSet)
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(part, order, k, rank, child) =>
      TopKPerKeyExec(part, order, k, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(partExprs: Seq[Expression], order: Seq[SortOrder],
                          k: Int, rankAttr: Attribute, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)

  /** Co-locate each key's rows; no ordering requirement — that's the
    * point (WindowExec would demand a full sort here). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(partExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val partE = partExprs
    val orderE = order
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(partE, childOutput)
      val ordering = RowOrdering.create(orderE, childOutput)
      // max-heap on the ordering: head = worst of the current top-k
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, ordering.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val outProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      val it = heaps.entrySet().iterator()
      new Iterator[InternalRow] {
        private var current: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = current.hasNext || {
          if (it.hasNext) {
            val rows = it.next().getValue.toArray(new Array[InternalRow](0))
            java.util.Arrays.sort(rows, ordering)
            current = rows.iterator.zipWithIndex.map { case (r, i) =>
              outProj(joined(r, InternalRow(i + 1))).asInstanceOf[InternalRow]
            }
            hasNext
          } else false
        }
        override def next(): InternalRow = current.next()
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Top-k rows per key with a rank column — drop-in for the
    * row_number-window idiom. Ordering given as (column, ascending?)
    * pairs; attributes are resolved here against the child's analyzed
    * output (Column objects arrive as unresolved ColumnNode wrappers the
    * analyzer won't resolve inside a foreign logical operator). */
  def apply(df: DataFrame, partitionCols: Seq[String],
            orderBy: Seq[(String, Boolean)], k: Int,
            rankName: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    ColumnBridge.addStrategy(spark, TopKStrategy)
    val analyzed = df.queryExecution.analyzed
    val attr = analyzed.output.map(a => a.name -> a).toMap
    def resolve(n: String): Attribute = attr.getOrElse(n,
      throw new IllegalArgumentException(s"no column $n in ${attr.keys}"))
    val sortOrders = orderBy.map { case (n, asc) =>
      SortOrder(resolve(n), if (asc) Ascending else Descending)
    }
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    val node = TopKPerKeyNode(partitionCols.map(resolve), sortOrders, k,
      rankAttr, analyzed)
    ColumnBridge.ofRows(spark, node)
  }
}
