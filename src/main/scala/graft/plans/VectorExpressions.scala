package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot-product over two numeric arrays, with whole-stage codegen.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — is a
  * chain of higher-order functions that Catalyst evaluates interpretively
  * (lambda closures, one ArrayData allocation per step); at millions of
  * candidate pairs × 64 dims it dominated the ANN/near-dup benchmarks.
  * This expression emits a tight fused loop instead (~10× at sf0.1) while
  * producing BIT-IDENTICAL results: double accumulation, strict
  * left-to-right order, each element cast to double before multiply —
  * exactly what the DuckDB oracle's list_dot_product over a double-cast
  * list computes, so exact hash-compare still holds.
  *
  * Null semantics match zip_with+aggregate: any null element (or length
  * mismatch making one side null-padded) → null result.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(l: NumericType, _), ArrayType(r: NumericType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ArrayDot needs two numeric arrays, got ${left.dataType} / ${right.dataType}")
    }
  }

  private def getter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case DoubleType => (a, i) => a.getDouble(i)
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case LongType => (a, i) => a.getLong(i).toDouble
    case ShortType => (a, i) => a.getShort(i).toDouble
    case ByteType => (a, i) => a.getByte(i).toDouble
    case _ => throw new IllegalStateException(s"unsupported element type $dt")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val ga = getter(elemType(left))
    val gb = getter(elemType(right))
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += ga(a, i) * gb(b, i)
      i += 1
    }
    s
  }

  private def genGet(dt: DataType, arr: String, i: String): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case ShortType => s"(double) $arr.getShort($i)"
    case ByteType => s"(double) $arr.getByte($i)"
    case _ => throw new IllegalStateException(s"unsupported element type $dt")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (${genGet(elemType(left), a, i)}) * (${genGet(elemType(right), b, i)});
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}
