package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

import graft.functions.Pmath

/** Native codegen form of the portable ln ([[graft.functions.Pmath]]):
  * the identical IEEE operation sequence — power-of-two range reduction
  * by table lookup, then the fixed-order atanh Horner series — emitted
  * as straight-line Java with local variables.
  *
  * The Column form let-binds intermediates through single-element
  * `transform` lambdas, which Catalyst evaluates interpretively with one
  * array allocation per binding per row; in the BM25 / LM-score hot
  * paths that is four allocations per score term. This expression is the
  * same arithmetic (same constant table — both are generated from
  * [[Pmath.reduction]]/[[Pmath.coeffs]], so they cannot drift) in a tight
  * register-only loop body, and whole-stage codegen fuses it into the
  * surrounding projection. PmathSpec asserts bit-equality against the
  * lambda form on a dense domain sweep.
  */
case class PortableLn(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  @inline private def compute(x: Double): Double = {
    var m = x
    var kln2 = 0.0
    // descending thresholds: first hit wins, same as the CASE chain
    val it = Pmath.reduction.iterator
    var done = false
    while (it.hasNext && !done) {
      val (thresh, scale, kl) = it.next()
      if (x >= thresh) { m = x * scale; kln2 = kl; done = true }
    }
    val t = (m - 1.0) / (m + 1.0)
    val t2 = t * t
    var inner = Pmath.coeffs.last
    var i = Pmath.coeffs.length - 2
    while (i >= 0) { inner = Pmath.coeffs(i) + t2 * inner; i -= 1 }
    kln2 + 2.0 * (t * (1.0 + t2 * inner))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => {
      // constants via Double.toString: Java literals parse correctly
      // rounded, so the emitted code computes the exact table values
      val branches = Pmath.reduction.map { case (th, sc, kl) =>
        s"if (x >= ${th}D) { m = x * ${sc}D; kln2 = ${kl}D; } else "
      }.mkString
      val inner = Pmath.coeffs.reverse.tail.foldLeft(s"${Pmath.coeffs.last}D") {
        (acc, c) => s"(${c}D + t2 * ($acc))"
      }
      val fn = ctx.freshName("portableLn")
      val method =
        s"""private double $fn(double x) {
           |  double m; double kln2;
           |  $branches { m = x; kln2 = 0.0; }
           |  double t = (m - 1.0) / (m + 1.0);
           |  double t2 = t * t;
           |  double inner = $inner;
           |  return kln2 + 2.0 * (t * (1.0 + t2 * inner));
           |}""".stripMargin
      s"${ctx.addNewFunction(fn, method)}($x)"
    })

  override protected def withNewChildInternal(newChild: Expression): PortableLn =
    copy(child = newChild)
}
