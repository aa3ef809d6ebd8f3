package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

import graft.functions.Pmath

/** Native codegen form of the portable exp ([[graft.functions.Pmath]]):
  * k = ⌊x/ln2 + ½⌋ range reduction, fixed-order Horner for exp(r), and
  * an exact 2ᵏ scaling — `Math.scalb(p, k)` here, the literal 2ᵏ CASE
  * table in the SQL replay; both are error-free power-of-two scalings
  * of the same p, so the bits agree (no subnormals in the |x| ≤ 40
  * domain). Same constant table as [[Pmath.expColumnLambda]] and
  * [[Pmath.expSqlChainCtes]], so the three forms cannot drift;
  * PmathSpec sweeps native-vs-lambda bit equality.
  */
case class PortableExp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  @inline private def compute(x: Double): Double = {
    val kf = math.floor(x * Pmath.InvLn2 + 0.5)
    val r = x - kf * Pmath.Ln2
    var p = Pmath.expCoeffs.last
    var i = Pmath.expCoeffs.length - 2
    while (i >= 0) { p = Pmath.expCoeffs(i) + r * p; i -= 1 }
    Math.scalb(p, kf.toInt)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => {
      val inner = Pmath.expCoeffs.reverse.tail
        .foldLeft(s"${Pmath.expCoeffs.last}D") {
          (acc, c) => s"(${c}D + r * ($acc))"
        }
      val fn = ctx.freshName("portableExp")
      val method =
        s"""private double $fn(double x) {
           |  double kf = Math.floor(x * ${Pmath.InvLn2}D + 0.5D);
           |  double r = x - kf * ${Pmath.Ln2}D;
           |  double p = $inner;
           |  return Math.scalb(p, (int) kf);
           |}""".stripMargin
      s"${ctx.addNewFunction(fn, method)}($x)"
    })

  override protected def withNewChildInternal(newChild: Expression): PortableExp =
    copy(child = newChild)
}
