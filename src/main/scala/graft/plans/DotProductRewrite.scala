package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, ByteType, DoubleType,
  FloatType, IntegerType, LongType, ShortType}

/** Optimizer rule: strength-reduce the declarative dot-product —
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)`
  * — into the fused codegen [[ArrayDot]] kernel (~10× on the ANN hot
  * paths; see ArrayDot's scaladoc for the benchmark). Users keep writing
  * the composable HOF form (or portable SQL) and get the native loop.
  *
  * Fires ONLY when the rewrite is bit-identical:
  *  - the multiply happens in DOUBLE (both lambda vars are double, or
  *    var-level casts to double) — a float×float multiply rounds to
  *    float first and would change the value, so it's left alone;
  *  - the zero is literal 0.0D and the merge is a bare two-var add
  *    (either order: IEEE addition is commutative, including NaN and
  *    signed-zero cases);
  *  - the finish lambda is identity (what `functions.aggregate` /
  *    SQL `aggregate` emit when no finish is given).
  * Array-level `CAST(arr AS ARRAY<DOUBLE>)` on the inputs is absorbed:
  * ArrayDot casts each element to double in-loop, which is the same
  * value without the intermediate array allocation. Null semantics
  * already agree (any null element or length mismatch → null), so the
  * guard set above is exhaustive.
  *
  * Registered both ways: `spark.sql.extensions=graft.plans.GraftExtensions`
  * (injectOptimizerRule) and `GraftExtensions.register(spark)`
  * (experimental.extraOptimizations, deduplicated). The rule is
  * idempotent — ArrayDot never re-matches the pattern.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  /** Only the element types [[ArrayDot]]'s getter/genGet actually
    * implement — NOT all of NumericType: a DecimalType array accepted
    * here would rewrite a working HOF dot product into a runtime
    * IllegalStateException inside ArrayDot. (Decimal is excluded on
    * purpose: its to-double hop tie-rounds engine-specifically, the
    * opposite of what a bit-replayable rewrite may do.) */
  private def isNumericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType |
                   ShortType | ByteType, _) => true
    case _ => false
  }

  /** The zip input with an array-level to-double cast absorbed. */
  private def stripArrayCast(e: Expression): Option[Expression] = e match {
    case Cast(child, ArrayType(DoubleType, _), _, _) if isNumericArray(child) =>
      Some(child)
    case _ if isNumericArray(e) => Some(e)
    case _ => None
  }

  /** Is `e` lambda-var `v` evaluated as double (directly or var-cast)? */
  private def doubleVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case x: NamedLambdaVariable =>
        x.exprId == v.exprId && x.dataType == DoubleType
      case Cast(x: NamedLambdaVariable, DoubleType, _, _) => x.exprId == v.exprId
      case _ => false
    }

  private def identityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable,
        Seq(arg: NamedLambdaVariable), _) => body.exprId == arg.exprId
    case _ => false
  }

  private def bareAdd(body: Expression, acc: NamedLambdaVariable,
                      el: NamedLambdaVariable): Boolean = body match {
    case Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _) =>
      Set(l.exprId, r.exprId) == Set(acc.exprId, el.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(za, zb, LambdaFunction(Multiply(mx, my, _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(addBody,
              Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            finish)
          if identityFinish(finish) && bareAdd(addBody, acc, el) &&
            ((doubleVar(mx, zx) && doubleVar(my, zy)) ||
              (doubleVar(mx, zy) && doubleVar(my, zx))) &&
            stripArrayCast(za).isDefined && stripArrayCast(zb).isDefined =>
        ArrayDot(stripArrayCast(za).get, stripArrayCast(zb).get)
    }
}
