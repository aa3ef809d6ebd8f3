package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Sqrt}

/** SQL registration for the engine's custom Catalyst expressions, both
  * ways Spark supports it:
  *
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` (cluster config,
  *    applies at session build), or
  *  - `GraftExtensions.register(spark)` (runtime, for an existing
  *    session — what Verify/Bench/tests use).
  *
  * After registration, `SELECT graft_dot(a, b)` / `graft_norm(v)` work
  * from SQL text with the same codegen kernel as the Column API
  * ([[graft.functions.Vectors.dot]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot"),
      (es: Seq[Expression]) => ArrayDot(es(0), es(1))),
    ("graft_norm",
      new ExpressionInfo(classOf[ArrayDot].getName, "graft_norm"),
      (es: Seq[Expression]) => Sqrt(ArrayDot(es(0), es(0)))),
    ("graft_title_py",
      new ExpressionInfo(classOf[TitleCasePy].getName, "graft_title_py"),
      (es: Seq[Expression]) => TitleCasePy(es(0))))

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
