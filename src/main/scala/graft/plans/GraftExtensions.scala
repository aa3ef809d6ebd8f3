package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, Expression, ExpressionInfo, Literal, ShiftLeft, ShiftRight, Sqrt}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

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
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectOptimizerRule(_ => DotProductRewrite)
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
      (es: Seq[Expression]) => TitleCasePy(es(0))),
    // generators: `SELECT graft_shingles(text, 3) FROM t` emits one row
    // per (distinct) shingle, like explode; the positional form adds pos
    ("graft_shingles",
      new ExpressionInfo(classOf[WordShingleGenerator].getName, "graft_shingles"),
      (es: Seq[Expression]) => WordShingleGenerator(es(0), intLit(es(1), "graft_shingles"))),
    ("graft_pos_shingles",
      new ExpressionInfo(classOf[PositionalShingleGenerator].getName, "graft_pos_shingles"),
      (es: Seq[Expression]) =>
        PositionalShingleGenerator(es(0), intLit(es(1), "graft_pos_shingles"))),
    ("graft_zvalue",
      new ExpressionInfo(classOf[GraftExtensions].getName, "graft_zvalue"),
      (es: Seq[Expression]) =>
        zValueExpr(es(0), es(1), intLit(es(2), "graft_zvalue"))),
    ("graft_ln",
      new ExpressionInfo(classOf[PortableLn].getName, "graft_ln"),
      (es: Seq[Expression]) => PortableLn(Cast(es(0), DoubleType))),
    ("graft_jaro_winkler",
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (es: Seq[Expression]) => JaroWinkler(es(0), es(1))))

  /** Morton interleave as a raw Catalyst tree — the SQL-side twin of
    * [[graft.sources.Warehouse.zValue]] (a Column built from functions._
    * can't be spliced into a tree under analysis: its ColumnNode wrapper
    * stays unresolved). ExtensionsSpec asserts SQL == Column API. */
  private def zValueExpr(x: Expression, y: Expression, bits: Int): Expression = {
    def bit(e: Expression, j: Int, outPos: Int): Expression =
      ShiftLeft(BitwiseAnd(ShiftRight(Cast(e, LongType), Literal(j)),
        Literal(1L)), Literal(outPos))
    (0 until bits).map { j =>
      BitwiseOr(bit(x, j, 2 * j), bit(y, j, 2 * j + 1))
    }.reduce(BitwiseOr(_, _))
  }

  /** Parameters like shingle width must be compile-time literals (they
    * shape the expression tree); reject column arguments with a clear
    * message instead of a ClassCastException. */
  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected an integer literal parameter, got $other")
  }

  /** Runtime registration on an existing session. Idempotent: repeated
    * calls replace functions and add the optimizer rule at most once. */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!spark.experimental.extraOptimizations.contains(DotProductRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DotProductRewrite
  }
}
