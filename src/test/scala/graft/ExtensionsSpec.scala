package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.plans.GraftExtensions

/** Custom-expression SQL surface: runtime registry and the
  * spark.sql.extensions injection class. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot / graft_norm callable from SQL, matches Column API") {
    GraftExtensions.register(spark)
    Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val row = spark.sql(
      "SELECT graft_dot(a, b) AS d, graft_norm(a) AS n FROM vecs").collect()(0)
    assert(row.getDouble(0) == 32.0)
    assert(math.abs(row.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    // matches the Column API kernel exactly
    val viaColumn = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .select(graft.functions.Vectors.dot($"a", $"b")).collect()(0).getDouble(0)
    assert(viaColumn == row.getDouble(0))
  }

  test("graft_title_py callable from SQL, matches Python semantics") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_title_py(\"o'brien smith\") AS t, graft_title_py(NULL) AS n")
      .collect()(0)
    assert(r.getString(0) == "O'Brien Smith")
    assert(r.isNullAt(1))
  }

  test("graft_dot null semantics from SQL: mismatched lengths -> null") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(1.0D)) AS d").collect()(0)
    assert(r.isNullAt(0))
  }

  test("GraftExtensions class injects all functions") {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e)
    // builder-level smoke: injection must not throw and must cover every
    // registered name (deep validation happens via the runtime path above)
    assert(GraftExtensions.functions.map(_._1).toSet ==
      Set("graft_dot", "graft_norm", "graft_title_py"))
  }
}
