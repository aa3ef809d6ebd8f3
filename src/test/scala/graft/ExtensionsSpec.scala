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

  test("graft_shingles / graft_pos_shingles generate rows from SQL") {
    GraftExtensions.register(spark)
    Seq(("a b c d", 1L)).toDF("t", "id").createOrReplaceTempView("docs")
    val sh = spark.sql("SELECT graft_shingles(t, 3) AS sh FROM docs")
      .collect().map(_.getString(0)).toSet
    assert(sh == Set("a b c", "b c d"))
    val pos = spark.sql("SELECT graft_pos_shingles(t, 3) FROM docs")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(pos == Map(0 -> "a b c", 1 -> "b c d"))
    // non-literal width must fail cleanly, not mis-build the tree
    val err = intercept[Exception] {
      spark.sql("SELECT graft_shingles(t, CAST(id AS INT)) FROM docs").collect()
    }
    assert(err.getMessage.contains("literal"), err.getMessage)
  }

  test("graft_zvalue from SQL == Warehouse.zValue Column API") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT graft_zvalue(3L, 1L, 4) AS z")
      .collect()(0).getLong(0)
    assert(viaSql == 7L)
    val viaCol = Seq((3L, 1L)).toDF("x", "y")
      .select(graft.sources.Warehouse.zValue($"x", $"y", 4)).head.getLong(0)
    assert(viaSql == viaCol)
  }

  test("GraftExtensions class injects all functions") {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e)
    // builder-level smoke: injection must not throw and must cover every
    // registered name (deep validation happens via the runtime path above)
    assert(GraftExtensions.functions.map(_._1).toSet ==
      Set("graft_dot", "graft_norm", "graft_title_py",
        "graft_shingles", "graft_pos_shingles", "graft_zvalue", "graft_ln"))
  }

  test("graft_ln from SQL == Pmath.lnColumn Column API, bit for bit") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_ln(x) AS l FROM VALUES (1.0), (2.5), (1e9) AS t(x)")
      .collect().map(_.getDouble(0)).toSeq
    val viaCol = Seq(1.0, 2.5, 1e9).toDF("x")
      .select(graft.functions.Pmath.lnColumn($"x")).collect()
      .map(_.getDouble(0)).toSeq
    assert(viaSql == viaCol)
    assert(viaSql.head == 0.0 && math.abs(viaSql(1) - math.log(2.5)) < 1e-11)
  }
}
