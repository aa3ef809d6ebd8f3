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
        "graft_shingles", "graft_pos_shingles", "graft_zvalue", "graft_ln",
        "graft_jaro_winkler"))
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

  test("DotProductRewrite: HOF dot-product becomes ArrayDot; results bit-identical incl. null/length edges") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),          // 32.0
      (Array(0.1f, 0.2f), Array(0.3f, 0.4f)),                       // rounding-sensitive
      (Array(1.0f), Array(1.0f, 2.0f)),                             // length mismatch → null
      (Array(1.0f, Float.NaN), Array(1.0f, 1.0f)))                  // NaN propagates
      .toDF("a", "b")
    // repartition blocks ConvertToLocalRelation from folding the whole
    // projection at optimize time (the rule runs in the post-batch
    // extraOptimizations slot, after that fold would have happened)
    def hof(d: org.apache.spark.sql.DataFrame) = d.repartition(2).select(
      aggregate(
        zip_with(col("a").cast("array<double>"), col("b").cast("array<double>"),
          (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    // baseline: the un-rewritten HOF chain (rule detached)
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == graft.plans.DotProductRewrite)
    // NaN-safe, order-safe comparison: raw IEEE bits, sorted
    def bits(d: org.apache.spark.sql.DataFrame): Seq[Option[Long]] =
      d.collect().map(r => Option(r.get(0)).map(v =>
        java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])))
        .toSeq.sortBy(_.getOrElse(Long.MinValue))
    val before = bits(hof(df))
    // with the rule: plan must contain ArrayDot, values must be identical
    GraftExtensions.register(spark)
    val q = hof(df)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.toLowerCase.contains("arraydot"),
      s"rewrite must fire:\n$optimized")
    val after = bits(hof(df))
    assert(before == after)
    assert(after.contains(Some(java.lang.Double.doubleToLongBits(32.0))))
    assert(after.contains(None)) // length mismatch stays null
    assert(after.contains(Some(java.lang.Double.doubleToLongBits(Double.NaN))))
    // and on a real parquet scan (the ANN-shaped plan): fires too
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val scanPlan = emb.select(aggregate(
      zip_with(col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v).as("n2"))
      .queryExecution.optimizedPlan.toString
    assert(scanPlan.toLowerCase.contains("arraydot"),
      s"rewrite must fire over a parquet scan:\n$scanPlan")
  }

  test("DotProductRewrite leaves the float-multiply form alone (value would change)") {
    import org.apache.spark.sql.functions._
    GraftExtensions.register(spark)
    val df = Seq((Array(0.1f, 0.2f), Array(0.3f, 0.4f))).toDF("a", "b")
    // multiply in FLOAT (no casts): rounds to float per element — not
    // the ArrayDot contract, must not rewrite
    val q = df.repartition(2).select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v).as("d"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("arraydot"),
      s"float-multiply form must be left alone:\n$optimized")
  }
}
