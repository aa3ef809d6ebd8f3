package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.Similarity

/** Stage-level micro-profiler for the PQ ANN pipeline (VERDICT r11
  * item 1: x_ann_pq runs ~6 s idle at sf0.1 on a 2000×64 corpus — pure
  * fixed cost; attribute it to fit / code-assign / ADC / shortlist /
  * rerank before touching the operator). Mirrors [[Similarity.pqTopK]]'s
  * stages with the same parameters as the graded query; not part of the
  * graded surface. */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pq] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val (m, nCodes, seed, lloydIters, shortlist, k) = (4, 16, 42L, 2, 25, 5)
    val e = graft.Tables.load(spark, sfDir, "embeddings")
    time("read embeddings (count)")(e.count())
    val dim = Vectors.deriveDim(e, "embedding")
    val sub = dim / m

    (1 to 3).foreach { i =>
      time(s"pqCodebooks fit #$i")(
        Similarity.pqCodebooks(e, "vec_id", "embedding", m, sub, nCodes,
          seed, lloydIters))
    }
    val books = Similarity.pqCodebooks(e, "vec_id", "embedding", m, sub,
      nCodes, seed, lloydIters).toSeq

    // pqTopK's own stage expressions, replicated for attribution
    def codeOf(v: org.apache.spark.sql.Column, j: Int) =
      array_min(Similarity.centroidScores(books(j), slice(v, j * sub + 1, sub)))
        .getField("list")
    def codeword(j: Int, code: org.apache.spark.sql.Column) =
      element_at(typedlit(books(j).map(_.toSeq).toSeq), code + 1)
    val coded = e.select(col("vec_id").as("neighbor_id") +:
      (0 until m).map(j => codeOf(col("embedding"), j).as(s"code_$j")): _*)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val adc = (0 until m).map(j =>
      Vectors.dot(slice(col("qv"), j * sub + 1, sub),
        codeword(j, col(s"code_$j")))).reduce(_ + _)
    val scored = coded.crossJoin(broadcast(q)).withColumn("adc", adc)
      .select("query_id", "neighbor_id", "adc")
    val short = graft.plans.TopKPerKey(scored, Seq("query_id"),
        Seq("adc" -> false, "neighbor_id" -> true), shortlist, "crank")
      .filter(col("crank") <= shortlist).drop("crank")

    (1 to 2).foreach { i =>
      time(s"stage: coded (assign) #$i")(noop(coded))
      time(s"stage: + ADC scored #$i")(noop(scored))
      time(s"stage: + TopKPerKey short #$i")(noop(short))
    }
    // attribution of the ADC stage's fixed cost: planning vs codegen
    // vs execution
    time("scored: executedPlan (plan only)")(
      scored.queryExecution.executedPlan)
    val sess = e.sparkSession
    sess.conf.set("spark.sql.codegen.wholeStage", "false")
    (1 to 2).foreach { i =>
      time(s"scored nocodegen #$i")(noop(
        coded.crossJoin(broadcast(q)).withColumn("adc", adc)
          .select("query_id", "neighbor_id", "adc")))
    }
    sess.conf.set("spark.sql.codegen.wholeStage", "true")
    // variant A: codegen fence between the code-assign scan and the
    // crossJoin+ADC stage (persist splits the whole-stage unit)
    val codedP = coded.persist()
    (1 to 2).foreach { i =>
      time(s"scored w/ persisted coded #$i")(noop(
        codedP.crossJoin(broadcast(q)).withColumn("adc", adc)
          .select("query_id", "neighbor_id", "adc")))
    }
    codedP.unpersist()
    // variant B: the fused join WITHOUT the ADC expression
    (1 to 2).foreach { i =>
      time(s"join, adc=lit(0.0) #$i")(noop(
        coded.crossJoin(broadcast(q)).withColumn("adc", lit(0.0))
          .select("query_id", "neighbor_id", "adc")))
    }
    // variant C: ADC but with the codeword lookup replaced by a
    // constant subvector (isolates ElementAt-on-2D-literal)
    val adcNoLut = (0 until m).map(j =>
      Vectors.dot(slice(col("qv"), j * sub + 1, sub),
        typedlit(books(j)(0).toSeq))).reduce(_ + _)
    (1 to 2).foreach { i =>
      time(s"adc w/o element_at #$i")(noop(
        coded.crossJoin(broadcast(q)).withColumn("adc", adcNoLut)
          .select("query_id", "neighbor_id", "adc")))
    }
    (1 to 3).foreach { i =>
      time(s"full pqTopK #$i")(noop(
        Similarity.pqTopK(e.filter(col("vec_id") < 10), e,
          "vec_id", "embedding", "vec_id", "embedding", k, shortlist)))
    }
    spark.stop()
  }
}
