package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Cleanse

/** Property tests (SURVEY.md §5): cleansing idempotence, null
  * monotonicity, row-accounting invariants — scalacheck generators over
  * adversarial strings (whitespace, accents, punctuation, empties),
  * sampled with fixed seeds (plain scalacheck; the scalatest bridge
  * artifact isn't on the offline classpath). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val dirtyString: Gen[String] = for {
    base <- Gen.oneOf(
      Gen.alphaNumStr,
      Gen.oneOf("básica", "DAÑOS por CLIMA", "o'brien", "a-b", "x y z",
        "++34 (600) 111-222", "john@ex.com", "bad@@mail", "", " ", "\t"),
      Gen.listOf(Gen.oneOf('a', 'Á', '9', ' ', '\'', '-', '@', '.', '+'))
        .map(_.mkString))
    pad <- Gen.oneOf("", " ", "  ", "\t")
  } yield pad + base + pad

  private def samples(n: Int, seed: Long): List[String] =
    Gen.listOfN(n, dirtyString)
      .pureApply(Gen.Parameters.default, Seed(seed))

  private def evalOne(c: org.apache.spark.sql.Column, in: Option[String]): Any =
    Seq(in).toDF("x").select(c.as("y")).collect()(0).get(0)

  private val unary: Seq[(String, org.apache.spark.sql.Column => org.apache.spark.sql.Column)] = Seq(
    ("titleCase", Cleanse.titleCase),
    ("titleCasePy", Cleanse.titleCasePy),
    ("upperTrim", Cleanse.upperTrim),
    ("normalizePhone", Cleanse.normalizePhone),
    ("normalizePlate", Cleanse.normalizePlate),
    ("validEmail", Cleanse.validEmail))

  test("cleansing is idempotent: clean(clean(x)) == clean(x)") {
    for (seed <- 1L to 5L) {
      val df = samples(40, seed).map(Option(_)).toDF("x")
      for ((name, f) <- unary) {
        val once = df.select(f($"x").as("y"))
        val l = once.collect().map(_.get(0)).toSeq
        val r = once.select(f($"y").as("y")).collect().map(_.get(0)).toSeq
        assert(l == r, s"$name not idempotent (seed=$seed)")
      }
    }
  }

  test("cleansing is null-monotone: null in -> null out") {
    for ((name, f) <- unary)
      assert(evalOne(f($"x"), None) == null, s"$name invented a value from null")
    assert(evalOne(Cleanse.positiveRound2($"x".cast("double")), None) == null)
    assert(evalOne(Cleanse.validRange($"x".cast("int"), 0, 10), None) == null)
    assert(evalOne(Cleanse.coerceLenient($"x"), None) == null)
  }

  test("titleCase/upperTrim never emit empty or untrimmed strings") {
    val df = samples(80, 7L).map(Option(_)).toDF("x")
    for (f <- Seq(Cleanse.titleCase _, Cleanse.titleCasePy _, Cleanse.upperTrim _)) {
      val out = df.select(f($"x").as("y")).as[Option[String]].collect().flatten
      assert(out.forall(s => s.nonEmpty && s == s.trim))
    }
  }

  test("normalizePlate output is always [A-Z0-9]+ or null") {
    val out = samples(80, 11L).map(Option(_)).toDF("x")
      .select(Cleanse.normalizePlate($"x").as("y"))
      .as[Option[String]].collect().flatten
    assert(out.forall(_.matches("[A-Z0-9]+")))
  }

  test("silver row accounting: cleaning never adds rows; filters only remove") {
    for (seed <- Seq(1L, 99L, 12345L)) {
      val n = 50 + (seed % 200)
      val raw = graft.sources.Gen.payments(spark, n, n max 10, seed)
      val cleaned = graft.pipelines.Silver.payments(raw)
      assert(cleaned.count() <= raw.count())
      assert(cleaned.filter($"amount".isNull || $"amount" <= 0).count() == 0)
      assert(cleaned.filter($"payment_date".isNull).count() == 0)
    }
  }

  test("safeDiv never yields NaN or infinities") {
    val pairs = Gen.listOfN(60, Gen.zip(
      Gen.chooseNum(-1e9, 1e9),
      Gen.oneOf(Gen.const(0.0), Gen.chooseNum(-1e6, 1e6))))
      .pureApply(Gen.Parameters.default, Seed(3L))
    val out = pairs.toDF("a", "b")
      .select(Cleanse.safeDiv($"a", $"b").as("y"))
      .as[Option[Double]].collect().flatten
    assert(out.forall(d => !d.isNaN && !d.isInfinite))
  }
}
