package graft

import org.apache.spark.sql.functions._
import graft.functions.Cleanse._

/** Unit tests for the silver cleansing expression library (SURVEY.md §2.4)
  * on the edge rows the reference's dirty-data injection produces: empty
  * strings, whitespace, accented domain values, future dates, negative
  * amounts, unparseable dates. */
class CleanseSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): Any = {
    val df = Seq(Option(input)).toDF("x")
    df.select(c.as("y")).collect()(0).get(0)
  }

  test("E1 titleCase: trim + title, empty/whitespace -> null") {
    assert(one(titleCase($"x"), "  hola mundo  ") == "Hola Mundo")
    assert(one(titleCase($"x"), "") == null)
    assert(one(titleCase($"x"), "   ") == null)
    assert(one(titleCase($"x"), null) == null)
    assert(one(titleCase($"x"), "GOLD") == "Gold")
    // documented deviation (SURVEY §7.4.1): initcap word-start semantics
    assert(one(titleCase($"x"), "o'brien smith") == "O'brien Smith")
  }

  test("E1 titleCase handles accented domain values") {
    assert(one(titleCase($"x"), "daños por clima") == "Daños Por Clima")
    assert(one(titleCase($"x"), "básica") == "Básica")
    assert(one(titleCase($"x"), "colisión ") == "Colisión")
  }

  test("E1 titleCasePy reproduces Python str.title() exactly") {
    // expected values computed with CPython; boundaries are ANY uncased
    // char (apostrophe, hyphen, digit), unlike initcap's whitespace-only
    assert(one(titleCasePy($"x"), "o'brien smith") == "O'Brien Smith")
    assert(one(titleCasePy($"x"), "abc-def") == "Abc-Def")
    assert(one(titleCasePy($"x"), "DíAZ") == "Díaz")
    assert(one(titleCasePy($"x"), "they'll go") == "They'Ll Go")
    assert(one(titleCasePy($"x"), "abc3de") == "Abc3De")
    assert(one(titleCasePy($"x"), "ñoño pérez-garcía") == "Ñoño Pérez-García")
    // Other_Lowercase chars (º ª) are CASED in Python — not word breaks:
    // CPython: "piso 1ºa dcha".title() == "Piso 1ºa Dcha" (NOT "1ºA")
    assert(one(titleCasePy($"x"), "piso 1ºa dcha") == "Piso 1ºa Dcha")
    assert(one(titleCasePy($"x"), "mª carmen") == "Mª Carmen")
    assert(one(titleCasePy($"x"), "  hola mundo  ") == "Hola Mundo")
    assert(one(titleCasePy($"x"), "GOLD") == "Gold")
    assert(one(titleCasePy($"x"), "daños por clima") == "Daños Por Clima")
    assert(one(titleCasePy($"x"), "") == null)
    assert(one(titleCasePy($"x"), "   ") == null)
    assert(one(titleCasePy($"x"), null) == null)
  }

  test("E8-E10 domainWhitelistPy: titled garbage still nulls out") {
    assert(one(domainWhitelistPy($"x", Seq("Básica", "Intermedia", "Premium")),
      "básica") == "Básica")
    assert(one(domainWhitelistPy($"x", Seq("Básica", "Intermedia", "Premium")),
      "premium-plus") == null) // titles to Premium-Plus, not whitelisted
    assert(one(domainWhitelistPy($"x", Seq("Daños Por Clima")),
      " daños por clima ") == "Daños Por Clima")
  }

  test("E2 upperTrim: IBAN normalization") {
    assert(one(upperTrim($"x"), " es9121000418450200051332 ") ==
      "ES9121000418450200051332")
    assert(one(upperTrim($"x"), "") == null)
  }

  test("E3 validEmail keeps matches, nulls the rest") {
    assert(one(validEmail($"x"), "a.b+c@example.com") == "a.b+c@example.com")
    assert(one(validEmail($"x"), "John@Ex.Com") == "John@Ex.Com")
    assert(one(validEmail($"x"), "not-an-email") == null)
    assert(one(validEmail($"x"), "x@y") == null)          // no TLD
    assert(one(validEmail($"x"), "x@bad_domain") == null) // underscore domain
    assert(one(validEmail($"x"), null) == null)
  }

  test("E4 normalizePhone strips all but digits/+/-") {
    assert(one(normalizePhone($"x"), "(+34) 612-345 678") == "+34612-345678")
    assert(one(normalizePhone($"x"), "ext.") == null) // nothing left -> null
    assert(one(normalizePhone($"x"), "") == null)
  }

  test("E6 validRange nulls out-of-range, casts to int") {
    val df = Seq(Some(1899), Some(1900), Some(2024), Some(2030), None).toDF("x")
    val got = df.select(validRange($"x", 1900, 2024).as("y")).collect().map(_.get(0))
    assert(got.toSeq == Seq(null, 1900, 2024, null, null))
  }

  test("E7 normalizePlate uppercases and strips punctuation/space") {
    assert(one(normalizePlate($"x"), "1234 -bcd") == "1234BCD")
    assert(one(normalizePlate($"x"), "??--  ") == null)
  }

  test("E8-E10 domainWhitelist title-cases then whitelists") {
    val dom = Seq("Básica", "Intermedia", "Premium")
    assert(one(domainWhitelist($"x", dom), " básica ") == "Básica")
    assert(one(domainWhitelist($"x", dom), "premium") == "Premium")
    assert(one(domainWhitelist($"x", dom), "unknown") == null)
    assert(one(domainWhitelist($"x", dom), "") == null)
  }

  test("E11 positiveRound2: non-positive -> null, else round(2)") {
    val df = Seq(Some(12.345), Some(-3.0), Some(0.0), None).toDF("x")
    val got = df.select(positiveRound2($"x").as("y")).collect().map(_.get(0))
    assert(got.toSeq == Seq(12.35, null, null, null))
  }

  test("E12 validDateUpTo nulls the 2030-01-01 future sentinel") {
    val asOf = "2026-01-01 00:00:00"
    assert(one(date_format(validDateUpTo($"x", asOf), "yyyy-MM-dd"), "2024-05-17") == "2024-05-17")
    assert(one(validDateUpTo($"x", asOf), "2030-01-01") == null)
    assert(one(validDateUpTo($"x", asOf), null) == null)
  }

  test("E13 coerceLenient: unparseable -> null (no ANSI throw)") {
    assert(one(coerceLenient($"x"), "garbage") == null)
    assert(one(coerceLenient($"x"), "2024-02-29 10:00:00") != null)
  }

  test("A7 safeDiv: null instead of inf/NaN on zero/null denominator") {
    val df = Seq((1.0, 0.0), (1.0, 2.0)).toDF("a", "b")
    val got = df.select(safeDiv($"a", $"b").as("y")).collect().map(_.get(0))
    assert(got.toSeq == Seq(null, 0.5))
  }

  test("cleansing is idempotent (clean . clean = clean)") {
    val inputs = Seq("  hola mundo  ", "GOLD", "o'brien", "básica", "", "a b  c")
    for (in <- inputs) {
      val once = one(titleCase($"x"), in)
      val twice = if (once == null) null
        else one(titleCase($"x"), once.asInstanceOf[String])
      assert(twice == once, s"titleCase not idempotent on '$in'")
    }
  }
}
