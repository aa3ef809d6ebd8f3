package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The silver-layer cleansing expression library — SURVEY.md §2.4 (E1–E13).
  *
  * The reference implements every one of these as a row-at-a-time pandas
  * `.apply(lambda)` (/root/reference/scripts/silver/load_silver.py:55-221).
  * Here each is a pure `Column => Column` built from Catalyst built-ins, so
  * every cleansing step stays inside whole-stage codegen — no UDFs, no
  * serialization boundary, columnar parquet scan underneath. At 100 TB these
  * run as a single narrow Project stage with predicate/column pushdown.
  *
  * Deliberate, documented deviations from the reference (SURVEY.md §7.4):
  *  - titleCase uses `initcap` word-start semantics (whitespace boundaries)
  *    rather than Python `str.title()` (any non-alpha boundary).
  *  - Division guards yield null (not inf/NaN) on zero denominators.
  *  - Non-deterministic `datetime.now()` bounds are explicit `asOf` params.
  */
object Cleanse {

  /** Full-whitespace trim. Spark/DuckDB `trim` strips ONLY spaces; Python
    * `.strip()` (the reference semantics) strips tabs/newlines too — and
    * faker addresses contain embedded newlines, so this difference is
    * live data, not theory (caught by PropertySpec). */
  def wsTrim(c: Column): Column =
    regexp_replace(c, "^\\s+|\\s+$", "")

  /** E1/E5 (initcap form): trim + whitespace-word title-case, empty→null.
    * Kept for queries whose oracle wants plain `initcap`; the
    * reference-faithful form is [[titleCasePy]], which the silver
    * pipelines use (load_silver.py:63-79,123-128). */
  def titleCase(c: Column): Column =
    when(length(wsTrim(c)) > 0, initcap(wsTrim(c)))

  /** E1/E5 (faithful form): trim + Python `str.title()` semantics via the
    * custom [[graft.plans.TitleCasePy]] codegen expression — capitalizes
    * after ANY non-cased char (`o'brien`→`O'Brien`), exactly what the
    * reference's pandas `.strip().title()` does. Empty→null as ever. */
  def titleCasePy(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val t = wsTrim(c)
    when(length(t) > 0,
      ColumnBridge.column(graft.plans.TitleCasePy(ColumnBridge.expression(t))))
  }

  /** E2: trim + upper-case, empty→null (IBAN, load_silver.py:82-85). */
  def upperTrim(c: Column): Column =
    when(length(wsTrim(c)) > 0, upper(wsTrim(c)))

  /** E3: email regex validation — keep iff it matches, else null
    * (load_silver.py:88-96, pattern at :92). */
  val emailPattern = "^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$"
  def validEmail(c: Column): Column = when(c.rlike(emailPattern), c)

  /** E4: phone normalization — strip all but digits/+/-, empty→null
    * (load_silver.py:99-107, re.sub at :103). */
  def normalizePhone(c: Column): Column =
    nullif(regexp_replace(c, "[^0-9+\\-]", ""), lit(""))

  /** E6: numeric range validation, out-of-range→null, cast int
    * (year check, load_silver.py:131-134; reference uses datetime.now()
    * as the upper bound — here an explicit asOf parameter). */
  def validRange(c: Column, lo: Int, hi: Int): Column =
    when(c.between(lo, hi), c.cast("int"))

  /** E7: plate normalization — upper, keep only [A-Z0-9], empty→null
    * (load_silver.py:137-143). */
  def normalizePlate(c: Column): Column =
    nullif(regexp_replace(upper(trim(c)), "[^A-Z0-9]", ""), lit(""))

  /** E8/E9/E10: domain whitelist after title-case, else null
    * (load_silver.py:155-164,191-194). */
  def domainWhitelist(c: Column, domain: Seq[String]): Column = {
    val t = titleCase(c)
    when(t.isin(domain: _*), t)
  }

  /** E8/E9/E10 faithful form: whitelist after PYTHON title-casing — what
    * the reference actually computes. Identical output whenever the input
    * has no intra-word boundaries (all whitelist values are plain
    * whitespace-separated words), but garbage inputs title differently
    * and must null out under the same semantics as pandas. */
  def domainWhitelistPy(c: Column, domain: Seq[String]): Column = {
    val t = titleCasePy(c)
    when(t.isin(domain: _*), t)
  }

  /** Domain whitelist on the raw (already-normalized) value. */
  def domainWhitelistRaw(c: Column, domain: Seq[String]): Column =
    when(c.isin(domain: _*), c)

  /** E11: positive-amount check + round(2), non-positive→null
    * (load_silver.py:167-169,197-199,215-217). */
  def positiveRound2(c: Column): Column = when(c > 0, round(c, 2))

  /** E12: date sanity — parse, null out anything after asOf (kills the
    * "2030-01-01" future sentinel, load_silver.py:181-188). */
  def validDateUpTo(c: Column, asOf: String): Column = {
    val t = to_timestamp(c)
    when(t <= to_timestamp(lit(asOf)), t)
  }

  /** E12 variant for columns that are already timestamps. */
  def tsUpTo(c: Column, asOf: String): Column =
    when(c <= to_timestamp(lit(asOf)), c)

  /** E13: lenient date coercion — unparseable → null, matching pandas
    * to_datetime(errors='coerce') (load_silver.py:211). try_to_timestamp
    * (not to_timestamp) so Spark 4's default ANSI mode nulls instead of
    * throwing on garbage input. */
  def coerceLenient(c: Column): Column = try_to_timestamp(c)

  /** E13 with a known format — MUCH cheaper when bad rows are common:
    * the formatless path tries several patterns and builds an exception
    * per failure (~6× slower on a 20%-garbage column at sf0.1). */
  def coerceLenient(c: Column, format: String): Column =
    try_to_timestamp(c, lit(format))

  /** A7 guard: division that yields null instead of inf/NaN when the
    * denominator is zero or null (load_gold.py:134-137; SURVEY §7.4.3). */
  def safeDiv(num: Column, den: Column): Column =
    when(den.isNotNull && den =!= 0, num / den)
}
