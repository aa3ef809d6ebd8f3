package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column library (SURVEY.md §2.10): tokenization, shingles,
  * quality signals, language-ID heuristic, fingerprinting. All pure
  * Column expressions (codegen-friendly, no UDFs), each with an exact
  * ANSI-SQL equivalent so the DuckDB oracle can replay them.
  */
object Text {

  /** Whitespace tokens. Single-space-delimited corpora round-trip exactly;
    * uses a plain-space split to stay bit-compatible with the SQL oracle's
    * string_split. */
  def tokens(c: Column): Column = split(c, " ")

  /** Lowercase, strip non [a-z0-9 ], collapse whitespace runs, trim —
    * canonical form for normalized dedup / fingerprinting. */
  def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** Word n-gram shingles (distinct). Guarded: Spark's sequence(1, n) is
    * DESCENDING for n<1, so short docs explicitly yield an empty array. */
  def wordShingles(c: Column, n: Int): Column = {
    val w = tokens(c)
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Row-exploded distinct word shingles via the native
    * [[graft.plans.WordShingleGenerator]] — use instead of
    * `explode(wordShingles(...))` on hot paths (same rows, ~20× faster
    * shingle construction). */
  def explodeWordShingles(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.plans.WordShingleGenerator(ColumnBridge.expression(c), n))
  }

  /** Row-exploded POSITIONAL word shingles — (pos, sh) for every
    * occurrence in order, via the native
    * [[graft.plans.PositionalShingleGenerator]]. For position-sensitive
    * operators (winnowing); the distinct form above is for set-semantics
    * dedup. */
  def explodePositionalShingles(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.plans.PositionalShingleGenerator(ColumnBridge.expression(c), n))
  }

  /** Jaro-Winkler similarity via the native codegen
    * [[graft.plans.JaroWinkler]] — the record-linkage scorer (bit-locked
    * to DuckDB's independent implementation; see the expression's
    * scaladoc for the exact semantics). */
  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** NFC Unicode composition via [[graft.plans.NfcUnicode]] — byte
    * equality ⇔ text equality for exact dedup keys. */
  def nfcUnicode(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.NfcUnicode(ColumnBridge.expression(c)))
  }

  /** Accent folding (NFD − combining marks) via
    * [[graft.plans.StripAccents]] — DuckDB strip_accents semantics. */
  def stripAccents(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.StripAccents(ColumnBridge.expression(c)))
  }

  /** Character k-gram shingles (distinct) — the classic MinHash input. */
  def charShingles(c: Column, k: Int): Column =
    when(length(c) >= k,
      array_distinct(transform(sequence(lit(1), length(c) - (k - 1)),
        i => c.substr(i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** Whitespace token count. */
  def tokenCountWs(c: Column): Column = size(tokens(c))

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * marks each count as one token (regex-subword approximation). */
  val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCountBpe(c: Column): Column = regexp_count(c, lit(bpePattern))

  /** Count of tokens that appear in a marker vocabulary. */
  def markerCount(c: Column, markers: Seq[String]): Column =
    size(filter(tokens(c), t => t.isin(markers.map(m => lit(m)): _*)))

  /** Language marker vocabularies for the n-gram/stopword heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "es" -> Seq("el", "la", "de", "que", "los", "por", "con"),
    "fr" -> Seq("le", "les", "et", "des", "une", "dans", "pour"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"))

  /** Non-ASCII character ratio (CJK detector). */
  def nonAsciiRatio(c: Column): Column =
    length(regexp_replace(c, "[\\x00-\\x7F]", "")).cast("double") /
      greatest(length(c), lit(1)).cast("double")

  /** Heuristic language ID: CJK by non-ASCII density, else argmax of
    * per-language stopword counts with a fixed priority tie-break
    * (es > fr > de, English default). Deterministic; oracle replays the
    * identical CASE ladder. */
  def langId(c: Column): Column = {
    val m = langMarkers.toMap
    val es = markerCount(c, m("es"))
    val fr = markerCount(c, m("fr"))
    val de = markerCount(c, m("de"))
    val en = markerCount(c, m("en"))
    when(nonAsciiRatio(c) > 0.3, lit("zh"))
      .when(es > en && es >= fr && es >= de, lit("es"))
      .when(fr > en && fr > es && fr >= de, lit("fr"))
      .when(de > en && de > es && de > fr, lit("de"))
      .otherwise(lit("en"))
  }

  /** Punctuation character ratio. */
  def punctRatio(c: Column): Column =
    length(regexp_replace(c, "[^!-/:-@\\[-`{-~]", "")).cast("double") /
      greatest(length(c), lit(1)).cast("double")

  /** English stopword ratio over whitespace tokens. */
  def stopwordRatio(c: Column): Column =
    markerCount(c, langMarkers.toMap.apply("en")).cast("double") /
      greatest(tokenCountWs(c), lit(1)).cast("double")

  /** Mean token length (chars minus spaces over token count). */
  def avgTokenLen(c: Column): Column =
    (length(c) - (tokenCountWs(c) - lit(1))).cast("double") /
      greatest(tokenCountWs(c), lit(1)).cast("double")

  /** PII patterns, shared VERBATIM with the SQL oracle (string-identical
    * pattern constants — Java regex and RE2 agree on this construct
    * subset: explicit char classes, counted repetition, no backrefs or
    * lookaround). Replacement order matters and is fixed:
    * email → IP → phone (an IP's digit runs must not be half-eaten by
    * the looser phone pattern first). */
  val piiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiIpRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val piiPhoneRe = "\\+?[0-9][0-9()\\-\\s]{7,}[0-9]"

  /** Scrub emails / IPs / phone numbers to typed placeholder tokens —
    * the standard PII-redaction pass a training corpus gets before
    * anything else reads it. Pure codegen'd regexp_replace chain. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, piiEmailRe, "<EMAIL>"),
        piiIpRe, "<IP>"),
      piiPhoneRe, "<PHONE>")

  /** Composite quality score in [0,1]: long enough, not punctuation soup,
    * some stopword mass, sane word lengths. Pure arithmetic on the
    * signals above — deterministic across engines. */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / 500.0, lit(1.0))
    val punctOk = lit(1.0) - least(punctRatio(c) * 5.0, lit(1.0))
    val stopOk = least(stopwordRatio(c) * 4.0, lit(1.0))
    val wordOk = when(avgTokenLen(c).between(3.0, 10.0), 1.0).otherwise(0.5)
    lenScore * 0.3 + punctOk * 0.2 + stopOk * 0.3 + wordOk * 0.2
  }

  /** Content fingerprint: md5 of the normalized text (md5 agrees across
    * Spark and DuckDB, so exact-oracle-able). */
  def fingerprintMd5(c: Column): Column = md5(normText(c))

  /** Misra-Gries heavy-hitters aggregate (≤ k counters, mergeable):
    * `map<term, approx_count>` — see [[graft.plans.MisraGriesAgg]] for
    * the guarantee. Approximate by design → rows-only, ScalaTest-bounded
    * against exact counts. */
  def approxTopTerms(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.MisraGriesAgg(
      ColumnBridge.expression(c), k).toAggregateExpression())
  }

  /** Rolling polynomial fingerprint (Rabin-Karp style) over the normalized
    * text's characters: h = (h*31 + code) mod 1e9+7. Folded with
    * aggregate() so it stays a Column expression; pmod keeps the
    * accumulator small (Spark 4 ANSI would throw on silent long overflow). */
  def fingerprintRolling(c: Column): Column =
    aggregate(
      transform(split(normText(c), ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, code) => pmod(acc * 31L + code, lit(1000000007L)))
}
