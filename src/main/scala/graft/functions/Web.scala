package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus text plumbing: HTML stripping and URL dissection — the
  * first normalization pass of any web-crawl training-data pipeline
  * (the reference's cleansing layer does the same job for CRM strings:
  * /root/reference/scripts/silver/load_silver.py:40-78; this is the
  * web-scale analogue from the extension surface, SURVEY.md §2.10).
  *
  * Engine-portability discipline (the [[Cleanse]] / oracle rules):
  * every regex here must mean the same thing to Java's engine (Spark)
  * and RE2 (DuckDB) — so NO backreferences (RE2 has none; script and
  * style blocks get one pattern each instead of `</\1>`), only inline
  * `(?is)` flags (both engines), `[^>]*` tag bodies (no dot-newline
  * ambiguity), and non-greedy `.*?` (supported by both). Entity
  * decoding is plain `replace`, not regex. All pure Column expressions:
  * narrow, codegen'd, zero shuffles.
  */
object Web {

  /** Strip HTML to visible text: drop script/style blocks WITH their
    * contents (a tag-only strip would leak javascript into the corpus),
    * drop comments, drop every remaining tag, decode the six entities
    * that dominate real crawl text, collapse whitespace runs, trim.
    * Order matters and is part of the contract: blocks → comments →
    * tags → entities (entity decode LAST, so `&lt;script&gt;` in user
    * text can never resurrect as a live tag and get stripped). */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (col0, (ent, ch)) =>
        call_function("replace", col0, lit(ent), lit(ch))
      }
    // explicit whitespace class, NOT \s: Java's \s includes vertical
    // tab \x0B, RE2's (the oracle engine) does not — the one divergent
    // byte is spelled into the class so both engines collapse it
    trim(regexp_replace(decoded, "[ \\t\\n\\r\\f\\x0B]+", " "))
  }

  /** Scheme-and-authority matcher shared by the URL parts: scheme is
    * `[a-z][a-z0-9+.-]*` per RFC 3986, authority is everything up to
    * the first `/`, `?` or `#`. */
  private val SchemeAuth = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"

  /** Hostname of a URL (authority minus userinfo and port), lowercased:
    * `https://User@WWW.Ex.org:8080/p?q` → `www.ex.org`. Empty string
    * when the value does not parse as a URL (regexp_extract's no-match
    * result — callers filter or treat empty as invalid). */
  def urlHost(c: Column): Column =
    lower(regexp_extract(regexp_extract(c, SchemeAuth, 1),
      "^(?:[^@]*@)?([^:]+)", 1))

  /** Registered domain: the last two dot-labels of the host
    * (`a.b.news.example.org` → `example.org`). A public-suffix list
    * would refine multi-label TLDs (`.co.uk`); two labels is the
    * standard dependency-free approximation and is what the dedup /
    * per-domain-quota operators key on. Hosts without a dot (e.g.
    * `localhost`) return themselves. */
  def urlDomain(c: Column): Column = {
    val host = urlHost(c)
    when(host.contains("."),
      regexp_extract(host, "([^.]+\\.[^.]+)$", 1)).otherwise(host)
  }

  /** Path component (no query/fragment): `https://h/a/b?q#f` → `/a/b`;
    * a bare authority (`https://h`) yields the empty string. */
  def urlPath(c: Column): Column =
    regexp_extract(c, SchemeAuth + "([^?#]*)", 2)

  /** Path depth = number of non-empty `/`-separated segments:
    * `/a/b/c` → 3, `/` and `` → 0. Size of the filtered split — no
    * regex count tricks, so the oracle can mirror it with
    * len(list_filter(...)). */
  def urlPathDepth(c: Column): Column =
    size(filter(split(urlPath(c), "/"), s => s =!= ""))

  /** URL with query string and fragment stripped — the canonical form
    * crawl dedup keys on (two fetches of the same page differing only
    * in `?utm_source=...` are the same document). */
  def urlStrip(c: Column): Column = regexp_extract(c, "^([^?#]+)", 1)
}
