package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Faithful Python `str.title()` — the reference's title-casing primitive
  * (/root/reference/scripts/silver/load_silver.py:69-71 applies
  * `.strip().title()` to every text column).
  *
  * Python semantics, which Spark's `initcap` does NOT match: a character
  * is "cased" iff it has the Unicode Lowercase or Uppercase property or
  * is titlecase (CPython's definition — includes Other_Lowercase marks
  * like º/ª/ʰ, not just Lu/Ll/Lt); each cased char that FOLLOWS a cased
  * char is lowercased, every other cased char is titlecased. So
  * word boundaries are any uncased char — apostrophes, hyphens, digits —
  * not just whitespace: `o'brien`→`O'Brien`, `abc-def`→`Abc-Def`,
  * `abc3de`→`Abc3De`, `they'll`→`They'Ll` (the Python quirk included),
  * where initcap yields `O'brien`/`Abc-def`/`Abc3de`/`They'll`.
  *
  * Known deviation (documented, not data-reachable in the corpus): Java's
  * `Character.toTitleCase`/`toLowerCase` are 1:1 simple mappings, Python
  * uses full mappings — `ß`.title() expands to `Ss` in Python but stays
  * `ß` here. Only word-INITIAL chars hit the title mapping and no fixture
  * word starts with such a char.
  *
  * Codegen: a single static call — stays inside whole-stage codegen like
  * every other silver cleansing expression (no UDF serialization wall).
  */
case class TitleCasePy(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = StringType

  // ImplicitCastInputTypes (not a hand-rolled check) so SQL-typed inputs
  // coerce like any built-in — `graft_title_py(NULL)` included.
  // (AbstractDataType is private[sql]; the inferred Seq[DataType] conforms.)
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(s: Any): Any =
    PyString.title(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PyString.title($c)")

  override protected def withNewChildInternal(newChild: Expression): TitleCasePy =
    copy(child = newChild)
}

/** Static helpers called from generated code (object WITHOUT a companion
  * class, so Scala emits true static forwarders Janino can link). */
object PyString {

  /** Python's "cased" = Lowercase property ∪ Uppercase property ∪ Lt.
    * Java's isLowerCase/isUpperCase include the contributory
    * Other_Lowercase/Other_Uppercase properties (º ª ʰ Ⅰ …), exactly like
    * CPython — a category-only (Lu/Ll/Lt) check would wrongly treat 'º'
    * as a word boundary ("nºa" must title to "Nºa", not "NºA"). */
  private def isCased(cp: Int): Boolean =
    Character.isLowerCase(cp) || Character.isUpperCase(cp) ||
      Character.getType(cp) == Character.TITLECASE_LETTER

  def title(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var prevCased = false
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val cased = isCased(cp)
      sb.appendCodePoint(
        if (cased && !prevCased) Character.toTitleCase(cp)
        else if (cased) Character.toLowerCase(cp)
        else cp)
      prevCased = cased
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}
