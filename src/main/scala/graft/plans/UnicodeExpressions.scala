package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for corpus ingest — the step every
  * multilingual pipeline runs before tokenization/dedup, and one Spark
  * has no built-in for (`initcap`/`lower` are case ops, not
  * normalization). Two canonical forms:
  *
  *  - [[NfcUnicode]]: NFC canonical composition (é as e+◌́ → é as one
  *    codepoint) — makes byte-equality mean text-equality, which exact
  *    dedup and groupBy-on-content silently require;
  *  - [[StripAccents]]: NFD decomposition with combining marks (\p{Mn})
  *    removed — the accent-folding used for fuzzy matching and
  *    search keys (same semantics as DuckDB's strip_accents, which the
  *    oracle replays).
  *
  * Both are single static calls in generated code — they stay inside
  * whole-stage codegen like the rest of the cleansing library. ASCII
  * fast path: `Normalizer.isNormalized` is O(n) with no allocation, so
  * the overwhelmingly-ASCII corpus pays ~nothing.
  */
case class NfcUnicode(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(s: Any): Any =
    UnicodeNorm.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.UnicodeNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcUnicode =
    copy(child = newChild)
}

case class StripAccents(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(s: Any): Any =
    UnicodeNorm.stripAccents(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.UnicodeNorm.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

/** Static helpers for generated code (object without companion class →
  * true static forwarders for Janino). */
object UnicodeNorm {

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  private val combiningMarks = "\\p{Mn}+".r

  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    // decompose, drop combining marks, recompose what's left (ligature-
    // style decompositions such as ǆ → d+ž partially recombine; plain
    // Latin diacritics reduce to their base letters)
    val stripped = combiningMarks.replaceAllIn(
      Normalizer.normalize(str, Normalizer.Form.NFD), "")
    if (stripped == str) s
    else UTF8String.fromString(
      Normalizer.normalize(stripped, Normalizer.Form.NFC))
  }
}
