package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Generator emitting one row per DISTINCT word n-gram shingle of a text
  * column — the row-producing form of [[graft.functions.Text.wordShingles]]
  * (first-occurrence order, same distinct set, so downstream aggregates
  * are identical and the DuckDB oracle still matches).
  *
  * Why a custom Generator: `explode(transform(sequence(...), …))` builds
  * the shingle array through interpreted higher-order functions —
  * measured ~12 µs per shingle at sf0.1 (3.2 s for 260 k shingles),
  * 20× the cost of the split itself. This Generator does the sliding
  * window in plain JVM code over the already-split words. Evaluated once
  * per input row (CodegenFallback only skips whole-stage fusion, not
  * per-element re-eval).
  */
case class WordShingleGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("sh", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"WordShingleGenerator needs a string column, got ${child.dataType}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Nil
    // split on single space with limit -1: Spark's split(c, " ") and
    // DuckDB's string_split KEEP trailing empty tokens; Scala's
    // split(Char) drops them, which would diverge on trailing spaces.
    val words = t.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < n) return Nil
    val seen = new java.util.LinkedHashSet[String](words.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= words.length) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val it = seen.iterator()
    new Iterator[InternalRow] {
      override def hasNext: Boolean = it.hasNext
      override def next(): InternalRow =
        InternalRow(UTF8String.fromString(it.next()))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleGenerator =
    copy(child = newChild)
}

/** Generator emitting (pos, sh) for EVERY word n-gram occurrence, in
  * position order — the positional, non-distinct sibling of
  * [[WordShingleGenerator]], for operators where position matters
  * (winnowing fingerprints select a minimum per sliding window of
  * positions, so duplicates and order are semantic, not noise).
  * `pos` is 0-based. Same JVM sliding-window construction — the
  * interpreted `posexplode(transform(sequence(...), …))` form re-proved
  * ~20× slower on the bench corpus.
  */
case class PositionalShingleGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("pos", IntegerType, nullable = false) ::
      StructField("sh", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"PositionalShingleGenerator needs a string column, got ${child.dataType}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Nil
    val words = t.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < n) return Nil
    val m = words.length - n + 1
    val sb = new java.lang.StringBuilder(64)
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i < m
      override def next(): InternalRow = {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(words(i + k))
          k += 1
        }
        val row = InternalRow(i, UTF8String.fromString(sb.toString))
        i += 1
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): PositionalShingleGenerator =
    copy(child = newChild)
}
