package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for multilingual corpus preparation —
  * the pass every web-scale pipeline runs before tokenization and
  * hashing-based dedup, because the SAME visible text arrives from
  * different sources in different code-point sequences:
  *
  *   - [[UnicodeNorm.nfc]]: canonical composition (NFC). "é" as
  *     U+0065 U+0301 (decomposed) and U+00E9 (precomposed) hash
  *     differently, split tokens differently, and defeat exact dedup
  *     until normalized to one form.
  *   - [[UnicodeNorm.stripAccents]]: NFD decomposition with combining
  *     marks removed — the aggressive fold used for matching/joining
  *     keys (search-style recall over accent variance).
  *
  * Spark ships neither as a SQL function, so both are native codegen'd
  * `UnaryExpression`s (not UDFs): the JDK `java.text.Normalizer` call
  * runs inside whole-stage codegen with no row materialization or
  * boxing, and ASCII-only strings short-circuit without allocating
  * (`Normalizer.isNormalized` is O(n) with no copy; the overwhelming
  * majority of crawl bytes are ASCII, so the common path is a scan).
  *
  * Determinism: Unicode normalization is fully specified by the UCD —
  * unlike deflate byte counts there is no encoder freedom — so results
  * hash-check cross-engine against DuckDB's `nfc_normalize` /
  * `strip_accents` (both engines implement the same Unicode algorithm).
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.toNfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.toNfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

case class StripAccentsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.removeAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.removeAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccentsExpr =
    copy(child = newChild)
}

object UnicodeNorm {

  /** Column API: canonical-composition (NFC) normalization. */
  def nfc(text: Column): Column =
    ColumnOps.toColumn(NfcNormalizeExpr(ColumnOps.toExpr(text)))

  /** Column API: accent fold — NFD then combining marks removed. */
  def stripAccents(text: Column): Column =
    ColumnOps.toColumn(StripAccentsExpr(ColumnOps.toExpr(text)))

  /** Hot path shared by interpreted eval and generated code. The
    * already-normalized check avoids the String round-trip for ASCII
    * (and any pre-normalized) input.
    */
  def toNfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** NFD + drop all mark code points — categories Mn (non-spacing),
    * Mc (spacing combining), and Me (enclosing), the same set DuckDB's
    * `strip_accents` removes via utf8proc's STRIPMARK (probed: Mn
    * U+0301, Mc U+093E, Me U+20DD all stripped). Code-point-wise, not
    * char-wise, so astral-plane marks (e.g. U+1D165 musical combining
    * stem) are classified correctly instead of as surrogate halves.
    */
  def removeAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val decomposed = Normalizer.normalize(str, Normalizer.Form.NFD)
    var i = 0
    var hasMark = false
    while (i < decomposed.length && !hasMark) {
      val cp = decomposed.codePointAt(i)
      if (isMark(cp)) hasMark = true
      i += Character.charCount(cp)
    }
    if (!hasMark && (decomposed eq str)) s
    else {
      val sb = new java.lang.StringBuilder(decomposed.length)
      var j = 0
      while (j < decomposed.length) {
        val cp = decomposed.codePointAt(j)
        if (!isMark(cp)) sb.appendCodePoint(cp)
        j += Character.charCount(cp)
      }
      UTF8String.fromString(sb.toString)
    }
  }

  private def isMark(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.NON_SPACING_MARK ||
      t == Character.COMBINING_SPACING_MARK ||
      t == Character.ENCLOSING_MARK
  }
}
