package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint via a Karp–Rabin rolling hash
  * (Schleimer/Wilkerson/Aiken 2003, "Winnowing: local algorithms for
  * document fingerprinting"): the minimum of the polynomial hashes of
  * every `window`-byte substring, computed in ONE pass — each step
  * updates the previous hash in O(1) (`h' = h·B + inByte − outByte·B^w`
  * in 2^64 arithmetic) instead of re-hashing the window.
  *
  * Why custom machinery (DECISIONS.md #5): built-in functions can only
  * express per-window re-hashing (O(n·w) work via sequence+transform,
  * interpreted), and no built-in exposes a carry-state scan over bytes.
  * The native expression keeps the O(n) recurrence inside whole-stage
  * codegen.
  *
  * Unlike the min-shingle md5 fingerprint (`TextAnalysis.fingerprints`),
  * this operates on raw bytes — no tokenization — so it is robust to
  * whitespace/formatting differences in the parts of the document away
  * from the minimal window, and it is the classic building block for
  * plagiarism/near-dup detection over code or text.
  */
case class RollingMinHashExpr(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_min_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.winnowedMin(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.winnowedMin($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): RollingMinHashExpr =
    copy(child = newChild)
}

object RollingHash {

  /** Column API entry point. */
  def winnowedMin(text: Column, window: Int = 16): Column =
    ColumnOps.toColumn(RollingMinHashExpr(ColumnOps.toExpr(text), window))

  /** Polynomial base: odd multiplier with good avalanche in 2^64
    * (Knuth's MMIX LCG multiplier).
    */
  val Base = 6364136223846793005L

  /** Min (unsigned) rolling hash over all `w`-byte windows; the plain
    * polynomial hash of the whole string when it is shorter than `w`.
    * One pass, O(1) state — the loop body is branch-light so C2/codegen
    * keep it tight.
    */
  def winnowedMin(s: UTF8String, w: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    if (n <= w) {
      var h = 0L
      var i = 0
      while (i < n) { h = h * Base + (bytes(i) & 0xff); i += 1 }
      return h
    }
    // B^w for the leading-byte removal
    var bw = 1L
    var j = 0
    while (j < w) { bw *= Base; j += 1 }
    var h = 0L
    var i = 0
    while (i < w) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    var min = h
    while (i < n) {
      h = h * Base + (bytes(i) & 0xff) - (bytes(i - w) & 0xff) * bw
      if (java.lang.Long.compareUnsigned(h, min) < 0) min = h
      i += 1
    }
    min
  }
}
