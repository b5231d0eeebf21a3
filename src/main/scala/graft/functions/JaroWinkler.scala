package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native codegen'd Catalyst
  * expression — Spark ships `levenshtein` but not Jaro–Winkler, and the
  * record-linkage scoring pass evaluates it on every blocked candidate
  * pair, so it belongs in whole-stage codegen rather than a Scala UDF
  * (the [[CosineSim]] rationale).
  *
  * Algorithm: standard Jaro (match window ⌊max(|a|,|b|)/2⌋−1,
  * transpositions as half the out-of-order matches) with the Winkler
  * prefix boost `jw = j + ℓ·0.1·(1−j)` applied only when j > 0.7, with
  * common-prefix length ℓ capped at 4 — the same constants and boost
  * condition as DuckDB's `jaro_winkler_similarity` (rapidfuzz), which
  * the q_jaro gate hash-checks against on the full distinct-name pair
  * matrix. Matching runs over UTF-16 code units; identical to code
  * points on BMP text (the corpus is ASCII).
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Column API entry point. */
  def jw(a: Column, b: Column): Column =
    ColumnOps.toColumn(JaroWinklerExpr(ColumnOps.toExpr(a), ColumnOps.toExpr(b)))

  private val PrefixScale = 0.1
  private val MaxPrefix = 4
  private val BoostThreshold = 0.7

  /** Jaro similarity in [0, 1]. Any empty side — including BOTH empty —
    * scores 0.0, and the transposition term uses integer floor
    * (`(m − ⌊t/2⌋)/m`): DuckDB/rapidfuzz conventions, validated
    * pairwise against `jaro_winkler_similarity` over the full
    * 77-name × 77-name matrix incl. crafted odd-transposition and
    * empty/prefix edge cases (0/5929 mismatches).
    */
  def jaro(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatched(j) && a.charAt(i) == b.charAt(j)) {
          aMatched(i) = true
          bMatched(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of a vs matched chars of b in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / la + md / lb + (md - t / 2) / md) / 3.0
  }

  /** Jaro–Winkler: prefix-boosted Jaro, DuckDB-compatible constants. */
  def similarity(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= BoostThreshold) return j
    var l = 0
    val n = math.min(math.min(a.length, b.length), MaxPrefix)
    while (l < n && a.charAt(l) == b.charAt(l)) l += 1
    j + l * PrefixScale * (1.0 - j)
  }
}
