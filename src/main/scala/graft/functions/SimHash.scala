package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array — the near-dup fingerprint whose
  * Hamming distance approximates cosine distance of the token multiset
  * (Charikar 2002, "Similarity estimation techniques from rounding
  * algorithms").
  *
  * Implemented as a native Catalyst expression (not a UDF) so it
  * participates in whole-stage codegen: `doGenCode` emits a direct static
  * call on the unsafe array data, no row materialization, no boxing. Per
  * the LLM-pipeline extension plan (SURVEY.md §7.4) this is one of the
  * few operators that genuinely warrants custom Catalyst machinery —
  * a 64-bit-accumulator loop per token is not expressible efficiently
  * with built-in higher-order functions.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64 {

  /** Column API entry point. */
  def simhash64(tokens: Column): Column =
    ColumnOps.toColumn(SimHash64Expr(ColumnOps.toExpr(tokens)))

  /** Hot loop shared by interpreted eval and generated code. */
  def hash(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Deterministic 64-bit token hash: the first 8 bytes (big-endian) of
    * the token's MD5 — i.e. the value spelled by the first 16 hex chars
    * of `md5(token)` in any engine. Stable across JVMs and Spark
    * versions, and (deliberately) re-keyed on md5 like the MinHash
    * "permutations" so the whole SimHash is cross-engine checkable: the
    * DuckDB oracle recomputes it from `md5(token)` per bit.
    */
  def hash64(s: UTF8String): Long = {
    val md = Md5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** Hamming distance between two simhashes (for near-dup thresholds). */
  def hamming(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.bit_count
    bit_count(a.bitwiseXOR(b))
  }
}
