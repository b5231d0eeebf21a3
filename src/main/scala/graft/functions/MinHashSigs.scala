package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass k-permutation MinHash signature over a shingle array:
  * `sig_i = min_s md5(s || '#' || i)` as 32-char hex — the exact values
  * the relational spelling (explode → k partial-min aggregates,
  * [[graft.ops.Dedup.minhashSignatures]]) computes, as a single narrow
  * per-row projection.
  *
  * Why custom Catalyst machinery (SURVEY.md §7.4 ladder): the
  * relational form must explode every shingle occurrence and run a
  * k-column hash aggregate — at corpus scale that is an exchange
  * carrying docs × k × 33 bytes and an aggregation-buffer pass over
  * every shingle row. This expression keeps the whole signature inside
  * whole-stage codegen: one loop over the (already materialized) unsafe
  * array, digests compared as raw bytes (hex order ≡ unsigned byte
  * order — '0'-'9' < 'a'-'f' is monotone in the nibble), hex-encoded
  * once per winner at the end. Built-in HOFs cannot express it
  * efficiently: lambdas are interpreted and re-evaluate inlined
  * arguments per element (the documented 30× penalty at
  * `Dedup.shingleTable`).
  *
  * Null/empty contract: a null or EMPTY shingle array yields a null
  * signature row — mirroring the relational form, where a doc with no
  * shingles simply never reaches the group-by.
  */
case class MinHashSigsExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    MinHashSigs.sigs(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSigs.sigs($c, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashSigsExpr =
    copy(child = newChild)
}

object MinHashSigs {

  /** Column API: array of k hex signature strings (null if no shingles). */
  def minhashSigs(shingles: Column, k: Int): Column =
    ColumnOps.toColumn(MinHashSigsExpr(ColumnOps.toExpr(shingles), k))

  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private val HexDigits = "0123456789abcdef".getBytes

  /** Hot loop shared by interpreted eval and generated code. Returns
    * null for an empty array (no shingles ⇒ no signature row).
    */
  def sigs(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val md = Md5.get()
    val suffixes = new Array[Array[Byte]](k)
    var i = 0
    while (i < k) { suffixes(i) = ("#" + i).getBytes; i += 1 }
    val mins = new Array[Array[Byte]](k)
    var s = 0
    while (s < n) {
      if (!shingles.isNullAt(s)) {
        val sb = shingles.getUTF8String(s).getBytes
        var p = 0
        while (p < k) {
          md.reset()
          md.update(sb)
          md.update(suffixes(p))
          val d = md.digest()
          if (mins(p) == null || unsignedLess(d, mins(p))) mins(p) = d
          p += 1
        }
      }
      s += 1
    }
    if (mins(0) == null) return null // all-null shingle entries
    val out = new Array[AnyRef](k)
    var p = 0
    while (p < k) { out(p) = UTF8String.fromBytes(hex(mins(p))); p += 1 }
    new GenericArrayData(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexDigits((d(i) & 0xf0) >>> 4)
      out(2 * i + 1) = HexDigits(d(i) & 0x0f)
      i += 1
    }
    out
  }
}
