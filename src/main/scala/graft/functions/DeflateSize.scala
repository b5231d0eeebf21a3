package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-compressed size of a string — the engine primitive behind the
  * compression-ratio quality signal used by production LLM data
  * pipelines (near-constant boilerplate, template spam, and generated
  * gibberish all have anomalous compressed/raw ratios; cf. the
  * Gopher/Dolma/RefinedWeb filter families, which pair repetition
  * heuristics with exactly this signal).
  *
  * A native codegen'd expression, not a UDF: the hot loop is one
  * `Deflater` pass over the document bytes inside whole-stage codegen —
  * no row materialization, no boxing. The deflater is thread-local
  * (Deflater instances are stateful and expensive to allocate per row).
  *
  * Determinism: RFC 1951 fixes the format but not the encoder's choices
  * — the byte count depends on the zlib build behind
  * `java.util.zip`. It is stable for a given JVM on identical input
  * (level pinned, strategy default, no dictionary), so ScalaTest
  * property specs pin exact values per fixture, but the gate treats
  * ratio queries as rows-only (SURVEY.md §5.3's engine-specific class —
  * same policy as the HLL registers).
  */
case class DeflateSizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_size"

  override def nullSafeEval(input: Any): Any =
    DeflateSize.size(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateSize.size($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateSizeExpr =
    copy(child = newChild)
}

object DeflateSize {

  /** Column API entry point: deflate-compressed byte count of a string
    * column (level 6, raw deflate, no header).
    */
  def deflateSize(text: Column): Column =
    ColumnOps.toColumn(DeflateSizeExpr(ColumnOps.toExpr(text)))

  /** Compression ratio = compressed bytes / raw UTF-8 bytes. ≈1 for
    * incompressible (random) text, →0 for degenerate repetition; empty
    * strings report 1.0 (nothing to judge).
    */
  def compressionRatio(text: Column): Column = {
    val raw = octet_length(text).cast("double")
    when(raw === 0.0, lit(1.0))
      .otherwise(deflateSize(text).cast("double") / raw)
  }

  private val Local = ThreadLocal.withInitial[Deflater](() =>
    new Deflater(6, true)) // raw deflate: no zlib header/checksum bytes

  private val Sink = ThreadLocal.withInitial[Array[Byte]](() =>
    new Array[Byte](64 * 1024))

  /** Hot loop shared by interpreted eval and generated code: one
    * deflate pass, counting output bytes into a reused scratch buffer
    * (the bytes themselves are discarded).
    */
  def size(s: UTF8String): Int = {
    val d = Local.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val sink = Sink.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(sink)
    total.toInt
  }
}
