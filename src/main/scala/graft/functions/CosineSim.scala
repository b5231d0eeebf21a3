package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine similarity of two `array<float>` columns as a native Catalyst
  * expression (DECISIONS.md #6).
  *
  * Semantically identical to the declarative form
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_) / (sqrt(Σa²)·sqrt(Σb²))`,
  * kept as `Similarity.cosineHof`): the loop accumulates in the same
  * index order with the same double operations, so results are
  * bit-identical — the DuckDB oracle is unaffected.
  *
  * Why custom machinery: the HOF form is interpreted and walks the
  * arrays three times through lambda dispatch; scoring touches every
  * (query, candidate) pair, so at corpus scale this single expression
  * is most of the similarity-search CPU. The native loop reads both
  * unsafe arrays once, fused into whole-stage codegen.
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineSim.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Column API entry point. */
  def cosine(a: Column, b: Column): Column =
    ColumnOps.toColumn(CosineSimExpr(ColumnOps.toExpr(a), ColumnOps.toExpr(b)))

  /** One pass over both arrays, accumulation in index order — the same
    * IEEE operation sequence as the declarative left folds. Dot runs
    * over min(len) (zip_with-with-nulls semantics never arises here:
    * fixtures are fixed-dim); norms run over each array's own length.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = math.min(na, nb)
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    var sa = 0.0
    i = 0
    while (i < na) { val x = a.getFloat(i).toDouble; sa += x * x; i += 1 }
    var sb = 0.0
    i = 0
    while (i < nb) { val x = b.getFloat(i).toDouble; sb += x * x; i += 1 }
    dot / (math.sqrt(sa) * math.sqrt(sb))
  }
}
