package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Squared Euclidean distance of two `array<double>` columns as a
  * native Catalyst expression — the [[CosineSimExpr]] discipline
  * applied to the clustering/PQ inner loop.
  *
  * Semantically identical to the declarative form
  * (`aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_)`, kept
  * as `Clustering.sqDistHof`): the loop subtracts, squares, and
  * accumulates in the same index order with the same double
  * operations, so results are bit-identical and the DuckDB oracles are
  * unaffected. Null semantics replicate the HOF exactly: a length
  * mismatch (zip_with pads with nulls) or any null element poisons the
  * fold to NULL; two empty arrays fold to the 0.0 seed.
  *
  * Why custom machinery: higher-order functions are CodegenFallback —
  * the HOF spelling ran one interpreted `Expression.eval` dispatch per
  * (vector, centroid) pair, allocating a zipped struct array each (the
  * q_gram lesson, here at N·k·iters scale in every Lloyd assign and
  * every ADC LUT build). The native loop reads both unsafe arrays once
  * and fuses into whole-stage codegen.
  */
case class SqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_dist"

  override def nullSafeEval(a: Any, b: Any): Any =
    SqDist.sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("sqd")
      s"""
         |java.lang.Double $r = graft.functions.SqDist.sq($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistExpr =
    copy(left = newLeft, right = newRight)
}

object SqDist {

  /** Column API entry point. */
  def sq(a: Column, b: Column): Column =
    ColumnOps.toColumn(SqDistExpr(ColumnOps.toExpr(a), ColumnOps.toExpr(b)))

  /** One pass over both arrays, accumulation in index order — the same
    * IEEE operation sequence as the declarative left fold. Boxed
    * return because the fold's null semantics survive: length mismatch
    * or any null element is NULL, empty inputs are the 0.0 seed.
    */
  def sq(a: ArrayData, b: ArrayData): java.lang.Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na != nb) return null
    var s = 0.0
    var i = 0
    while (i < na) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}
