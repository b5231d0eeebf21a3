package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Random-hyperplane LSH bucket id for cosine similarity (Charikar 2002)
  * as a native Catalyst expression.
  *
  * Semantics are identical to the declarative form in
  * `graft.ops.Similarity.lshBucketHof` (and to the DuckDB oracle SQL):
  * hyperplane component (j, i) is +1 iff the first hex character of
  * `md5("<j>_<i>")` is < '8', the bucket's bit j is the sign of the
  * projection onto hyperplane j.
  *
  * Why custom machinery (SURVEY.md §4.3 decision log): the higher-order
  * function form is interpreted (no codegen for lambda bodies) and
  * re-evaluates `md5(concat(...))` for every (bit, element) per ROW —
  * `nBits × dim` digest computations per vector, dominating q_sim_lsh.
  * The signs depend only on (bit, element index), so this expression
  * precomputes them once per JVM into a sign table and the per-row work
  * collapses to a branch-free multiply-accumulate over the float array,
  * inlined into whole-stage codegen via `doGenCode`. At 100 TB the
  * signature pass is a full-corpus map — per-row constant factors are
  * the whole cost.
  */
case class CosineLshBucketExpr(child: Expression, nBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "cosine_lsh_bucket"

  override def nullSafeEval(input: Any): Any =
    CosineLsh.bucket(input.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CosineLsh.bucket($c, $nBits)")

  override protected def withNewChildInternal(newChild: Expression): CosineLshBucketExpr =
    copy(child = newChild)
}

object CosineLsh {

  /** Column API entry point. */
  def bucketOf(vec: Column, nBits: Int): Column =
    ColumnOps.toColumn(CosineLshBucketExpr(ColumnOps.toExpr(vec), nBits))

  private val MaxBits = 32

  /** signs(j) is a growable array of ±1.0 for hyperplane j; grown lazily
    * and published via volatile so concurrent executor threads see a
    * fully-written table (stale readers just recompute the grow step).
    */
  @volatile private var signTable: Array[Array[Double]] =
    Array.fill(MaxBits)(Array.emptyDoubleArray)

  private def signAt(j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"${j}_$i".getBytes("UTF-8"))
    // first hex char < '8'  ⇔  high nibble of byte 0 < 8
    if (((d(0) >> 4) & 0xf) < 8) 1.0 else -1.0
  }

  private def ensureDim(dim: Int): Array[Array[Double]] = {
    val t = signTable
    if (t(0).length >= dim) t
    else synchronized {
      val cur = signTable
      if (cur(0).length >= dim) cur
      else {
        val grown = Array.tabulate(MaxBits) { j =>
          val old = cur(j)
          val a = java.util.Arrays.copyOf(old, dim)
          var i = old.length
          while (i < dim) { a(i) = signAt(j, i); i += 1 }
          a
        }
        signTable = grown
        grown
      }
    }
  }

  /** Hot loop shared by interpreted eval and generated code: bucket id in
    * [0, 2^nBits). Null elements contribute 0 (absent from the data;
    * documented for totality).
    */
  def bucket(vec: ArrayData, nBits: Int): Int = {
    require(nBits > 0 && nBits <= MaxBits, s"nBits must be in [1, $MaxBits]")
    val n = vec.numElements()
    val signs = ensureDim(n)
    var out = 0
    var j = 0
    while (j < nBits) {
      val row = signs(j)
      var proj = 0.0
      var i = 0
      while (i < n) {
        if (!vec.isNullAt(i)) proj += row(i) * vec.getFloat(i)
        i += 1
      }
      if (proj >= 0.0) out |= (1 << j)
      j += 1
    }
    out
  }
}
