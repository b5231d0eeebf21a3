package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.queries.Det

/** Distributed dense linear algebra for embedding columns: the Gram /
  * covariance matrix (the one genuinely data-sized computation behind
  * PCA, whitening, and Mahalanobis scoring) plus the driver-side
  * eigen step and the row-wise projection that complete the PCA
  * pipeline.
  *
  * Scale shape: the d×d covariance of n rows is a SINGLE aggregation
  * pass. Each row emits its d(d+1)/2 upper-triangle products through a
  * narrow nested-`transform` explode (no self-join — the per-row
  * blow-up is a constant d²/2, and map-side partial aggregation
  * collapses every partition to ≤ d(d+1)/2 groups before the shuffle,
  * so shuffle volume is `partitions × d²/2` regardless of n). The
  * eigen-decomposition then runs on the collected d×d matrix — a
  * bounded driver object like a broadcast centroid set, NOT a data
  * collect — and projection re-distributes as one broadcast dot
  * product per component.
  *
  * Determinism: float×float products are exact in double; sums run in
  * DECIMAL(25,6) (order-independent) and every emitted statistic is
  * r6-rounded, so the matrix hash-checks against DuckDB exactly.
  * The eigenvector itself is NOT hash-gated (iterated float division
  * is cross-engine-chaotic); the spec asserts the eigen residual
  * ‖Σv − λv‖ instead.
  */
object LinAlg {

  /** One upper-triangle cell of a per-partition Gram partial: `n`
    * pair-occurrences (rows whose vector reaches position j), `nnz`
    * non-null products folded into `gs`, and `gs` the exact
    * DECIMAL(25,6)-scaled product sum as a long (units of 1e-6).
    */
  private[ops] case class GramCell(i: Long, j: Long, n: Long, nnz: Long, gs: Long)

  /** Exact replica of Spark's `double → DECIMAL(25,6)` cast as a
    * scaled long: Spark routes the cast through the double's SHORTEST
    * decimal representation (`Decimal(d)` → `BigDecimal.decimal(d)` →
    * `java.math.BigDecimal.valueOf` → `Double.toString`), then
    * `setScale(6, HALF_UP)`. The fast path is pure double arithmetic
    * (`floor(x·1e6 + 0.5)`) and is taken whenever the scaled value
    * sits further from a .5 rounding boundary than the accumulated
    * representation error (≤ ~1.5 ulp: one shortest-repr half-ulp and
    * one multiply rounding) — the slow exact path replays the real
    * BigDecimal pipeline. Ties don't exist in the exact decimal
    * (x.5e-6 is never a dyadic rational), so HALF_UP vs floor+0.5
    * never diverges on the fast path's guard domain.
    */
  private[ops] def scale6(x: Double): Long = {
    val y = x * 1e6
    val f = math.floor(y)
    val frac = y - f
    if (math.abs(frac - 0.5) > 4 * math.ulp(y))
      (if (frac >= 0.5) f + 1 else f).toLong
    else
      new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact()
  }

  /** Upper-triangle (i ≤ j) second-moment statistics of `vecCol`
    * (array<float|double>): one row per (i, j) with
    * (n, gram = r6 Σ xᵢxⱼ, cov = r6[(gram − sᵢsⱼ/n)/n]) where sᵢ is the
    * r6'd per-dimension sum. The covariance normalizer is n (population
    * form), matching the oracle spelling literally.
    *
    * Physical shape (rewritten r14, VERDICT r13 task 1): a per-partition
    * fused fold. Each partition walks its rows once, accumulating the
    * d(d+1)/2 scaled product sums in primitive long arrays (every
    * product rounded through [[scale6]] — bit-identical to the previous
    * spelling's per-product DECIMAL(25,6) cast, so the emitted decimals
    * are unchanged), then emits ONE d(d+1)/2-cell partial; a tiny
    * group-by merges partials exactly (long adds ARE decimal adds at
    * fixed scale). The r13 spelling — a nested-`transform` explode of
    * per-row (i,j,product) structs into a DECIMAL hash aggregate — was
    * semantically identical but physically hostile: higher-order
    * functions are `CodegenFallback`, so the hot loop ran n·d²/2
    * interpreted `Expression.eval` dispatches allocating a boxed struct
    * each (the slow-state bench dumps showed exactly that stage
    * bimodal 2.5 s ↔ 9 s depending on accumulated JIT/GC state — see
    * SCALE.md §12), and the precision-25 decimal aggregate kept a heap
    * BigDecimal per group per partition. The fold's inner loop is a
    * multiply + guard + long add on locals — small monomorphic methods
    * the JIT compiles once and keeps.
    *
    * Scale contract (unchanged): shuffle volume is partitions × d²/2
    * cells regardless of n; a ragged or null-element row contributes
    * exactly the statistics its positions define (n counts position
    * presence, `nnz` guards the all-null → NULL sum semantic of the
    * SQL aggregate).
    */
  def gramCov(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    // a null or EMPTY embedding contributes no statistics; cast once to
    // array<double> (exact float→double widening, same as the previous
    // per-element cast)
    val present = df.filter(size(v) >= 1)
      .select(v.cast("array<double>").as("_v"))
    val cells = present.mapPartitions { it =>
      var d = 0 // current max dimension seen
      var nnz: Array[Long] = new Array[Long](0) // triangular, by idx(i,j)
      var gs: Array[Long] = new Array[Long](0)
      var hist: Array[Long] = new Array[Long](1) // rows by vector length
      // triangular layout for dimension d: cell (i, j≥i) at
      // i*d - i*(i-1)/2 + (j-i); regrow + remap when a longer row shows
      def grow(nd: Int): Unit = {
        val nNnz = new Array[Long](nd * (nd + 1) / 2)
        val nGs = new Array[Long](nd * (nd + 1) / 2)
        var i = 0
        while (i < d) {
          val srcBase = i * d - i * (i - 1) / 2 - i
          val dstBase = i * nd - i * (i - 1) / 2 - i
          var j = i
          while (j < d) {
            nNnz(dstBase + j) = nnz(srcBase + j)
            nGs(dstBase + j) = gs(srcBase + j)
            j += 1
          }
          i += 1
        }
        nnz = nNnz; gs = nGs; d = nd
        if (hist.length <= nd) hist = java.util.Arrays.copyOf(hist, nd + 1)
      }
      while (it.hasNext) {
        val seq = it.next().getSeq[Any](0)
        val n = seq.length
        if (n > d) grow(n)
        hist(n - 1) += 1 // n ≥ 1 by the `present` filter
        val x = new Array[Double](n)
        val nul = new Array[Boolean](n)
        var i = 0
        while (i < n) {
          val e = seq(i)
          if (e == null) nul(i) = true
          else x(i) = e.asInstanceOf[Double]
          i += 1
        }
        i = 0
        while (i < n) {
          if (!nul(i)) {
            val xi = x(i)
            var idx = i * d - i * (i - 1) / 2
            var j = i
            while (j < n) {
              if (!nul(j)) {
                gs(idx) += scale6(xi * x(j))
                nnz(idx) += 1
              }
              idx += 1
              j += 1
            }
          }
          i += 1
        }
      }
      if (d == 0) Iterator.empty
      else {
        // n(i,j) = rows whose vector reaches position j = Σ_{len>j} hist
        val reach = new Array[Long](d)
        var acc = 0L
        var j = d - 1
        while (j >= 0) { acc += hist(j); reach(j) = acc; j -= 1 }
        for {
          i <- Iterator.range(0, d)
          j <- Iterator.range(i, d)
        } yield {
          val idx = i * d - i * (i - 1) / 2 + (j - i)
          GramCell(i.toLong, j.toLong, reach(j), nnz(idx), gs(idx))
        }
      }
    }(Encoders.product[GramCell])
    val gram = cells.groupBy("i", "j")
      .agg(sum(col("n")).as("n"),
        // all-null product sets keep SQL semantics: SUM over no
        // non-null terms is NULL, not 0
        when(sum(col("nnz")) === 0, lit(null))
          .otherwise(Det.dsumScaled6(col("gs"))).as("gram"))
    val sums = df.select(posexplode(v).as(Seq("i", "x")))
      .groupBy(col("i").cast("long").as("i"))
      .agg(Det.dsum(col("x").cast("double")).as("s"))
    gram
      .join(sums.select(col("i"), col("s").as("s_i")), "i")
      .join(sums.select(col("i").as("j"), col("s").as("s_j")), "j")
      .select(col("i"), col("j"), col("n"), col("gram"),
        Det.r6((col("gram") - col("s_i") * col("s_j") / col("n")) / col("n"))
          .as("cov"))
      .orderBy("i", "j")
  }

  /** The r13 spelling of [[gramCov]], kept verbatim for the A/B
    * equality spec and so the SCALE.md §12 slow-state investigation
    * stays reproducible: nested-`transform` upper-triangle explode
    * (interpreted — higher-order functions are CodegenFallback) into a
    * DECIMAL(25,6) hash aggregate. Semantically identical to
    * [[gramCov]]; physically the bimodal 2.5 s ↔ 9 s plan the rewrite
    * retired. Not registered to any gate.
    */
  private[graft] def gramCovExplode(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    // per-row upper triangle from nested index-sequence transforms:
    // (i, j ≥ i) pairs with products looked up by 1-based element_at
    val pairs = flatten(transform(sequence(lit(0), size(v) - 1), i =>
      transform(sequence(i, size(v) - 1), j =>
        struct(i.as("i"), j.as("j"),
          (element_at(v, i + 1).cast("double") *
            element_at(v, j + 1).cast("double")).as("p")))))
    // tolerate ragged input: a null or EMPTY embedding contributes no
    // statistics (size 0 would otherwise build the descending sequence
    // [0, −1] and evaluate element_at(v, 0), which Spark rejects —
    // SQL array indices are 1-based)
    val present = df.filter(size(v) >= 1)
    val exploded = present.select(explode(pairs).as("t"))
      .select(col("t.i").cast("long").as("i"),
        col("t.j").cast("long").as("j"), col("t.p").as("p"))
    val gram = exploded.groupBy("i", "j")
      .agg(count(lit(1)).as("n"), Det.dsum(col("p")).as("gram"))
    val sums = df.select(posexplode(v).as(Seq("i", "x")))
      .groupBy(col("i").cast("long").as("i"))
      .agg(Det.dsum(col("x").cast("double")).as("s"))
    gram
      .join(sums.select(col("i"), col("s").as("s_i")), "i")
      .join(sums.select(col("i").as("j"), col("s").as("s_j")), "j")
      .select(col("i"), col("j"), col("n"), col("gram"),
        Det.r6((col("gram") - col("s_i") * col("s_j") / col("n")) / col("n"))
          .as("cov"))
      .orderBy("i", "j")
  }

  /** Driver-side top eigenpair of the collected covariance matrix by
    * power iteration (deterministic e₁ start, fixed iteration count,
    * L2 normalization). `cov` must be [[gramCov]] output; d is inferred.
    * Bounded work: d² doubles on the driver, like a broadcast codebook.
    */
  def topEigen(cov: DataFrame, iters: Int = 50): (Array[Double], Double) = {
    val entries = cov.select("i", "j", "cov").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
    require(entries.nonEmpty, "topEigen needs a non-empty covariance matrix")
    val d = entries.map(_._2).max + 1
    // enforce the "bounded model object" contract the collect() relies
    // on: d² doubles must stay driver-sized (4096² ≈ 128 MB), or the
    // caller is feeding data, not a covariance matrix
    require(d <= 4096,
      s"topEigen collects a d×d matrix on the driver; d=$d exceeds 4096")
    val m = Array.ofDim[Double](d, d)
    entries.foreach { case (i, j, x) => m(i)(j) = x; m(j)(i) = x }
    var vcur = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val av = Array.tabulate(d)(i =>
        (0 until d).map(j => m(i)(j) * vcur(j)).sum)
      val norm = math.sqrt(av.map(x => x * x).sum)
      lambda = norm
      vcur = av.map(_ / norm)
    }
    (vcur, lambda)
  }

  /** Row-wise projection of `vecCol` onto `components` (broadcast as
    * literals — components are model parameters, not data): appends
    * `pc0, pc1, …` dot-product columns. Codegen-friendly: the dot is
    * an unrolled sum of `element_at × literal` terms, no UDF.
    */
  def project(
      df: DataFrame,
      vecCol: String,
      components: Seq[Array[Double]]): DataFrame = {
    val v = col(vecCol)
    val projected = components.zipWithIndex.map { case (comp, c) =>
      comp.zipWithIndex
        .map { case (w, i) => element_at(v, i + 1).cast("double") * lit(w) }
        .reduce(_ + _).as(s"pc$c")
    }
    df.select(col("*") +: projected: _*)
  }
}
