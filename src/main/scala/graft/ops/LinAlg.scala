package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Upper-triangle (i ≤ j) second-moment statistics of `vecCol`
    * (array<float|double>): one row per (i, j) with
    * (n, gram = r6 Σ xᵢxⱼ, cov = r6[(gram − sᵢsⱼ/n)/n]) where sᵢ is the
    * r6'd per-dimension sum. The covariance normalizer is n (population
    * form), matching the oracle spelling literally.
    */
  def gramCov(df: DataFrame, vecCol: String): DataFrame = {
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
