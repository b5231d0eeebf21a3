package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Det.r6

/** Feature-engineering operators for model training over pipeline data
  * — the step between curated tables and a trainer's feature columns.
  * Deterministic by the engine's usual discipline: exact integer/decimal
  * aggregates, identical final double arithmetic both engines, r6 on
  * every emitted double.
  */
object Features {

  /** Leave-one-out target encoding of a categorical column: each row
    * gets the mean of `targetCol` over the OTHER rows of its category —
    * `(sum_c − t_i) / (n_c − 1)` — the standard high-cardinality
    * categorical encoding that avoids leaking a row's own label into
    * its feature. Singleton categories (no "other rows") fall back to
    * the global mean over all other rows, `(sum − t_i) / (n − 1)`.
    *
    * Determinism: both sums ride DECIMAL (exact, order-independent);
    * each row's encoding is ONE double subtraction/division chain off
    * exact numerators, then r6.
    *
    * Scale shape: one per-category aggregate (categories ≪ rows), a
    * category-keyed join back (broadcast when the category table is
    * small, hash otherwise — the planner's call), and a 1-row global
    * broadcast. Narrow per-row arithmetic after that; nothing is
    * per-row-windowed.
    */
  def targetEncodeLoo(
      df: DataFrame,
      catCol: String,
      targetCol: String): DataFrame = {
    val t = col(targetCol).cast("decimal(25,6)")
    val cat = df.groupBy(catCol)
      .agg(sum(t).as("_csum"), count(lit(1)).as("_cn"))
    val glob = df.agg(sum(t).as("_gsum"), count(lit(1)).as("_gn"))
    df.join(cat, catCol)
      .crossJoin(broadcast(glob))
      .withColumn(s"${catCol}_enc",
        when(col("_cn") > 1,
          r6((col("_csum") - t).cast("double") / (col("_cn") - 1)))
          .otherwise(
            r6((col("_gsum") - t).cast("double") / (col("_gn") - 1))))
      .drop("_csum", "_cn", "_gsum", "_gn")
  }

  /** Per-group winsorization summary: clip `valueCol` into the group's
    * [p_lo, p_hi] exact-discrete percentiles and report, per group, the
    * row count, how many rows clipped at each side, and the decimal sum
    * of the winsorized values — the robust-statistics pre-pass that
    * keeps a fat-tailed measure from dominating a feature or a metric.
    *
    * The cut values use `percentile_disc` (the SQL-standard "smallest
    * value whose cume_dist ≥ p" — the q_ppl_band contract, spelled via
    * cume_dist in the DuckDB oracle since DuckDB's quantile_disc rounds
    * differently). Cut values are DATA values, not arithmetic, so they
    * are engine-exact by construction.
    *
    * Scale shape: one percentile aggregate per group (the same shape as
    * [[Profile]]'s quartiles), broadcast of the groups × 2 cut frame,
    * then a narrow clip + re-aggregate.
    */
  def winsorizeSummary(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pLo: Double = 0.05,
      pHi: Double = 0.95): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"bad band: [$pLo, $pHi]")
    val cuts = df.groupBy(groupCol).agg(
      expr(s"percentile_disc($pLo) WITHIN GROUP (ORDER BY $valueCol)")
        .as("_lo"),
      expr(s"percentile_disc($pHi) WITHIN GROUP (ORDER BY $valueCol)")
        .as("_hi"))
    val v = col(valueCol)
    val w = when(v < col("_lo"), col("_lo"))
      .when(v > col("_hi"), col("_hi")).otherwise(v)
    df.join(broadcast(cuts), groupCol)
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        sum(when(v < col("_lo"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(v > col("_hi"), 1L).otherwise(0L)).as("n_clip_hi"),
        max(col("_lo")).as("cut_lo"),
        max(col("_hi")).as("cut_hi"),
        r6(sum(w.cast("decimal(25,6)")).cast("double")).as("sum_winsorized"))
  }

  /** Equi-depth discretization of a numeric column: `nBins` buckets of
    * (approximately) equal row count, the feature-binning that survives
    * fat tails where [[Stats.fixedWidthHistogram]]'s equal-width bins
    * collapse into one. Emits one row per bin: its cut (upper edge),
    * count, and min/max of the members.
    *
    * NOT ntile: a global ntile is one total-order window — the
    * single-partition anti-pattern at 100 TB. Instead the nBins−1
    * interior cuts come from ONE percentile aggregate (exact-discrete,
    * the [[winsorizeSummary]] contract: cut k = smallest value whose
    * cume_dist ≥ k/nBins — data values, engine-exact), the cuts
    * broadcast, and bin assignment is a narrow per-row comparison
    * (count of cuts < v, via the codegen'd array predicate). Ties at a
    * cut all land in that cut's bin — equal VALUES never straddle a bin
    * boundary, the property ntile does not give and the one that makes
    * the assignment deterministic under any partitioning.
    */
  def equiDepthBins(
      df: DataFrame,
      valCol: String,
      nBins: Int): DataFrame = {
    require(nBins > 1, s"need ≥ 2 bins, got $nBins")
    val fracs = (1 until nBins).map(k => k.toDouble / nBins)
    val cuts = df.agg(
      array(fracs.map(f =>
        expr(s"percentile_disc($f) WITHIN GROUP (ORDER BY $valCol)")): _*)
        .as("_cuts"))
    val v = col(valCol)
    df.filter(v.isNotNull)
      .crossJoin(broadcast(cuts))
      // bin = number of cuts strictly below v: v ≤ cut_k ⇒ bin ≤ k
      .select(v.as("_v"),
        size(filter(col("_cuts"), c => c < v)).cast("int").as("bin"),
        col("_cuts"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n"),
        min(col("_v")).as("bin_min"),
        max(col("_v")).as("bin_max"),
        // the bin's nominal upper cut (last bin: no cut, NULL)
        first(when(col("bin") < nBins - 1,
          element_at(col("_cuts"), col("bin") + 1))).as("cut_hi"))
  }

  /** Quantile normalization of `valCol` across groups: each row maps to
    * the GLOBAL distribution's value at its within-group rank — the
    * transform that removes per-source scale/shape bias (microarray
    * quantile normalization, per-source score calibration) so
    * downstream thresholds mean the same thing for every source.
    *
    * Mechanics: within-group rank r = cume_dist (a window PARTITIONED
    * BY group — per-source sorts, never a global order), quantized to
    * grid point k = min(⌈r·nGrid⌉, nGrid), joined to the global
    * k/nGrid-th percentile_disc value via a broadcast nGrid-row cut
    * table. Output values are DATA values (percentile_disc), so the
    * mapping is engine-exact; the ⌈r·nGrid⌉ double is the same
    * expression tree both engines (ties in cume_dist are peer-counted
    * identically), making even rounding-boundary grid assignment
    * deterministic cross-engine.
    */
  def quantileNormalize(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      nGrid: Int = 8): DataFrame = {
    require(nGrid > 1)
    val grid = df.agg(
      array((1 to nGrid).map(k =>
        expr(s"percentile_disc(${k.toDouble / nGrid}) " +
          s"WITHIN GROUP (ORDER BY $valCol)")): _*).as("_grid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valCol))
    df.filter(col(valCol).isNotNull)
      // k stays LONG (Spark ceil's type) — the oracle spells ::BIGINT,
      // keeping the emitted grid index the same width in both engines
      .withColumn("_k",
        least(ceil(cume_dist().over(w) * nGrid), lit(nGrid.toLong)))
      .crossJoin(broadcast(grid))
      .withColumn("norm_" + valCol,
        element_at(col("_grid"), col("_k").cast("int")))
      .drop("_grid")
  }
}
