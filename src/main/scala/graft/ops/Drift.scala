package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.Det.r6

/** Distribution-drift measurement — the monitoring layer of a training
  * corpus: "did this source's (or this week's) token distribution move
  * away from the corpus?" and "are these two categorical columns
  * independent?". The divergence numbers are what a data-mixing recipe
  * thresholds on before a source is admitted, and what a drift monitor
  * alerts on between crawls.
  *
  * Determinism: every per-term `ln` product is r6-rounded BEFORE the
  * decimal sum (the [[TextPrep.bigramSurprisal]] discipline) so
  * cross-engine log ulps cannot accumulate into the hash-checked
  * output.
  */
object Drift {

  /** Per-group unigram-distribution divergence from the whole corpus:
    * KL(p_g ‖ p_c) and Jensen–Shannon(p_g, p_c), one row per group.
    *
    * The JS term over words ABSENT from the group (p=0, where the
    * mixture m = q/2 and each word contributes q·ln2/2) is not computed
    * by expanding group × vocabulary: since Σ_vocab q = 1, that whole
    * tail collapses to the closed form `ln2 · (1 − Σ_{w∈group} q)` —
    * the rewrite that turns an O(|groups|·|vocab|) expansion into a
    * per-(group, present-word) sum, i.e. exactly the rows the KL part
    * already touches. DriftSpec proves the closed form equals the naive
    * full-vocabulary expansion.
    *
    * Scale shape: one (group, word) hash aggregate over the exploded
    * token stream (the same exchange the corpus word counts and group
    * totals derive from), a vocabulary-keyed join for q, two 1-row
    * broadcasts (corpus total). Output is |groups| rows; nothing is
    * ever corpus × vocab.
    */
  def tokenDivergence(
      df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(groupCol).as("g"),
      explode(TextAnalysis.tokens(col(textCol))).as("w"))
    val gw = toks.groupBy("g", "w").agg(count(lit(1)).as("c_gw"))
    val gTot = gw.groupBy("g").agg(sum("c_gw").as("t_g"))
    val wTot = gw.groupBy("w").agg(sum("c_gw").as("c_w"))
    val tot = gw.agg(sum("c_gw").as("_T"))
    val ln2 = math.log(2.0)
    val p = col("c_gw") / col("t_g")
    val q = col("c_w") / col("_T")
    val m = (p + q) / lit(2.0)
    def dsumTerm(c: Column): Column =
      sum(c.cast("decimal(25,6)")).cast("double")
    gw
      .join(gTot, "g")
      .join(wTot, "w")
      .crossJoin(broadcast(tot))
      .withColumn("_kl", r6(p * log(p / q)))
      .withColumn("_a", r6(p * log(p / m)))  // KL(p‖m) terms, p>0 rows
      .withColumn("_b", r6(q * log(q / m)))  // KL(q‖m) terms, p>0 rows
      .withColumn("_q", r6(q))
      .groupBy("g")
      .agg(
        max(col("t_g")).as("n_tokens"),
        r6(dsumTerm(col("_kl"))).as("kl"),
        // 0.5·[KL(p‖m) + KL(q‖m)]; the p=0 tail of KL(q‖m) is
        // ln2 · (1 − Σ_present q) — see Scaladoc
        r6((dsumTerm(col("_a")) + dsumTerm(col("_b")) +
          lit(ln2) * (lit(1.0) - dsumTerm(col("_q")))) / lit(2.0)).as("js"))
      .withColumnRenamed("g", groupCol)
      .orderBy(groupCol)
  }

  /** Pearson chi-square test of independence between two categorical
    * columns: one row per observed cell with the observed count, the
    * independence-expected count `rowTotal·colTotal/N`, and the cell's
    * chi-square contribution `(obs − exp)²/exp`. The statistic is the
    * contribution sum; emitting per-cell rows keeps the gate output
    * hash-checkable AND names which cells drive the dependence — what a
    * drift alert actually needs to say.
    *
    * Scale shape: one (a, b) hash aggregate; row/col marginals are
    * re-aggregations of the (tiny) cell table, joined back broadcast.
    * All arithmetic is on exact integer counts (no ln), so outputs are
    * bit-identical cross-engine before the final r6.
    */
  def chiSquareCells(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("obs"))
    val rowT = cells.groupBy("a").agg(sum("obs").as("_ra"))
    val colT = cells.groupBy("b").agg(sum("obs").as("_cb"))
    val n = cells.agg(sum("obs").as("_n"))
    val expn = col("_ra") * col("_cb") / col("_n")
    cells
      .join(broadcast(rowT), "a")
      .join(broadcast(colT), "b")
      .crossJoin(broadcast(n))
      .select(col("a").as(colA), col("b").as(colB), col("obs"),
        r6(expn).as("expected"),
        r6((col("obs") - expn) * (col("obs") - expn) / expn).as("contrib"))
      .orderBy(colA, colB)
  }

  /** Two-sample Kolmogorov–Smirnov statistic between groups `a` and `b`
    * of `groupCol`, over the numeric `valueCol`: the maximum ECDF gap
    * `D = max_v |F_a(v) − F_b(v)|`, the standard nonparametric "did
    * this distribution move?" test a drift monitor runs next to
    * [[tokenDivergence]] (KL needs binning for continuous measures; KS
    * does not). One output row: group sizes, `ks`, and the smallest
    * value attaining the max (`at_value` — WHERE the distributions
    * diverge most, what the alert shows).
    *
    * Determinism: ECDF numerators/denominators are exact integer
    * counts; each gap is r6-rounded before the max, and `at_value` is
    * the min value among r6-equal maxima — total order, cross-engine
    * exact.
    *
    * Scale shape: the corpus-sized work is ONE hash aggregate to the
    * distinct-value grid (per value: count in a, count in b). The
    * cumulative over the grid is a prefix sum, which wants a global
    * order — the single-partition-window anti-pattern at scale — so it
    * runs as the [[Corpus.tokenBudget]] distributed prefix sum with
    * ORDER-PRESERVING buckets: `floor(v)` buckets (numeric order of
    * bucket = order of values), per-bucket totals broadcast back as
    * exclusive offsets, intra-bucket cumsum windowed per bucket. For
    * heavily-skewed measures, production pre-bins the value (the usual
    * KS-on-binned-ECDF practice) — the operator's grid is whatever
    * granularity the caller feeds it.
    */
  def ksStatistic(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      a: String,
      b: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ab = df
      .filter(col(groupCol).isin(a, b))
      .select(col(valueCol).as("v"),
        when(col(groupCol) === a, 1L).otherwise(0L).as("ia"),
        when(col(groupCol) === b, 1L).otherwise(0L).as("ib"))
    val pv = ab.groupBy("v")
      .agg(sum("ia").as("ca"), sum("ib").as("cb"))
      .withColumn("_bkt", floor(col("v")).cast("long"))
    val offsets = pv.groupBy("_bkt")
      .agg(sum("ca").as("_ta"), sum("cb").as("_tb"))
      .withColumn("_offa",
        coalesce(sum("_ta").over(
          Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("_offb",
        coalesce(sum("_tb").over(
          Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_bkt", "_offa", "_offb")
    val wB = Window.partitionBy("_bkt").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = pv.agg(sum("ca").as("na"), sum("cb").as("nb"))
    val dv = pv
      .join(broadcast(offsets), "_bkt")
      .withColumn("cum_a", sum("ca").over(wB) + col("_offa"))
      .withColumn("cum_b", sum("cb").over(wB) + col("_offb"))
      .crossJoin(broadcast(tot))
      .select(col("v"), col("na"), col("nb"),
        r6(abs(col("cum_a").cast("double") / col("na") -
          col("cum_b").cast("double") / col("nb"))).as("d"))
    val mx = dv.agg(max("d").as("_mx"))
    dv.crossJoin(broadcast(mx))
      .agg(
        max("na").as("n_a"),
        max("nb").as("n_b"),
        max("d").as("ks"),
        min(when(col("d") === col("_mx"), col("v"))).as("at_value"))
  }

  /** Population Stability Index between a reference and a current
    * distribution of `valCol` — the model-monitoring drift number
    * ([[tokenDivergence]] covers categorical token space; PSI is the
    * standard for a NUMERIC feature/score). Bins are the reference's
    * equi-depth cuts ([[Features.equiDepthBins]] discipline:
    * percentile_disc data values, broadcast, count-of-cuts-below
    * assignment), so every reference bin is populated by construction.
    * Emits one row per bin — n_ref, n_cur, the two fractions, and the
    * r6'd PSI term `(p−q)·ln(p/q)` — plus the term column's decimal sum
    * is the caller's PSI (the gate spells it as a final aggregate). A
    * bin the current side never hits (q = 0) yields a NULL term rather
    * than ±∞: the report NAMES the vanished bin and the total PSI over
    * defined terms still summarizes, the same explicit-violation stance
    * as [[DataQuality.audit]].
    *
    * Scale shape: one percentile aggregate on the reference, a
    * broadcast cuts row, one narrow bin assignment + hash aggregate per
    * side, and a nBins-row join. Nothing is corpus-sized after the two
    * aggregates. Determinism: counts exact; fractions and the single ln
    * ride the r6-before-sum discipline (q_kl_drift).
    */
  def psi(
      ref: DataFrame,
      cur: DataFrame,
      valCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins > 1)
    val fracs = (1 until nBins).map(k => k.toDouble / nBins)
    val cuts = ref.agg(
      array(fracs.map(f =>
        expr(s"percentile_disc($f) WITHIN GROUP (ORDER BY $valCol)")): _*)
        .as("_cuts"))
    def binned(df: DataFrame, outN: String) = {
      val v = col(valCol)
      df.filter(v.isNotNull)
        .crossJoin(broadcast(cuts))
        .select(size(filter(col("_cuts"), c => c < v)).cast("int").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(outN))
    }
    val r = binned(ref, "n_ref")
    val c = binned(cur, "n_cur")
    val joined = r.join(c, Seq("bin"), "left")
      .na.fill(0L, Seq("n_cur"))
    val tot = joined.agg(
      sum(col("n_ref")).as("_tr"), sum(col("n_cur")).as("_tc"))
    val p = col("n_ref").cast("double") / col("_tr")
    val q = col("n_cur").cast("double") / col("_tc")
    joined.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        r6(p).as("p_ref"), r6(q).as("p_cur"),
        when(col("n_cur") > 0, r6((p - q) * log(p / q))).as("psi_term"))
  }
}
