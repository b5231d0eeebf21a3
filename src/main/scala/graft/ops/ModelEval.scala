package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Det.r6

/** Model-quality readouts as relational aggregates — the monitoring
  * half of a training pipeline: once a model (or any scalar signal —
  * a quality scorer, a perplexity band, a retrieval score) is attached
  * to rows, these operators measure how well it separates / calibrates
  * against an outcome column, entirely inside the engine (no sklearn
  * round-trip, no driver collect of scores).
  *
  * Scale shape: both operators reduce the corpus to a bounded frame in
  * ONE hash aggregate (AUC: the distinct-score grid; calibration: the
  * fixed bin table) before any windowing. The AUC prefix sum rides the
  * same order-preserving bucket decomposition as
  * [[Drift.ksStatistic]] — per-bucket offsets broadcast back, windows
  * only within a bucket — so no single-partition global window exists
  * at any size.
  */
object ModelEval {

  /** ROC AUC via the pair-counting (Mann–Whitney U) identity:
    * `AUC = (#{(p,n): s_p > s_n} + ½·#{s_p = s_n}) / (P·N)` — the
    * probability a random positive outranks a random negative, the
    * threshold-free separation metric.
    *
    * Computed without materializing P×N pairs: aggregate to the
    * distinct-score grid (per score: positive count, negative count),
    * take the running count of negatives strictly below each score (a
    * prefix sum over the grid), and fold
    * `Σ npos·negBelow + ½·Σ npos·nneg` — all exact integer arithmetic
    * (the ½ handled by doubling both terms) with ONE final double
    * division, r6-rounded, so the statistic is cross-engine exact.
    *
    * The prefix sum is distributed: `floor(score)` buckets preserve
    * numeric order, per-bucket negative totals broadcast back as
    * exclusive offsets, and the running count windows per bucket —
    * the [[Drift.ksStatistic]] discipline.
    *
    * Output: one row `(n_pos, n_neg, n_pairs, auc)`; `auc` is NULL on
    * degenerate input (no positives or no negatives) rather than an
    * error, the monitoring-friendly contract.
    */
  def aucRank(df: DataFrame, scoreCol: String, posCol: String): DataFrame = {
    val g = df
      .filter(col(scoreCol).isNotNull)
      .select(col(scoreCol).as("s"), col(posCol).cast("long").as("p"))
      .groupBy("s")
      .agg(sum("p").as("npos"), sum(lit(1L) - col("p")).as("nneg"))
      .withColumn("_bkt", floor(col("s")).cast("long"))
    val offsets = g.groupBy("_bkt")
      .agg(sum("nneg").as("_tn"))
      .withColumn("_off",
        coalesce(sum("_tn").over(
          Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_bkt", "_off")
    val wB = Window.partitionBy("_bkt").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withBelow = g
      .join(broadcast(offsets), "_bkt")
      .withColumn("negBelow", col("_off") + coalesce(sum("nneg").over(wB), lit(0L)))
    withBelow.agg(
        sum("npos").as("n_pos"),
        sum("nneg").as("n_neg"),
        sum((col("npos") * lit(2L) * col("negBelow") +
          col("npos") * col("nneg")).cast("decimal(38,0)")).as("_num2"))
      .select(
        col("n_pos"), col("n_neg"),
        (col("n_pos") * col("n_neg")).as("n_pairs"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          r6(col("_num2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")))).as("auc"))
  }

  /** Reliability diagram + Expected Calibration Error over a
    * probability column in [0,1]: `bins` fixed-width bins (last bin
    * closed at 1.0), per bin the count, mean predicted probability,
    * empirical positive rate, and |gap|; `ece` — the count-weighted
    * mean |gap|, the one-number calibration readout — is repeated on
    * every row (broadcast scalar join, no second result set).
    *
    * Determinism: bin = `least(floor(p·bins), bins−1)` on the raw
    * double (identical spelling both engines), label mean from exact
    * integer sums, probability mean via the decimal-sum [[Det.davg]]
    * discipline OVER THE 6-dp-ROUNDED p — r6 first, then the decimal
    * cast. Casting a raw >6-decimal double to DECIMAL(25,6) is engine-
    * dependent on halfway values (Spark rounds the shortest string
    * representation, DuckDB the binary value; found at sf0.1, one p at
    * x.xxxxxx5 flipped avg_p's last digit), while r6 computes the same
    * floor on the same IEEE double everywhere. Gap and ECE terms
    * r6-rounded before the exact decimal ECE fold.
    *
    * Scale shape: one hash aggregate to ≤ `bins` rows; everything after
    * is on the bounded bin table.
    */
  def calibration(
      df: DataFrame,
      pCol: String,
      posCol: String,
      bins: Int = 10): DataFrame = {
    val binned = df
      .filter(col(pCol).isNotNull)
      .select(
        least(floor(col(pCol) * bins), lit(bins - 1L)).cast("long").as("bin"),
        col(pCol).as("p"), col(posCol).cast("long").as("y"))
      .groupBy("bin")
      .agg(
        count(lit(1)).as("n"),
        r6(sum(r6(col("p")).cast("decimal(25,6)")).cast("double") / count(lit(1)))
          .as("avg_p"),
        r6(sum("y").cast("double") / count(lit(1))).as("pos_rate"))
      .withColumn("gap", r6(abs(col("avg_p") - col("pos_rate"))))
    val total = binned.agg(sum("n").as("_N"))
    val ece = binned.crossJoin(broadcast(total))
      .select(r6(col("n") * col("gap") / col("_N")).cast("decimal(25,6)").as("_t"))
      .agg(r6(sum("_t").cast("double")).as("ece"))
    binned.crossJoin(broadcast(ece))
      .select("bin", "n", "avg_p", "pos_rate", "gap", "ece")
      .orderBy("bin")
  }

  /** Classification point metrics at a fixed decision threshold: the
    * confusion matrix plus precision / recall / F1 / accuracy — the
    * readout a deployed binary classifier reports next to its AUC
    * (which is threshold-free and can hide an unusable operating
    * point). One hash aggregate; every metric is a single division of
    * exact integer counts (F1 spelled as `2tp/(2tp+fp+fn)` so it too
    * is ONE division), r6'd once; degenerate denominators report NULL.
    */
  def classificationReport(
      df: DataFrame,
      scoreCol: String,
      posCol: String,
      threshold: Double): DataFrame = {
    val base = df.filter(col(scoreCol).isNotNull)
      .select(
        (col(scoreCol) >= threshold).cast("long").as("_pred"),
        col(posCol).cast("long").as("_y"))
    base.agg(
        sum(col("_pred") * col("_y")).as("tp"),
        sum(col("_pred") * (lit(1L) - col("_y"))).as("fp"),
        sum((lit(1L) - col("_pred")) * col("_y")).as("fn"),
        sum((lit(1L) - col("_pred")) * (lit(1L) - col("_y"))).as("tn"))
      .select(
        col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0,
          r6(col("tp").cast("double") / (col("tp") + col("fp"))))
          .as("precision"),
        when(col("tp") + col("fn") > 0,
          r6(col("tp").cast("double") / (col("tp") + col("fn"))))
          .as("recall"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          r6((lit(2.0) * col("tp")) /
            (lit(2L) * col("tp") + col("fp") + col("fn"))))
          .as("f1"),
        r6((col("tp") + col("tn")).cast("double") /
          (col("tp") + col("fp") + col("fn") + col("tn"))).as("accuracy"))
  }

  /** DuckDB spelling of [[classificationReport]]. */
  def classificationReportOracleSql(
      table: String,
      scoreExpr: String,
      posExpr: String,
      threshold: Double): String = {
    val r6 = graft.queries.Oracle.r6 _
    s"WITH b AS (SELECT CASE WHEN $scoreExpr >= $threshold THEN 1 ELSE 0 END " +
      s"AS pred, $posExpr AS y FROM $table WHERE $scoreExpr IS NOT NULL), " +
      "c AS (SELECT CAST(sum(pred * y) AS BIGINT) AS tp, " +
      "CAST(sum(pred * (1 - y)) AS BIGINT) AS fp, " +
      "CAST(sum((1 - pred) * y) AS BIGINT) AS fn, " +
      "CAST(sum((1 - pred) * (1 - y)) AS BIGINT) AS tn FROM b) " +
      "SELECT tp, fp, fn, tn, " +
      "CASE WHEN tp + fp > 0 THEN " + r6("tp::DOUBLE / (tp + fp)") +
      " END AS precision, " +
      "CASE WHEN tp + fn > 0 THEN " + r6("tp::DOUBLE / (tp + fn)") +
      " END AS recall, " +
      "CASE WHEN 2 * tp + fp + fn > 0 THEN " +
      r6("(2.0 * tp) / (2 * tp + fp + fn)") + " END AS f1, " +
      r6("(tp + tn)::DOUBLE / (tp + fp + fn + tn)") + " AS accuracy FROM c"
  }

  /** Average precision (the area under the precision–recall curve by
    * the standard step interpolation): over the distinct-score grid
    * scanned descending, `AP = Σ_s (npos_s / P) · precision(s)` with
    * `precision(s) = tp(≥s)/pred(≥s)`. The PR-curve summary that, on
    * imbalanced outcomes, discriminates where AUC saturates.
    *
    * Scale shape: the corpus reduces to the distinct-score grid in one
    * hash aggregate; the "at or above" cumulatives come from the SAME
    * order-preserving bucket decomposition as [[aucRank]] (strictly-
    * below sums: per-bucket offsets broadcast, windows only within a
    * bucket), so no single-partition global window exists at any size.
    * Determinism: every term is `npos·tp / (P·pred)` — one division of
    * exact integer products (< 2⁵³ far past sf10) — r6'd then
    * decimal-summed.
    */
  def averagePrecision(
      df: DataFrame,
      scoreCol: String,
      posCol: String): DataFrame = {
    val g = df
      .filter(col(scoreCol).isNotNull)
      .select(col(scoreCol).as("s"), col(posCol).cast("long").as("p"))
      .groupBy("s")
      .agg(sum("p").as("npos"), count(lit(1)).as("ntot"))
      .withColumn("_bkt", floor(col("s")).cast("long"))
    val offsets = g.groupBy("_bkt")
      .agg(sum("npos").as("_bp"), sum("ntot").as("_bt"))
      .withColumn("_offp",
        coalesce(sum("_bp").over(
          Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("_offt",
        coalesce(sum("_bt").over(
          Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_bkt", "_offp", "_offt")
    val wB = Window.partitionBy("_bkt").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val below = g
      .join(broadcast(offsets), "_bkt")
      .withColumn("_posBelow",
        col("_offp") + coalesce(sum("npos").over(wB), lit(0L)))
      .withColumn("_totBelow",
        col("_offt") + coalesce(sum("ntot").over(wB), lit(0L)))
    val totals = g.agg(sum("npos").as("_P"), sum("ntot").as("_N"))
    below.crossJoin(broadcast(totals))
      .select(col("_P"), col("_N"),
        when(col("npos") > 0, r6(
          (col("npos") * (col("_P") - col("_posBelow"))).cast("double") /
            (col("_P") * (col("_N") - col("_totBelow"))).cast("double")))
          .otherwise(lit(0.0)).as("_term"))
      .agg(
        max("_P").as("n_pos"),
        max("_N").as("n"),
        when(max("_P") > 0,
          r6(sum(col("_term").cast("decimal(25,6)")).cast("double")))
          .as("ap"))
  }

  /** DuckDB spelling of [[averagePrecision]] (plain global windows —
    * single-threaded SQL may).
    */
  def averagePrecisionOracleSql(
      table: String,
      scoreExpr: String,
      posExpr: String): String = {
    val r6 = graft.queries.Oracle.r6 _
    s"WITH b AS (SELECT $scoreExpr AS s, $posExpr AS p FROM $table " +
      s"WHERE $scoreExpr IS NOT NULL), " +
      "g AS (SELECT s, CAST(sum(p) AS BIGINT) AS npos, " +
      "count(*)::BIGINT AS ntot FROM b GROUP BY 1), " +
      "c AS (SELECT s, npos, ntot, " +
      "coalesce(sum(npos) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED " +
      "PRECEDING AND 1 PRECEDING), 0)::BIGINT AS posBelow, " +
      "coalesce(sum(ntot) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED " +
      "PRECEDING AND 1 PRECEDING), 0)::BIGINT AS totBelow FROM g), " +
      "t AS (SELECT CAST(sum(npos) AS BIGINT) AS P, " +
      "CAST(sum(ntot) AS BIGINT) AS N FROM g), " +
      "tm AS (SELECT CASE WHEN npos > 0 THEN " +
      r6("(npos * (P - posBelow))::DOUBLE / (P * (N - totBelow))::DOUBLE") +
      " ELSE 0.0 END AS term, P, N FROM c CROSS JOIN t) " +
      "SELECT max(P) AS n_pos, max(N) AS n, " +
      "CASE WHEN max(P) > 0 THEN " +
      r6("CAST(CAST(sum(CAST(term AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE)") +
      " END AS ap FROM tm"
  }

  /** Off-policy evaluation of a deterministic target policy over
    * logged (action, reward) data: inverse-propensity scoring (Horvitz
    * & Thompson 1952; Li et al., WSDM 2011) with the logging
    * propensity taken as the empirical action share (the context-free
    * logger), plus the self-normalized variant (SNIPS, Swaminathan &
    * Joachims 2015), which trades a small bias for variance control —
    * both in one pass. `targetAction` is a Column: the policy π(x)
    * evaluated per row.
    *
    * `IPS = (1/N) Σ 1(a_i = π(x_i)) · w_i · r_i` with `w_i = N/n_{a_i}`;
    * `SNIPS` replaces 1/N with 1/Σ matched w_i. One row out: counts,
    * both estimates, and the matched mass (the effective sample size
    * diagnostic — a tiny `n_matched` means the logs barely cover π).
    *
    * Scale shape: one action-share aggregate (≤ |action vocabulary|
    * rows, broadcast back) + one global aggregate. Determinism: w is a
    * ratio of exact integers; w·r terms r6'd, decimal-summed, one
    * final division each.
    */
  def ipsEstimate(
      df: DataFrame,
      actionCol: String,
      rewardCol: String,
      targetAction: org.apache.spark.sql.Column): DataFrame = {
    val base = df.select(
      col(actionCol).as("_a"),
      col(rewardCol).cast("double").as("_r"),
      targetAction.as("_pi"))
    val shares = base.groupBy("_a").agg(count(lit(1)).as("_na"))
    val total = base.agg(count(lit(1)).as("_n"))
    base
      .join(broadcast(shares), "_a")
      .crossJoin(broadcast(total))
      .select(
        col("_n"),
        (col("_a") === col("_pi")).as("_m"),
        r6(col("_n").cast("double") / col("_na").cast("double")).as("_w"),
        col("_r"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("_m").cast("long")).as("n_matched"),
        sum(when(col("_m"), r6(col("_w") * col("_r")))
          .otherwise(lit(0.0)).cast("decimal(25,6)")).as("_swr"),
        sum(when(col("_m"), col("_w")).otherwise(lit(0.0))
          .cast("decimal(25,6)")).as("_sw"))
      .select(
        col("n"), col("n_matched"),
        r6(col("_swr").cast("double") / col("n")).as("ips"),
        when(col("_sw") > 0,
          r6(col("_swr").cast("double") / col("_sw").cast("double")))
          .as("snips"),
        r6(col("_sw").cast("double")).as("matched_mass"))
  }

  /** DuckDB spelling of [[ipsEstimate]] over a `(a, r, pi)` subquery. */
  def ipsOracleSql(loggedSql: String): String = {
    val r6 = graft.queries.Oracle.r6 _
    s"WITH b AS ($loggedSql), " +
      "sh AS (SELECT a, count(*)::BIGINT AS na FROM b GROUP BY 1), " +
      "t AS (SELECT count(*)::BIGINT AS n FROM b), " +
      "w AS (SELECT b.a = b.pi AS m, " +
      r6("t.n::DOUBLE / sh.na::DOUBLE") + " AS w, b.r, t.n " +
      "FROM b JOIN sh USING (a) CROSS JOIN t) " +
      "SELECT max(n)::BIGINT AS n, " +
      "CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_matched, " +
      r6("CAST(CAST(sum(CAST(CASE WHEN m THEN " + r6("w * r") +
        " ELSE 0.0 END AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) / max(n)") + " AS ips, " +
      "CASE WHEN sum(CAST(CASE WHEN m THEN w ELSE 0.0 END " +
      "AS DECIMAL(25,6))) > 0 THEN " +
      r6("CAST(CAST(sum(CAST(CASE WHEN m THEN " + r6("w * r") +
        " ELSE 0.0 END AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) / " +
        "CAST(CAST(sum(CAST(CASE WHEN m THEN w ELSE 0.0 END " +
        "AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE)") + " END AS snips, " +
      r6("CAST(CAST(sum(CAST(CASE WHEN m THEN w ELSE 0.0 END " +
        "AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE)") + " AS matched_mass FROM w"
  }
}
