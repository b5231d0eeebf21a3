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
}
