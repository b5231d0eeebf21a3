package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Det._

/** Time-series regularization and history tracking over event logs:
  * resampling onto a fixed grid with forward fill, and SCD2 (slowly
  * changing dimension) validity intervals from a change log.
  *
  * Scale shape: both operators shuffle once on the series key; the
  * resample spine is derived from the already-aggregated frame (one row
  * per key-bucket, not per event) and the per-key window passes reuse
  * that partitioning. Nothing is proportional to the raw event count
  * after the first aggregate.
  */
object TimeSeries {

  /** Resample events onto a per-key `unit` grid (every bucket between the
    * key's first and last active bucket), with event counts, per-bucket
    * value sums, and last-observation-carried-forward `filled_value`.
    * The first bucket of every key has data by construction, so the fill
    * never emits a leading null.
    */
  def resampleFill(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      unit: String = "hour"): DataFrame = {
    val bucketed = events
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n_events"), dsum(col(valueCol)).as("sum_value"))
    val spine = bucketed
      .groupBy(keyCol)
      .agg(min(col("bucket")).as("_lo"), max(col("bucket")).as("_hi"))
      .select(col(keyCol),
        explode(sequence(col("_lo"), col("_hi"), expr(s"INTERVAL 1 $unit")))
          .as("bucket"))
    val w = Window.partitionBy(keyCol).orderBy("bucket")
    spine
      .join(bucketed, Seq(keyCol, "bucket"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("filled_value",
        last(col("sum_value"), ignoreNulls = true).over(w))
  }

  /** SCD2 history from a change log: collapse consecutive repeats of
    * `attrCol` per key, then derive [valid_from, valid_to) intervals
    * (null valid_to = current row). Two per-key window passes over the
    * same partitioning — Catalyst plans one exchange. Ordering ties
    * break on `idCol` for determinism.
    */
  def scd2(
      log: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      attrCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val changed = log
      .withColumn("_prev", lag(col(attrCol), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col(attrCol))
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(attrCol).as("state"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }

  /** Exponentially time-decayed per-key value sums — the recency-
    * weighted feature ("a purchase last week counts double one from two
    * weeks ago"): each event contributes `value × 0.5^(age/halfLife)`
    * with age in WHOLE half-life units against the corpus's last day,
    * plus the undecayed sum and the decayed/undecayed ratio as the
    * recency score.
    *
    * Cross-engine exactness WITHOUT the 6-dp rounding discipline:
    * integer ages make every weight 0.5^k — a dyadic rational both
    * engines' `pow` return exactly — so each product is one correctly-
    * rounded double multiply, and the sum rides DECIMAL. One narrow
    * projection + one aggregate; the 1-row max-day frame broadcasts.
    */
  def decayedSum(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      halfLifeDays: Int): DataFrame = {
    val maxDay = events.agg(
      date_trunc("day", max(col(tsCol))).as("_max_day"))
    events
      .crossJoin(broadcast(maxDay))
      .withColumn("_age",
        floor(datediff(col("_max_day"), date_trunc("day", col(tsCol)))
          / halfLifeDays).cast("int"))
      .withColumn("_w", pow(lit(0.5), col("_age")))
      .groupBy(keyCol)
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col(valueCol)).as("sum_value"),
        dsum(col(valueCol) * col("_w")).as("decayed_value"))
      .withColumn("recency",
        graft.queries.Det.r6(col("decayed_value") / col("sum_value")))
  }

  /** Offline CUSUM change-point detection per key: the maximum absolute
    * cumulative deviation of `valCol` from the key's own mean, and the
    * earliest time attaining it — the classic single-change-point test
    * statistic (a level shift makes the partial sums drift to a peak AT
    * the change; a stable series random-walks near zero). Emits per
    * key: n, the normalized statistic max|S_i|/n (r6), and `change_ts`.
    *
    * EXACT-arithmetic trick: instead of deviations from the double
    * mean (whose rounding would contaminate every partial sum), the
    * partial sums are computed n-SCALED — S'_i = n·prefix_i − i·total,
    * all DECIMAL/integer ops — so the running values, the max, and the
    * argmax tie-compare are bit-exact in both engines; the ONLY double
    * op is the final /n² normalization, then r6. (S'_i = n²·(classic
    * CUSUM_i), hence the squared normalizer.)
    *
    * Scale shape: one per-key aggregate for (n, total), a key-keyed
    * join back, one prefix-sum window PARTITIONED BY the key (per-key
    * sequences, never a global order), one final per-key aggregate.
    */
  /** Day-of-week seasonality profile: per (key, weekday) event counts,
    * the weekday's share of the key's activity, and its deviation from
    * the uniform 1/7 — the weekly-rhythm audit behind staffing, alert
    * thresholds, and "is this feed batch-dumping on Mondays". Weekday
    * numbering is Spark's `dayofweek` (1 = Sunday); the oracle maps
    * DuckDB's 0-based dow to match. One (key, dow) aggregate plus a
    * key-total join — key×7-sized output.
    */
  def dayOfWeekProfile(
      events: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val counts = events
      .groupBy(col(keyCol), dayofweek(col(tsCol)).as("dow"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col(keyCol)).agg(sum(col("n")).as("_tot"))
    counts.join(broadcast(totals), keyCol)
      .select(col(keyCol), col("dow"), col("n"),
        graft.queries.Det.r6(col("n").cast("double") / col("_tot")).as("share"),
        graft.queries.Det.r6(
          col("n").cast("double") / col("_tot") - lit(1.0) / lit(7.0))
          .as("dev"))
  }

  /** Lag-1 autocorrelation of per-key daily counts: Pearson r between
    * each day's count and the NEXT calendar day's (pairs exist only
    * where both days do — the date-arithmetic join, not a lead window,
    * so a gap in the series never pairs non-adjacent days). All moment
    * sums (n, Σx, Σy, Σxy, Σx², Σy²) are exact BIGINTs; r is one
    * identical double tree, r6'd — the q_anomaly discipline. Keys with
    * zero variance on either side report NULL (both engines would
    * produce NaN from 0/0, but NULL survives the driver hash); keys
    * with NO adjacent-day pair at all (sparse series) are absent.
    *
    * The burstiness/routine signal: r ≈ 1 means busy days follow busy
    * days; r < 0 means activity alternates.
    */
  def dailyAutocorrelation(
      events: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("c"))
    val nxt = daily.select(col(keyCol), col("day").as("_d2"), col("c").as("y"))
    val pairs = daily
      .withColumn("_d2", date_add(col("day"), 1))
      .join(nxt, Seq(keyCol, "_d2"))
      .select(col(keyCol), col("c").as("x"), col("y"))
    val m = pairs.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("x")).as("_sx"), sum(col("y")).as("_sy"),
      sum(col("x") * col("y")).as("_sxy"),
      sum(col("x") * col("x")).as("_sxx"),
      sum(col("y") * col("y")).as("_syy"))
    val n = col("n_pairs").cast("double")
    val vx = n * col("_sxx").cast("double") -
      col("_sx").cast("double") * col("_sx").cast("double")
    val vy = n * col("_syy").cast("double") -
      col("_sy").cast("double") * col("_sy").cast("double")
    val cov = n * col("_sxy").cast("double") -
      col("_sx").cast("double") * col("_sy").cast("double")
    m.select(col(keyCol), col("n_pairs"),
      when(vx > 0 && vy > 0, graft.queries.Det.r6(cov / sqrt(vx * vy)))
        .as("autocorr"))
  }

  def cusumChangePoint(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valCol).cast("decimal(25,6)")
    val stats = events.groupBy(col(keyCol))
      .agg(count(lit(1)).as("_n"), sum(v).as("_tot"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seq = events.join(stats, Seq(keyCol))
      .withColumn("_pre", sum(v).over(
        Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_i", count(lit(1)).over(w))
      // explicit DECIMAL(12,0)×DECIMAL(24,6) operand casts: the product
      // stays within precision 38 (exact, no decimal rounding) in BOTH
      // engines — unbounded bigint×decimal(38,6) would overflow
      // DuckDB's width rules
      .withColumn("_s", abs(
        col("_n").cast("decimal(12,0)") * col("_pre").cast("decimal(24,6)") -
          col("_i").cast("decimal(12,0)") * col("_tot").cast("decimal(24,6)")))
    val peak = seq.groupBy(col(keyCol))
      .agg(max(col("_s")).as("_mx"), max(col("_n")).as("n"))
    seq.join(peak, Seq(keyCol))
      .filter(col("_s") === col("_mx"))
      .groupBy(col(keyCol))
      .agg(
        max(col("n")).as("n"),
        // double cast BEFORE the division: decimal÷bigint would round
        // by decimal scale rules, which the two engines spell
        // differently — one IEEE division is bit-portable
        graft.queries.Det.r6(
          max(col("_mx")).cast("double") /
            (max(col("n")) * max(col("n"))).cast("double")).as("cusum"),
        min(col(tsCol)).as("change_ts"))
  }
}
