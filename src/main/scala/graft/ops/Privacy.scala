package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audit for training-data release: k-anonymity and
  * l-diversity over declared quasi-identifier (QI) sets, plus the
  * suppression enforcement that makes a table releasable.
  *
  * The model (Sweeney's k-anonymity, Machanavajjhala's l-diversity): a
  * row is re-identifiable when its QI combination is shared by fewer
  * than k rows, and attribute-disclosable when its QI group carries
  * fewer than l distinct sensitive values. A release pipeline evaluates
  * a LADDER of generalization levels (fine → coarse QI spellings) and
  * picks the finest level whose residual risk is acceptable — so the
  * audit reports every level in one result, not one verdict.
  *
  * Scale shape: each level is ONE hash aggregate keyed on its QI
  * columns (count + count-distinct(sensitive) are both
  * partial-aggregable) followed by a 1-row reduction — no joins, no
  * windows, no driver loops; levels are independent scans unioned at
  * the end. Suppression is the same aggregate re-used as a semi-join
  * filter (broadcast when the surviving-group key set is small, shuffle
  * hash join otherwise — Catalyst's call via AQE).
  */
object Privacy {

  /** One generalization level: a label plus the QI columns (arbitrary
    * expressions, so "coarsen ts to month" is just `date_trunc`).
    */
  final case class QiLevel(label: String, qi: Seq[(String, Column)])

  /** The audit: one row per level —
    * (level, n_rows, n_groups, min_group_size, groups_below_k,
    *  rows_below_k, k_anonymous, groups_below_l, l_diverse).
    *
    * `rows_below_k` is the suppression cost of enforcing k at that
    * level; `groups_below_l` counts groups whose sensitive attribute
    * has < l distinct values (homogeneity attack surface). Null QI
    * values form their own group (SQL grouping semantics, identical in
    * the DuckDB oracle); null sensitive values are ignored by the
    * distinct count, so an all-null group counts as 0-diverse.
    */
  def kAnonymityAudit(
      df: DataFrame,
      levels: Seq[QiLevel],
      sensitive: Column,
      k: Int,
      l: Int): DataFrame = {
    require(levels.nonEmpty, "kAnonymityAudit needs at least one QI level")
    levels.map { lvl =>
      df.groupBy(lvl.qi.map { case (n, c) => c.as(n) }: _*)
        .agg(
          count(lit(1)).as("_n"),
          countDistinct(sensitive).as("_nd"))
        .agg(
          sum(col("_n")).as("n_rows"),
          count(lit(1)).as("n_groups"),
          min(col("_n")).as("min_group_size"),
          sum(when(col("_n") < k, 1L).otherwise(0L)).as("groups_below_k"),
          sum(when(col("_n") < k, col("_n")).otherwise(lit(0L)))
            .as("rows_below_k"),
          sum(when(col("_nd") < l, 1L).otherwise(0L)).as("groups_below_l"))
        .select(
          lit(lvl.label).as("level"),
          col("n_rows"), col("n_groups"), col("min_group_size"),
          col("groups_below_k"), col("rows_below_k"),
          (col("groups_below_k") === 0L).as("k_anonymous"),
          col("groups_below_l"),
          (col("groups_below_l") === 0L).as("l_diverse"))
    }.reduce(_.unionAll(_)).orderBy("level")
  }

  /** Suppression enforcement: drop every row whose QI group has fewer
    * than k members, returning the releasable remainder. The complement
    * of the audit's `rows_below_k` — `suppressToK(df, qi, k).count() ==
    * n_rows - rows_below_k` at the same level, which the spec asserts.
    *
    * Implemented as aggregate → semi join on the QI key (never a window
    * over the full table: the per-group count exists already at
    * aggregate granularity, and a window would force a second full
    * sort-shuffle of the fact rows).
    */
  def suppressToK(df: DataFrame, qi: Seq[(String, Column)], k: Int): DataFrame = {
    // withColumn, not select(*, …): a QI spelled as an existing column
    // (identity generalization) must replace it, not duplicate the name
    val keyed = qi.foldLeft(df) { case (acc, (n, c)) => acc.withColumn(n, c) }
    val bigEnough = keyed.groupBy(qi.map { case (n, _) => col(n) }: _*)
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= k)
      .select(qi.map { case (n, _) => col(n).as(s"_qik_$n") }: _*)
    // null-SAFE (<=>) semi-join keys: the audit's GROUP BY treats a null
    // QI value as its own group, so a null group of size ≥ k must
    // survive suppression too — a plain equi-semi-join is null-rejecting
    // and would silently drop it, breaking the documented invariant
    // `suppressToK(df, qi, k).count() == n_rows − rows_below_k`
    val cond = qi.map { case (n, _) => col(n) <=> col(s"_qik_$n") }
      .reduce(_ && _)
    keyed.join(bigEnough, cond, "left_semi")
  }

  /** ε-differentially-private count release (Dwork et al. 2006): one
    * grouped count per key with Laplace(1/ε) noise added via the
    * inverse-CDF transform — count queries have sensitivity 1, so
    * scale b = 1/ε. The uniform draw is the md5 hash of the group key
    * (the [[Corpus.hashBucket]] contract), NOT an OS RNG: the release
    * is replayable (same salt → same table, the property a governed
    * release pipeline and a hash gate both need), and the privacy
    * boundary is the secrecy of the salt — rotate it per release, as
    * PRG-seeded DP deployments do. The true count never leaves the
    * aggregate.
    *
    * Scale shape: ONE partial-aggregable hash aggregate; the noise is
    * a narrow per-group expression. Determinism: `u = (h + 0.5)/2²⁰`
    * is strictly inside (0,1) and never exactly ½, so
    * `−b·sign(u−½)·ln(1−2|u−½|)` is one libm ln per group, identical
    * cross-engine, r6'd once.
    */
  def noisyCounts(
      df: DataFrame,
      keys: Seq[String],
      epsilon: Double,
      salt: String = "dp"): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val buckets = 1 << 20
    val grouped = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_n"))
    val keyStr = concat_ws("|", keys.map(c => col(c).cast("string")): _*)
    val u = (Corpus.hashBucket(keyStr, salt, buckets).cast("double") +
      lit(0.5)) / lit(buckets.toDouble)
    val c = u - lit(0.5)
    val noise = lit(-1.0 / epsilon) * signum(c) *
      log(lit(1.0) - lit(2.0) * abs(c))
    grouped.select(
      keys.map(col) :+
        graft.queries.Det.r6(col("_n") + noise).as("noisy_n"): _*)
  }

  /** DuckDB spelling of [[noisyCounts]] for a single string key. */
  def noisyCountsOracleSql(
      table: String,
      key: String,
      epsilon: Double,
      salt: String = "dp"): String = {
    val r6 = graft.queries.Oracle.r6 _
    val b = 1 << 20
    val h = s"(('0x' || substr(md5('$salt' || $key::VARCHAR), 1, 8))" +
      s"::BIGINT % $b)"
    val u = s"(($h::DOUBLE + 0.5) / $b.0)"
    s"SELECT $key, " +
      r6(s"count(*) + (-1.0 / $epsilon) * sign($u - 0.5) * " +
        s"ln(1.0 - 2.0 * abs($u - 0.5))") +
      s" AS noisy_n FROM $table GROUP BY 1"
  }
}
