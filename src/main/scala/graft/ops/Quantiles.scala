package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact global quantiles by distributed selection — the 100 TB form
  * of `percentile_disc`, which (like any exact-percentile AGGREGATE)
  * must buffer the value multiset and so cannot scale past one
  * executor's memory for a global (ungrouped) quantile.
  *
  * Two passes, neither with a global sort:
  *   1. bucket histogram — one hash aggregate keyed on `floor(value)`
  *      (coarse value-domain buckets), then cumulative counts over the
  *      AGGREGATED frame (bounded by the value domain, not the data;
  *      the q_ks_drift/q_auc bucket-decomposition discipline), locating
  *      for each requested rank its target bucket and the count of
  *      values below that bucket;
  *   2. in-bucket selection — only rows landing in a target bucket
  *      (an equi-join against the broadcast target list) get a
  *      per-target `row_number` ordered by value, and the row whose
  *      in-bucket ordinal equals `rank − below` is the answer. The
  *      window partitions by target, so its width is one bucket's
  *      occupancy — bounded by the histogram granularity, never n.
  *
  * Rank semantics: 1-based `ceil(q·n)` over ascending non-null values
  * (the lower-value discrete quantile). Ties are harmless: ordinal
  * selection returns the same VALUE whatever order equal values take.
  * Exactness: no float accumulates — counts are integral and the
  * selected value is a data value, so the result hash-checks exactly.
  */
object Quantiles {

  def exactQuantiles(
      df: DataFrame,
      valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must lie in (0, 1]")
    val v = col(valueCol)
    val vals = df.filter(v.isNotNull).select(v.as("_v"))
    val hist = vals.groupBy(floor(col("_v")).cast("long").as("_b"))
      .agg(count(lit(1)).as("_c"))
    // cumulative over the aggregated histogram (bounded frame): count
    // strictly below each bucket, plus the global n on every row
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("_b").rowsBetween(Long.MinValue, -1)
    val cum = hist.select(col("_b"), col("_c"),
      coalesce(sum(col("_c")).over(w), lit(0L)).as("_below"),
      sum(col("_c")).over(
        org.apache.spark.sql.expressions.Window
          .orderBy("_b").rowsBetween(Long.MinValue, Long.MaxValue))
        .as("_n"))
    // one target row per requested quantile: its rank and its bucket
    val targets = qs.map { q =>
      cum
        .select(lit(q).as("q"), ceil(lit(q) * col("_n")).cast("long").as("rank"),
          col("_b"), col("_below"), col("_n"), col("_c"))
        .filter(col("rank") > col("_below") &&
          col("rank") <= col("_below") + col("_c"))
        .drop("_c")
    }.reduce(_.unionAll(_))
    val inBucket = vals
      .join(broadcast(targets), floor(col("_v")).cast("long") === col("_b"))
    val rn = org.apache.spark.sql.expressions.Window
      .partitionBy("q").orderBy("_v")
    inBucket
      .select(col("q"), col("rank"), col("_n").as("n"), col("_v"),
        row_number().over(rn).as("_rn"))
      .filter(col("_rn") === col("rank") - col("_below"))
      .select(col("q"), col("rank"), col("n"), col("_v").as("value"))
      .orderBy("q")
  }

  /** DuckDB spelling of [[exactQuantiles]]: the brute global
    * `row_number() OVER (ORDER BY value)` selection — single-threaded
    * SQL may — picking each `ceil(q·n)` ordinal.
    */
  def exactQuantilesOracleSql(
      tableExpr: String,
      valueCol: String,
      qs: Seq[Double]): String = {
    // ::DOUBLE forced on q: DuckDB's exact-DECIMAL literal would make
    // ceil(q·n) land differently from Spark's IEEE product when q·n
    // sits on an integer in decimal but an ulp above it in double
    val sel = qs.map { q =>
      s"SELECT $q::DOUBLE AS q, " +
        s"CAST(ceil($q::DOUBLE * (SELECT n FROM nn)) AS BIGINT) AS rank"
    }.mkString(" UNION ALL ")
    s"WITH vals AS (SELECT $valueCol AS v FROM $tableExpr " +
      s"WHERE $valueCol IS NOT NULL), " +
      "nn AS (SELECT count(*)::BIGINT AS n FROM vals), " +
      "ord AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM vals), " +
      s"tgt AS ($sel) " +
      "SELECT tgt.q, tgt.rank, nn.n, ord.v AS value " +
      "FROM tgt CROSS JOIN nn JOIN ord ON ord.rn = tgt.rank ORDER BY q"
  }

  /** Range-partition plan + balance audit: the boundaries a sorted
    * write / range-bucketed layout would use, computed from EXACT
    * quantiles ([[exactQuantiles]] at q = k/B), and the per-partition
    * row counts that result — `load_ratio` (count ÷ ideal n/B, r6)
    * makes boundary skew a number. This is the planning step behind
    * repartitionByRange / sorted-bucket writers, made inspectable: at
    * 100 TB the difference between a balanced and an eyeballed range
    * split is a straggler executor per skewed partition.
    *
    * Scale shape: the quantile pass is [[exactQuantiles]] (two passes,
    * no global sort); assignment is a 1-row broadcast of the B−1
    * boundary array + a narrow `size(filter(...))` per row; the audit
    * aggregate is B-row bounded, as is its total window. Boundary-tie
    * semantics: a value EQUAL to a boundary stays in the lower
    * partition (strict `v > boundary` counting), identical in the
    * oracle.
    */
  def rangePartitionPlan(
      df: DataFrame,
      valueCol: String,
      numPartitions: Int): DataFrame = {
    require(numPartitions >= 2, "a range plan needs at least 2 partitions")
    val qs = (1 until numPartitions).map(_.toDouble / numPartitions)
    val bounds = exactQuantiles(df, valueCol, qs)
      .agg(sort_array(collect_list(col("value"))).as("_bounds"))
    val v = col(valueCol)
    val assigned = df.filter(v.isNotNull)
      .crossJoin(broadcast(bounds))
      .select(v.as("_v"),
        size(filter(col("_bounds"), b => v > b)).cast("long")
          .as("partition_id"))
    val perPart = assigned.groupBy("partition_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col("_v")).as("lo"), max(col("_v")).as("hi"))
    val total = org.apache.spark.sql.expressions.Window
      .orderBy("partition_id").rowsBetween(Long.MinValue, Long.MaxValue)
    perPart
      .withColumn("load_ratio", graft.queries.Det.r6(
        col("n_rows").cast("double") * numPartitions /
          sum(col("n_rows")).over(total).cast("double")))
      .orderBy("partition_id")
  }

  /** DuckDB spelling of [[rangePartitionPlan]]: the quantile oracle as
    * a CTE, boundaries gathered into a sorted list, the same strict
    * `v > boundary` assignment.
    */
  def rangePartitionPlanOracleSql(
      tableExpr: String,
      valueCol: String,
      numPartitions: Int): String = {
    val qs = (1 until numPartitions).map(_.toDouble / numPartitions)
    val r6 = graft.queries.Oracle.r6 _
    val qsql = exactQuantilesOracleSql(tableExpr, valueCol, qs)
    s"WITH bl AS (SELECT list(value ORDER BY value) AS bounds FROM " +
      s"($qsql)), " +
      s"assigned AS (SELECT $valueCol AS _v, " +
      s"len(list_filter(bl.bounds, b -> $valueCol > b))::BIGINT " +
      s"AS partition_id FROM $tableExpr CROSS JOIN bl " +
      s"WHERE $valueCol IS NOT NULL), " +
      "pp AS (SELECT partition_id, count(*)::BIGINT AS n_rows, " +
      "min(_v) AS lo, max(_v) AS hi FROM assigned GROUP BY 1) " +
      "SELECT partition_id, n_rows, lo, hi, " +
      r6(s"CAST(n_rows AS DOUBLE) * $numPartitions / " +
        "CAST(sum(n_rows) OVER () AS DOUBLE)") +
      " AS load_ratio FROM pp ORDER BY partition_id"
  }
}
