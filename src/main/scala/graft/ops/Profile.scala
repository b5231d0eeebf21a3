package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the first job anyone runs against an unfamiliar
  * 100 TB table: per-column cardinality, range, and exact quartiles in
  * ONE scan. Statistics here are the exact forms (count distinct,
  * percentile_disc); at full corpus scale the drop-ins are the sketch
  * versions (`approx_count_distinct`, `approx_percentile`) — this
  * operator pins the exact semantics those approximations are judged
  * against, the same contract as q_percentile vs q_percentile_approx.
  */
object Profile {

  /** Numeric profile: one output row per column with non-null count,
    * distinct count, min/max, and discrete quartiles (actual data
    * values, so results are engine-exact — interpolated percentiles
    * would not be).
    *
    * Shape: `unpivot` melts the projected columns into (column, v)
    * pairs — a narrow per-row expansion, columns × rows, no join — and
    * ONE hash aggregation groups by column name. The group count equals
    * the (small) profiled-column count, so the reduce side is trivial;
    * the sort inside percentile_disc is per-group. Null cells are
    * excluded by unpivot's melt semantics; `n_nonnull` reports what
    * remained.
    */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    val doubled = df.select(cols.map(c => col(c).cast("double").as(c)): _*)
    doubled
      .unpivot(Array.empty[Column], cols.map(col).toArray, "column", "v")
      .groupBy("column")
      .agg(
        count(col("v")).as("n_nonnull"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("mn"),
        max(col("v")).as("mx"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY v)").as("q1"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").as("median"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY v)").as("q3"))
  }
}
