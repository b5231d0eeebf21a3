package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregation via mergeable partial state — the
  * daily-rollup production pattern: each batch (day, hour, partition)
  * reduces to a small per-key STATE table; the running total is a merge
  * of states, so history is never rescanned. At 100 TB this is the
  * difference between an O(day) and an O(history) daily job.
  *
  * The state schema is the classic decomposable-aggregate tuple —
  * (n, sum, min, max) per key — chosen so every supported final
  * aggregate (count, sum, avg, min, max) is derivable from merged
  * state by a pure projection: count/sum/min/max merge associatively,
  * avg = merged sum / merged n (NOT an average of averages). Sums ride
  * DECIMAL so merge order can never perturb a bit — the same
  * discipline Spark's own partial aggregation relies on is here made
  * durable across job boundaries.
  *
  * Merging is itself a group-by over concatenated states, so states
  * from any number of batches (or a state with a new batch's state)
  * merge in one shuffle of state-sized — not data-sized — input.
  */
object Incremental {

  /** Reduce one batch to per-key partial state:
    * (keys..., n, sum_v DECIMAL(38,6), min_v, max_v).
    */
  def partialState(batch: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(
        count(col(valueCol)).as("n"),
        sum(col(valueCol).cast("decimal(25,6)")).cast("decimal(38,6)").as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Merge any number of state tables into one (associative +
    * commutative — batch order cannot matter).
    */
  def mergeStates(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_v")).cast("decimal(38,6)").as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }

  /** Final aggregates from merged state — count/sum/min/max pass
    * through; avg derives as sum/n (exact decimal division then one
    * double cast, the [[graft.queries.Det]] discipline).
    */
  def finalize(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(
      keys.map(col) ++ Seq(
        col("n"),
        col("sum_v").cast("double").as("sum_v"),
        col("min_v"), col("max_v"),
        graft.queries.Det.r6(
          col("sum_v").cast("double") / col("n")).as("avg_v")): _*)
}
