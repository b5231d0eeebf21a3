package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Partitioned parquet sinks + the trips_by_hour aggregation
  * (`/root/reference/src/pipeline/etl_writer.py:4-45`).
  *
  * Scale notes: `repartition(pickup_date)` aligns the shuffle with the
  * write partitioning so each date directory is written by exactly one
  * task (no small-file explosion); the aggregate is a partial+final
  * HashAggregate whose single shuffle carries only the grouped rows; the
  * `coalesce(4)` bounds output file count on the (small) agg table only —
  * never applied to the fact-table path.
  */
object EtlWriter {

  /** K1: curated layer, hive-partitioned by pickup_date
    * (`etl_writer.py:4-12`).
    */
  def writeCurated(df: DataFrame, path: String): Unit =
    df.repartition(col("pickup_date"))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("pickup_date")
      .parquet(path)

  /** A1: the trips_by_hour aggregate (`etl_writer.py:24-32`). Exposed
    * separately from the sink so queries/tests can exercise it.
    */
  def tripsByHour(df: DataFrame): DataFrame =
    df.groupBy("pickup_date", "pickup_hour")
      .agg(
        count(lit(1)).as("total_trips"),
        avg("trip_distance").as("avg_distance_mi"),
        avg("total_amount").as("avg_total_amount"),
        avg("trip_duration_min").as("avg_duration_min"),
      )

  /** K2 + O5: optional seeded sample, aggregate, preview, coalesced
    * partitioned write (`etl_writer.py:15-45`).
    */
  def writeAggregates(
      df: DataFrame,
      path: String,
      sampleFraction: Double = 0.05,
      show: Boolean = true,
  ): Unit = {
    val input =
      if (sampleFraction < 1.0)
        df.sample(withReplacement = false, sampleFraction, seed = 42)
      else df

    val agg = tripsByHour(input)
    if (show) agg.orderBy("pickup_date", "pickup_hour").show(10)

    agg
      .coalesce(4)
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("pickup_date")
      .parquet(path)
  }
}
