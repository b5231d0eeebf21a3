package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's relational core, operator-for-operator
  * (`/root/reference/src/features/transformations.py:4-48`): timestamp
  * casts, duration/date/hour/dow/speed derivations, the four filter
  * forms, and the broadcast left USING-join against the 6-row payment
  * lookup.
  *
  * Semantics preserved exactly — including the `avg_speed_kmh` misnomer
  * (the value is mph; `transformations.py:35-38`, SURVEY.md §7.5-7),
  * inclusive BETWEEN vs strict coordinate bounds, and the USING-join
  * placing `payment_type` first in the output schema.
  *
  * The whole function is lazy plan construction: filters collapse and
  * push below the projections via Catalyst (`CombineFilters` /
  * `PushDownPredicates`), and the join broadcasts — nothing here shuffles
  * the fact table, so the transform runs map-side at any scale.
  */
object Transformations {

  /** (payment_type, payment_desc) literal lookup
    * (`transformations.py:40-44`).
    */
  val PaymentLookup: Seq[(Int, String)] = Seq(
    1 -> "Credit card",
    2 -> "Cash",
    3 -> "No charge",
    4 -> "Dispute",
    5 -> "Unknown",
    6 -> "Voided trip",
  )

  def cleanAndTransform(dfRaw: DataFrame): DataFrame = {
    val spark = dfRaw.sparkSession

    val cast = dfRaw
      .withColumn("tpep_pickup_datetime", col("tpep_pickup_datetime").cast("timestamp"))
      .withColumn("tpep_dropoff_datetime", col("tpep_dropoff_datetime").cast("timestamp"))

    val withDuration = cast.withColumn(
      "trip_duration_min",
      (col("tpep_dropoff_datetime").cast("long") -
        col("tpep_pickup_datetime").cast("long")) / 60.0,
    )

    val filtered = withDuration
      .filter("trip_distance > 0 AND fare_amount > 0 AND total_amount > 0 AND passenger_count > 0")
      .filter("trip_duration_min BETWEEN 1 AND 180")
      .filter(
        (col("pickup_longitude") > -75) &&
          (col("pickup_longitude") < -72) &&
          (col("dropoff_longitude") > -75) &&
          (col("dropoff_longitude") < -72) &&
          (col("pickup_latitude") > 40) &&
          (col("pickup_latitude") < 42) &&
          (col("dropoff_latitude") > 40) &&
          (col("dropoff_latitude") < 42))

    val derived = filtered
      .withColumn("pickup_date", to_date(col("tpep_pickup_datetime")))
      .withColumn("pickup_hour", hour(col("tpep_pickup_datetime")))
      .withColumn("pickup_dow", date_format(col("tpep_pickup_datetime"), "E"))
      .withColumn(
        "avg_speed_kmh",
        col("trip_distance") / (col("trip_duration_min") / 60.0))
      .filter("avg_speed_kmh BETWEEN 0 AND 120")

    val paymentLookup =
      spark.createDataFrame(PaymentLookup).toDF("payment_type", "payment_desc")

    derived.join(broadcast(paymentLookup), Seq("payment_type"), "left")
  }
}
