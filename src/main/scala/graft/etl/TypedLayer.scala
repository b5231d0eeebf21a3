package graft.etl

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Typed curated layer (SURVEY.md §7.3 optional upgrade): the cleaned
  * trips frame as a `Dataset[TaxiTrip]` — compile-time column safety for
  * downstream code where the schema is fixed, at zero runtime cost (the
  * encoder maps straight onto the same Tungsten rows; plans and codegen
  * are unchanged, which TypedLayerSpec asserts).
  *
  * The raw layer stays untyped by design: its schema is inferred at
  * read time (SURVEY.md §1.3), so a case class cannot exist for it.
  */
object TypedLayer {

  /** One cleaned trip — the curated schema produced by
    * [[Transformations.cleanAndTransform]], selected to the stable
    * column set (the USING-join key first, per reference column order).
    */
  final case class TaxiTrip(
      payment_type: Int,
      tpep_pickup_datetime: Timestamp,
      tpep_dropoff_datetime: Timestamp,
      passenger_count: Int,
      trip_distance: Double,
      fare_amount: Double,
      total_amount: Double,
      trip_duration_min: Double,
      pickup_date: Date,
      pickup_hour: Int,
      pickup_dow: String,
      avg_speed_kmh: Double, // reference misnomer kept: value is mph
      payment_desc: Option[String], // lookup miss → None (left join)
  )

  implicit val taxiTripEncoder: Encoder[TaxiTrip] = Encoders.product[TaxiTrip]

  /** Cleaned frame → typed Dataset. A pure column selection + encoder
    * attach: no shuffle, no data movement, same physical plan.
    */
  def curated(clean: DataFrame): Dataset[TaxiTrip] =
    clean.select(
      col("payment_type"), col("tpep_pickup_datetime"),
      col("tpep_dropoff_datetime"), col("passenger_count"),
      col("trip_distance"), col("fare_amount"), col("total_amount"),
      col("trip_duration_min"), col("pickup_date"), col("pickup_hour"),
      col("pickup_dow"), col("avg_speed_kmh"), col("payment_desc"),
    ).as[TaxiTrip]

  /** Example typed consumers: field access is compile-checked — a
    * column rename upstream becomes a compile error here, not a silent
    * null. The grouping key is a typed lambda; the aggregates are
    * TypedColumns so partial aggregation is preserved.
    */
  def longTrips(trips: Dataset[TaxiTrip], minMiles: Double): Dataset[TaxiTrip] =
    trips.filter(t => t.trip_distance >= minMiles)

  def revenueByPayment(trips: Dataset[TaxiTrip]): DataFrame =
    trips
      .groupByKey(t => t.payment_desc.getOrElse("UNKNOWN"))(Encoders.STRING)
      .agg(
        count(lit(1)).as("n_trips").as[Long](Encoders.scalaLong),
        sum(col("total_amount")).as("revenue").as[Double](Encoders.scalaDouble),
      )
      .toDF("payment_desc", "n_trips", "revenue")
}
