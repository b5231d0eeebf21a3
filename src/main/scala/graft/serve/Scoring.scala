package graft.serve

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.SparkSession

/** Single-row model scoring, the engine-level core of the reference's
  * Flask endpoints (`/root/reference/src/api/app.py:20-44`,
  * `src/webapp/webapp.py:33-82`): validated 5-field record → 1-row
  * DataFrame → `model.transform` → prediction, rounded to 2 dp.
  *
  * Parity notes (SURVEY.md §5.3):
  *  - rounding is HALF_EVEN, matching Python's builtin `round` — Spark's
  *    `round` (HALF_UP) would differ on .xx5 boundaries;
  *  - the webapp's duration heuristic divides distance by a 12 mph
  *    average speed (`webapp.py:23,46-53`).
  */
object Scoring {

  /** The serving record, fixed by convention in the reference
    * (`app.py:10-16`).
    */
  final case class ScoringRequest(
      trip_distance: Double,
      trip_duration_min: Double,
      passenger_count: Int,
      pickup_hour: Int,
      payment_type: Int,
  )

  /** `AVG_SPEED_MPH` heuristic (`webapp.py:23`). */
  val AvgSpeedMph = 12.0

  /** Estimated duration in minutes from distance
    * (`webapp.py:46-53`).
    */
  def estimateDurationMin(tripDistance: Double): Double =
    if (AvgSpeedMph > 0) tripDistance / AvgSpeedMph * 60.0 else 10.0

  /** Python-`round` compatible 2-dp rounding (banker's/HALF_EVEN). */
  def round2(x: Double): Double =
    new JBigDecimal(x).setScale(2, RoundingMode.HALF_EVEN).doubleValue()

  def load(spark: SparkSession, modelPath: String): PipelineModel =
    PipelineModel.load(modelPath)

  /** One scoring round trip: 1-row local relation → pipeline transform →
    * head. Runs in-process in local mode, like the reference's Flask
    * worker.
    */
  def predict(spark: SparkSession, model: PipelineModel, req: ScoringRequest): Double = {
    import spark.implicits._
    val df = Seq(req).toDF()
    val p = model.transform(df).select("prediction").head().getDouble(0)
    round2(p)
  }
}
