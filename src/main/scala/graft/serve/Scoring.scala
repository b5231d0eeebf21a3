package graft.serve

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.feature.{OneHotEncoderModel, StringIndexerModel}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.regression.GBTRegressionModel
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

  /** Production fast path: the fitted pipeline's stages applied
    * driver-side to ONE assembled `ml.linalg` vector — indexer label
    * map + one-hot + assemble + `GBTRegressionModel.predict` — skipping
    * the per-request Catalyst analysis that dominates [[predict]]'s
    * ~36 ms warm p50 (the model math itself is microseconds of tree
    * walks). Parity-faithful serving keeps [[predict]] (the reference
    * pays the same per-request plan cost); this is the path a real
    * deployment would flip on, behind the `graft.serve.fast` system
    * property in [[HttpScoring]].
    *
    * Correctness is pinned by TrainerSpec: predictions are
    * bit-for-bit equal to `model.transform` across the whole test
    * fixture, the HALF_EVEN boundary rows, and an UNSEEN payment_type
    * (handleInvalid=keep → index nLabels → the dropped-last OHE
    * category → all-zero block, replicated here).
    */
  final class FastScorer private[serve] (model: PipelineModel) {
    private val indexer = model.stages.collectFirst {
      case m: StringIndexerModel => m
    }.getOrElse(sys.error("pipeline has no StringIndexerModel stage"))
    private val encoder = model.stages.collectFirst {
      case m: OneHotEncoderModel => m
    }.getOrElse(sys.error("pipeline has no OneHotEncoderModel stage"))
    private val gbt = model.stages.collectFirst {
      case m: GBTRegressionModel => m
    }.getOrElse(sys.error("pipeline has no GBTRegressionModel stage"))
    // StringIndexer casts its numeric input to string before lookup;
    // handleInvalid=keep maps unseen labels to nLabels (the extra
    // "__unknown" category the OHE metadata then carries)
    require(indexer.getHandleInvalid == "keep",
      s"FastScorer replicates handleInvalid=keep, got ${indexer.getHandleInvalid}")
    // the assembled layout below hardcodes the reference's column order
    locally {
      val asm = model.stages.collectFirst {
        case m: org.apache.spark.ml.feature.VectorAssembler => m
      }.getOrElse(sys.error("pipeline has no VectorAssembler stage"))
      val expected = Array("trip_distance", "trip_duration_min",
        "passenger_count", "pickup_hour", "payment_type_ohe")
      require(asm.getInputCols.sameElements(expected),
        s"unexpected assembler layout: ${asm.getInputCols.mkString(",")}")
    }
    private val labelIndex: Map[String, Int] =
      indexer.labelsArray(0).zipWithIndex.toMap
    private val nLabels = indexer.labelsArray(0).length
    private val catSize = encoder.categorySizes(0)
    private val oheLen = if (encoder.getDropLast) catSize - 1 else catSize

    /** Unrounded prediction — the exact double `model.transform` puts
      * in its `prediction` column.
      */
    def predictRaw(req: ScoringRequest): Double = {
      val idx = labelIndex.getOrElse(req.payment_type.toString, nLabels)
      if (idx >= catSize)
        throw new IllegalArgumentException(
          s"payment_type index $idx out of OHE range $catSize")
      val features = new Array[Double](4 + oheLen)
      features(0) = req.trip_distance
      features(1) = req.trip_duration_min
      features(2) = req.passenger_count.toDouble
      features(3) = req.pickup_hour.toDouble
      if (idx < oheLen) features(4 + idx) = 1.0 // last category → all zeros
      gbt.predict(Vectors.dense(features))
    }

    def predict(req: ScoringRequest): Double = round2(predictRaw(req))
  }

  def fastScorer(model: PipelineModel): FastScorer = new FastScorer(model)
}
