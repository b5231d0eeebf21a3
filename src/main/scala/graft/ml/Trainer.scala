package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fare-regression training pipeline mirroring
  * `/root/reference/src/models/trainer.py:10-140`: narrow select →
  * quality filters → dropna → seeded 2% sample capped at 300k → seeded
  * 80/20 split → StringIndexer→OneHotEncoder→VectorAssembler→GBTRegressor
  * → RMSE/MAE evaluation → model save.
  *
  * Hyperparameters default to the reference's (maxDepth=5, maxIter=60,
  * stepSize=0.1) but are injectable so tests can train small. The
  * sample+limit exists in the reference to bound single-VM training cost;
  * at cluster scale callers pass `sampleFraction = 1.0, maxRows = 0`.
  */
object Trainer {

  final case class Metrics(rmse: Double, mae: Double, trainRows: Long, testRows: Long)

  final case class TrainConfig(
      sampleFraction: Double = 0.02,
      maxRows: Int = 300000,
      maxDepth: Int = 5,
      maxIter: Int = 60,
      stepSize: Double = 0.1,
      seed: Long = 42L,
  )

  val FeatureCols: Seq[String] = Seq(
    "trip_distance", "trip_duration_min", "passenger_count",
    "pickup_hour", "payment_type", "total_amount")

  /** P7 + F5 + F6: the reference's pre-training projection and quality
    * filters (`trainer.py:22-40`). Strict bounds, unlike the ETL's
    * BETWEEN (SURVEY.md §7.5-8).
    */
  def prepare(df: DataFrame): DataFrame =
    df.select(FeatureCols.map(col): _*)
      .filter(
        (col("trip_distance") > 0) && (col("trip_distance") < 100) &&
          (col("trip_duration_min") > 0) && (col("trip_duration_min") < 240) &&
          (col("total_amount") > 0) && (col("total_amount") < 200))
      .na.drop()

  def buildPipeline(cfg: TrainConfig): Pipeline = {
    val indexer = new StringIndexer()
      .setInputCol("payment_type")
      .setOutputCol("payment_type_index")
      .setHandleInvalid("keep")
    val encoder = new OneHotEncoder()
      .setInputCols(Array("payment_type_index"))
      .setOutputCols(Array("payment_type_ohe"))
    val assembler = new VectorAssembler()
      .setInputCols(Array("trip_distance", "trip_duration_min",
        "passenger_count", "pickup_hour", "payment_type_ohe"))
      .setOutputCol("features")
    val gbt = new GBTRegressor()
      .setFeaturesCol("features")
      .setLabelCol("total_amount")
      .setMaxDepth(cfg.maxDepth)
      .setMaxIter(cfg.maxIter)
      .setStepSize(cfg.stepSize)
      .setSeed(cfg.seed)
    new Pipeline().setStages(Array(indexer, encoder, assembler, gbt))
  }

  def evaluate(preds: DataFrame): (Double, Double) = {
    def ev(metric: String) = new RegressionEvaluator()
      .setLabelCol("total_amount")
      .setPredictionCol("prediction")
      .setMetricName(metric)
      .evaluate(preds)
    (ev("rmse"), ev("mae"))
  }

  /** Full training flow; returns metrics and the fitted model (saved to
    * `modelPath` when non-empty). `onStage` receives per-stage
    * wall-clock (`fit` / `evaluate` / `save`) so callers (Bench) can
    * report the breakdown without re-instrumenting; the default drops
    * it. The prediction frame is cached across the two evaluator
    * passes — RegressionEvaluator runs one pass per metric, and
    * without the cache each pass re-runs `model.transform` over the
    * test fold (60 trees of scoring, twice).
    */
  def trainFareModel(
      df: DataFrame,
      modelPath: String,
      cfg: TrainConfig = TrainConfig(),
      onStage: (String, Double) => Unit = (_, _) => (),
  ): (PipelineModel, Metrics) = {
    def staged[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      onStage(name, (System.nanoTime() - t0) / 1e9)
      r
    }
    var mlDf = prepare(df)
    if (cfg.sampleFraction < 1.0)
      mlDf = mlDf.sample(withReplacement = false, cfg.sampleFraction, cfg.seed)
    if (cfg.maxRows > 0) mlDf = mlDf.limit(cfg.maxRows)

    val Array(train, test) = mlDf.randomSplit(Array(0.8, 0.2), cfg.seed)
    train.cache(); test.cache()

    val model = staged("fit")(buildPipeline(cfg).fit(train))
    val preds = model.transform(test).cache()
    val (rmse, mae) = staged("evaluate")(evaluate(preds))
    val metrics = Metrics(rmse, mae, train.count(), test.count())

    if (modelPath.nonEmpty)
      staged("save")(model.write.overwrite().save(modelPath))
    preds.unpersist(); train.unpersist(); test.unpersist()
    (model, metrics)
  }
}
