package graft.ops

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{CountVectorizer, HashingTF, IDF, Tokenizer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** spark.ml text featurization + model-based quality scoring (SURVEY.md
  * §7.4's ml.feature surface): the ML leg of a training-data pipeline,
  * where a cheap classifier trained on heuristic labels replaces the
  * heuristic at scoring time (the standard quality-filter bootstrap).
  *
  * Two featurizers, chosen by corpus size:
  *  - [[hashingTfIdf]]: HashingTF is stateless (no vocabulary fit pass,
  *    no driver-held vocab) — the 100 TB default; collisions are the
  *    price.
  *  - [[countVectorizerModel]]: exact vocabulary, needs a fit pass and
  *    holds vocabSize terms on the driver — for bounded vocabularies.
  *
  * Labels come from [[TextAnalysis.qualityScore]] thresholding — fully
  * deterministic, so train/test results are reproducible run to run
  * (LR on a fixed feature matrix is deterministic; only oracle
  * cross-checking is impossible, per SURVEY §5.3 ML policy: tolerance
  * tests, not hashes).
  */
object TextML {

  /** Stateless TF-IDF featurization pipeline (fit only trains IDF). */
  def hashingTfIdf(numFeatures: Int = 1 << 12): Pipeline = {
    val tok = new Tokenizer().setInputCol("text").setOutputCol("toks")
    val tf = new HashingTF()
      .setInputCol("toks").setOutputCol("tf").setNumFeatures(numFeatures)
    val idf = new IDF().setInputCol("tf").setOutputCol("features")
    new Pipeline().setStages(Array(tok, tf, idf))
  }

  /** Exact-vocabulary counts (fit pass builds the vocab). */
  def countVectorizerModel(df: DataFrame, vocabSize: Int = 1 << 12): (PipelineModel, DataFrame) = {
    val tok = new Tokenizer().setInputCol("text").setOutputCol("toks")
    val cv = new CountVectorizer()
      .setInputCol("toks").setOutputCol("features").setVocabSize(vocabSize)
    val model = new Pipeline().setStages(Array(tok, cv)).fit(df)
    (model, model.transform(df))
  }

  /** Quality classifier: heuristic-labelled LR over hashed TF-IDF.
    * Returns the fitted pipeline and the held-out AUC.
    *
    * `labelThreshold = None` (default) splits at the corpus median
    * quality — guarantees both classes exist whatever the corpus's
    * score distribution (a fixed absolute threshold can degenerate to
    * one class, and LR on one class learns nothing).
    */
  def trainQualityModel(
      docs: DataFrame,
      labelThreshold: Option[Double] = None,
      seed: Long = 42L): (PipelineModel, Double) = {
    val toks = TextAnalysis.tokens(col("text"))
    val withQ = docs.withColumn(
      "q", TextAnalysis.qualityScore(col("text"), toks))
    val threshold = labelThreshold.getOrElse(
      withQ.stat.approxQuantile("q", Array(0.5), 0.001).head)
    val labelled = withQ
      .withColumn("label", (col("q") >= threshold).cast("double"))
      .drop("q")
    val Array(train, test) = labelled.randomSplit(Array(0.8, 0.2), seed)
    val lr = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol("label").setMaxIter(20)
    val pipeline = new Pipeline().setStages(hashingTfIdf().getStages :+ lr)
    val model = pipeline.fit(train)
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC")
      .evaluate(model.transform(test))
    (model, auc)
  }

  /** Score a corpus with a trained quality model: P(quality). */
  def scoreQuality(model: PipelineModel, docs: DataFrame): DataFrame = {
    val p1 = ColumnOpsHelper.vectorElement(col("probability"), 1)
    model.transform(docs)
      .select(col("doc_id"), p1.as("quality_p"))
  }

  private object ColumnOpsHelper {
    import org.apache.spark.ml.functions.vector_to_array
    def vectorElement(v: org.apache.spark.sql.Column, i: Int): org.apache.spark.sql.Column =
      element_at(vector_to_array(v), i + 1)
  }
}
