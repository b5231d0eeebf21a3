package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Tables

/** ML-policy tests (SURVEY.md §5.3): tolerance and structure, not
  * hashes — the classifier must beat chance on its own heuristic labels
  * and survive a save/load round trip unchanged.
  */
class TextMLSpec extends SparkTestBase {

  lazy val docs = Tables.table(spark, Sf0001, "documents").cache()

  test("hashed TF-IDF features have the declared dimensionality") {
    val feat = TextML.hashingTfIdf(1 << 8).fit(docs).transform(docs)
    val v = feat.select("features").head()
      .getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(v.size == (1 << 8))
    assert(feat.count() == docs.count())
  }

  test("count-vectorizer vocabulary is exact and bounded") {
    val (_, feat) = TextML.countVectorizerModel(docs, vocabSize = 64)
    val v = feat.select("features").head()
      .getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(v.size <= 64)
  }

  test("quality classifier beats chance on held-out heuristic labels") {
    val (model, auc) = TextML.trainQualityModel(docs)
    assert(auc > 0.6, s"AUC $auc not above chance")
    val scored = TextML.scoreQuality(model, docs)
    assert(scored.count() == docs.count())
    assert(scored.filter(col("quality_p") < 0 || col("quality_p") > 1).count() == 0)
  }

  test("quality model save/load round trip scores identically") {
    import org.apache.spark.ml.PipelineModel
    val (model, _) = TextML.trainQualityModel(docs)
    val dir = tmpDir("qmodel")
    model.write.overwrite().save(dir)
    val reloaded = PipelineModel.load(dir)
    val a = TextML.scoreQuality(model, docs).collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = TextML.scoreQuality(reloaded, docs).collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a == b)
  }
}
