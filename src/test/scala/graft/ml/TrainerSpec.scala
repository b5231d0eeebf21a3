package graft.ml

import org.apache.spark.ml.PipelineModel

import graft.SparkTestBase
import graft.etl.Transformations
import graft.serve.Scoring
import graft.sources.Tables

class TrainerSpec extends SparkTestBase {

  // small config: full fixture, shallow/short GBT — semantics, not quality
  val cfg = Trainer.TrainConfig(sampleFraction = 1.0, maxRows = 0, maxIter = 3)

  lazy val clean =
    Transformations.cleanAndTransform(Tables.csvInfer(spark, FixtureCsv)).cache()

  lazy val trained: (PipelineModel, Trainer.Metrics) = {
    val path = tmpDir("model") + "/fare_model"
    val r = Trainer.trainFareModel(clean, path, cfg)
    (PipelineModel.load(path), r._2) // round-trip through disk (M7)
  }

  test("training produces finite metrics and a loadable model") {
    val (_, m) = trained
    assert(m.rmse.isFinite && m.rmse > 0)
    assert(m.mae.isFinite && m.mae > 0 && m.mae <= m.rmse)
    assert(m.trainRows > 0 && m.testRows > 0)
  }

  test("split is disjoint and complete") {
    val prepared = Trainer.prepare(clean)
    val n = prepared.count()
    val Array(tr, te) = prepared.randomSplit(Array(0.8, 0.2), 42L)
    assert(tr.count() + te.count() == n)
    assert(tr.intersect(te).count() <= // identical rows may repeat in data
      prepared.groupBy(Trainer.FeatureCols.map(org.apache.spark.sql.functions.col): _*)
        .count().filter("count > 1").count())
  }

  test("save/load round-trip predicts identically (M7)") {
    val (loaded, _) = trained
    val sample = Trainer.prepare(clean).limit(20).cache()
    val direct = Trainer.trainFareModel(clean, "", cfg)._1
    val a = direct.transform(sample).select("prediction").collect().map(_.getDouble(0))
    val b = loaded.transform(sample).select("prediction").collect().map(_.getDouble(0))
    assert(a.sameElements(b))
  }

  test("reference-config training at training scale lands near baseline quality") {
    // BASELINE.md rows 8-9: RMSE 3.2709 / MAE 1.1268, trained on a
    // ~300k-row sample with maxDepth=5/maxIter=60/stepSize=0.1, seed 42.
    // SyntheticTaxi is calibrated to that regime; ±10% keeps the gate
    // meaningful (a broken pipeline misses by far more) without pinning
    // exact GBT arithmetic. Expected standing gap (round-5 verdict):
    // RMSE lands BELOW baseline (~3.18) while MAE lands ~5% ABOVE
    // (~1.19). That pattern is the error-profile difference between the
    // real taxi data and SyntheticTaxi, not a training defect: the
    // synthetic fare noise is lighter-tailed than real fares (fewer
    // extreme outliers → lower RMSE, which squares tails) but more
    // uniformly spread across rows (more small residuals → higher MAE,
    // which weights all rows equally). Both metrics must still sit
    // inside the ±10% band; a pipeline bug moves them together and far.
    // ~50 s on local[4]: the one full-size fit in the suite, exercising
    // the real hyperparameters end-to-end.
    val taxi = SyntheticTaxi.frame(spark, 300000)
    val (_, m) = Trainer.trainFareModel(taxi, "",
      Trainer.TrainConfig(sampleFraction = 1.0, maxRows = 0))
    assert(math.abs(m.rmse - 3.2709) / 3.2709 < 0.10,
      s"RMSE ${m.rmse} off baseline 3.2709 by >10%")
    assert(math.abs(m.mae - 1.1268) / 1.1268 < 0.10,
      s"MAE ${m.mae} off baseline 1.1268 by >10%")
    assert(m.trainRows + m.testRows > 290000)
  }

  test("scoring: single request round trip with HALF_EVEN rounding") {
    val (model, _) = trained
    val req = Scoring.ScoringRequest(
      trip_distance = 2.5,
      trip_duration_min = Scoring.estimateDurationMin(2.5),
      passenger_count = 1, pickup_hour = 9, payment_type = 1)
    val p = Scoring.predict(spark, model, req)
    assert(p.isFinite)
    assert(p == Scoring.round2(p)) // idempotent 2-dp
  }

  test("fast scorer equals model.transform bit-for-bit across the fixture (r13)") {
    // the production fast path (driver-side indexer map + OHE +
    // assemble + GBT tree walk) must be indistinguishable from the
    // 1-row-plan transform path — including the handleInvalid=keep
    // branch (unseen payment_type → dropped-last OHE category)
    import spark.implicits._
    val (model, _) = trained
    val scorer = Scoring.fastScorer(model)
    val fixture = Trainer.prepare(clean).limit(50).collect().map { r =>
      Scoring.ScoringRequest(
        r.getAs[Double]("trip_distance"), r.getAs[Double]("trip_duration_min"),
        r.getAs[Int]("passenger_count"), r.getAs[Int]("pickup_hour"),
        r.getAs[Int]("payment_type"))
    }
    val reqs = fixture ++ Seq(
      Scoring.ScoringRequest(2.5, 12.5, 1, 9, 99), // unseen payment_type
      Scoring.ScoringRequest(0.0, 0.0, 0, 0, 1), // degenerate corner
      Scoring.ScoringRequest(99.99, 239.9, 6, 23, 2)) // upper bounds
    val df = reqs.zipWithIndex
      .map { case (r, i) => (i, r.trip_distance, r.trip_duration_min,
        r.passenger_count, r.pickup_hour, r.payment_type) }
      .toSeq
      .toDF("id", "trip_distance", "trip_duration_min",
        "passenger_count", "pickup_hour", "payment_type")
    val expected = model.transform(df)
      .orderBy("id").select("prediction").collect().map(_.getDouble(0))
    val got = reqs.map(scorer.predictRaw)
    assert(got.length == expected.length && got.length > 50)
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(java.lang.Double.doubleToRawLongBits(g) ==
        java.lang.Double.doubleToRawLongBits(e),
        s"row $i: fast $g vs transform $e")
    }
    // the rounded serving value rides the shared HALF_EVEN round2
    reqs.take(3).foreach { r =>
      assert(scorer.predict(r) == Scoring.predict(spark, model, r))
    }
  }

  test("scoring CLI: line protocol with heuristic fill and error path") {
    import graft.serve.ScoringMain
    val (model, _) = trained
    val out = ScoringMain.scoreLines(spark, model, Iterator(
      "2.5, 12.5, 1, 9, 1", // full 5-field record
      "2.5, 1, 9, 1", // 4 fields → duration heuristic
      "", // blank skipped
      "2.5, oops, 1, 9, 1", // bad number → ERROR line
    )).toList
    assert(out.length == 3)
    assert(out(0).toDouble.isFinite && out(1).toDouble.isFinite)
    assert(out(2).startsWith("ERROR:"))
    // 4-field line equals a 5-field line with the heuristic duration
    val manual = ScoringMain.scoreLines(spark, model,
      Iterator(s"2.5, ${Scoring.estimateDurationMin(2.5)}, 1, 9, 1")).toList
    assert(out(1) == manual.head)
  }

  test("round2 is banker's rounding (Python round parity)") {
    assert(Scoring.round2(2.125) == 2.12) // 2.125 dyadic-exact, HALF_EVEN down
    assert(Scoring.round2(2.375) == 2.38) // exact, HALF_EVEN up
    assert(Scoring.round2(-2.125) == -2.12)
    assert(Scoring.round2(1.005) == 1.0)  // 1.005 stored below boundary
  }

  test("duration heuristic matches webapp formula") {
    assert(Scoring.estimateDurationMin(12.0) == 60.0)
    assert(Scoring.estimateDurationMin(2.5) == 2.5 / 12.0 * 60.0)
  }
}
