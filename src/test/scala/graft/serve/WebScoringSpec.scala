package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkTestBase
import graft.etl.Transformations
import graft.ml.Trainer
import graft.sources.Tables

/** Real HTTP round-trips against the HTML front-end — flow parity with
  * the reference webapp (`src/webapp/webapp.py:26-82`): form render,
  * form post with the distance→duration heuristic, and the
  * 500-with-error-rendered failure path.
  */
class WebScoringSpec extends SparkTestBase {

  private lazy val model = {
    val clean = Transformations.cleanAndTransform(Tables.csvInfer(spark, FixtureCsv))
    Trainer.trainFareModel(clean, "",
      Trainer.TrainConfig(sampleFraction = 1.0, maxRows = 0, maxIter = 3))._1
  }

  private def withServer[A](f: (HttpClient, Int) => A): A = {
    val server = WebScoring.start(spark, model, 0) // ephemeral port
    try f(HttpClient.newHttpClient(), server.getAddress.getPort)
    finally server.stop(0)
  }

  private def post(c: HttpClient, port: Int, form: String): HttpResponse[String] =
    c.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port/predict_web"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(form)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("GET /: renders the empty form with the reference's field names") {
    withServer { (c, port) =>
      val resp = c.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:$port/")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      assert(resp.headers().firstValue("Content-Type").orElse("").startsWith("text/html"))
      val html = resp.body()
      Seq("trip_distance", "passenger_count", "pickup_hour", "payment_type")
        .foreach(f => assert(html.contains(s"""name="$f""""), s"missing field $f"))
      // all six payment options, reference labels
      Seq("Credit Card", "Cash", "No Charge", "Dispute", "Unknown", "Voided trip")
        .foreach(l => assert(html.contains(l), s"missing option $l"))
      assert(html.contains("""action="/predict_web""""))
      assert(!html.contains("Estimated fare"), "empty form must not show a result")
    }
  }

  test("POST /predict_web: derives duration from distance and renders the fare") {
    withServer { (c, port) =>
      val resp = post(c, port,
        "trip_distance=3.2&passenger_count=1&pickup_hour=18&payment_type=1")
      assert(resp.statusCode() == 200, resp.body())
      val html = resp.body()
      // the duration the model must have been scored with: 3.2/12*60
      val durationEst = Scoring.estimateDurationMin(3.2)
      val expected = Scoring.predict(spark, model,
        Scoring.ScoringRequest(3.2, durationEst, 1, 18, 1))
      assert(html.contains(s"$$$expected"), s"fare $$${expected} not in:\n$html")
      assert(html.contains(s"${WebScoring.round1(durationEst)} min"))
      assert(html.contains("3.2 mi") && html.contains("Passengers: 1")
        && html.contains("Hour: 18 h"))
      // the reference's result chrome, dependency-free: gauge + map SVGs
      assert(html.contains("class=\"gauge\"") && html.contains("#ffd60a"),
        "fare gauge SVG missing from the result page")
      assert(html.contains("class=\"map\""), "NYC map SVG missing")
      assert(!html.contains("<script") && !html.contains("cdn"),
        "result chrome must stay self-contained (no JS/CDN)")
    }
  }

  test("POST /predict_web with -Dgraft.serve.fast=true renders the same fare (r13)") {
    val form = "trip_distance=3.2&passenger_count=1&pickup_hour=18&payment_type=1"
    def fareOf(html: String): String =
      "\\$\\d+\\.\\d+".r.findFirstIn(html).getOrElse(sys.error(s"no fare in:\n$html"))
    val slow = withServer { (c, port) => fareOf(post(c, port, form).body()) }
    System.setProperty("graft.serve.fast", "true")
    try {
      val fast = withServer { (c, port) =>
        val resp = post(c, port, form)
        assert(resp.statusCode() == 200, resp.body())
        fareOf(resp.body())
      }
      assert(fast == slow, s"fast-path fare $fast vs transform-path $slow")
    } finally System.clearProperty("graft.serve.fast")
  }

  test("gaugeSvg: arc endpoint tracks the fare fraction, clamped at range") {
    // half range → arc ends at the top of the semicircle (100, 20)
    val half = WebScoring.gaugeSvg(40.0)
    assert(half.contains("A 80 80 0 0 1 100.00 20.00"), half)
    // over range → clamped to the full arc (180, 100)
    val over = WebScoring.gaugeSvg(200.0)
    assert(over.contains("A 80 80 0 0 1 180.00 100.00"), over)
    // zero fare → no yellow arc path at all (degenerate arc suppressed)
    assert(!WebScoring.gaugeSvg(0.0).contains("#ffd60a"))
  }

  test("POST /predict_web: missing field renders str(KeyError) at 500") {
    withServer { (c, port) =>
      val resp = post(c, port, "trip_distance=3.2&passenger_count=1&pickup_hour=18")
      assert(resp.statusCode() == 500)
      assert(resp.body().contains("&#39;payment_type&#39;"),
        s"expected quoted KeyError name in:\n${resp.body()}")
    }
  }

  test("POST /predict_web: python coercion — int('1.5') fails, float('3.2') ok") {
    withServer { (c, port) =>
      val bad = post(c, port,
        "trip_distance=3.2&passenger_count=1.5&pickup_hour=18&payment_type=1")
      assert(bad.statusCode() == 500)
      assert(bad.body().contains("invalid literal for int()"))
      // Java-only float spelling rejected like Python
      val javaFloat = post(c, port,
        "trip_distance=3.2f&passenger_count=1&pickup_hour=18&payment_type=1")
      assert(javaFloat.statusCode() == 500)
      assert(javaFloat.body().contains("could not convert string to float"))
    }
  }

  test("GET /predict_web: method not allowed") {
    withServer { (c, port) =>
      val resp = c.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:$port/predict_web"))
          .GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 405)
    }
  }

  test("form parsing: url-decoding and empty values") {
    assert(WebScoring.parseForm("a=1&b=two%20words&c=") ==
      Map("a" -> "1", "b" -> "two words", "c" -> ""))
    assert(WebScoring.parseForm("") == Map.empty)
  }

  test("round1 is HALF_EVEN like Python round(x, 1)") {
    // 0.25 is binary-exact → a true tie → even neighbor, like Python
    assert(WebScoring.round1(0.25) == 0.2)
    assert(WebScoring.round1(0.75) == 0.8)
    // 0.45's double is slightly ABOVE the tie → rounds up, like Python
    assert(WebScoring.round1(0.45) == 0.5)
    assert(WebScoring.round1(16.0) == 16.0)
  }
}
