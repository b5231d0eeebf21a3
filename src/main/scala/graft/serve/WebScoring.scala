package graft.serve

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.SparkSession

/** HTML web front-end, flow-compatible with the reference's Flask webapp
  * (`/root/reference/src/webapp/webapp.py:26-82`):
  *
  *  - `GET /` — the empty estimator form (`webapp.py:26-29`).
  *  - `POST /predict_web` — form-urlencoded fields `trip_distance`
  *    (float), `passenger_count`, `pickup_hour`, `payment_type` (ints);
  *    duration is DERIVED from distance via the `AVG_SPEED_MPH = 12`
  *    heuristic (`webapp.py:46-53` — [[Scoring.estimateDurationMin]]),
  *    the model scores the five-feature row, and the page re-renders
  *    with the 2-dp fare, the echoed inputs, and the 1-dp duration
  *    (`webapp.py:70-77`). Any failure — missing field, un-coercible
  *    value, scoring error — re-renders the form with the error message
  *    at status 500, like the reference's catch-all (`webapp.py:79-81`).
  *
  * Semantics matched, skin original: the reference's Jinja template
  * (`src/webapp/templates/index.html`) pulls Bootstrap, Chart.js and
  * Leaflet from CDNs for its result chrome. This page serves the same
  * form fields (same names/constraints, same six payment-type options),
  * the same result data, AND the same chrome content — the semicircular
  * fare gauge ([[gaugeSvg]]: yellow arc within the `maxFare = 80`
  * reference range, `index.html:216-245`) and the illustrative NYC
  * area map ([[MapSvg]], `index.html:246+`) — as server-rendered inline
  * SVG in self-contained HTML: no CDN, no JavaScript, no tile fetches. Field coercion reuses the Python
  * `float()`/`int()` string grammar from [[HttpScoring]] (form values
  * always arrive as strings), and a missing field renders as Python's
  * `str(KeyError)` — the quoted field name — matching what Flask's
  * `request.form[...]` raises into the reference's handler.
  *
  * A separate server from [[HttpScoring]], as in the reference (two
  * Flask apps on different ports: `api/app.py` JSON vs `webapp.py` HTML).
  */
object WebScoring {

  /** Python `round(x, 1)` — HALF_EVEN, for the duration chip
    * (`webapp.py:76`).
    */
  def round1(x: Double): Double =
    new JBigDecimal(x).setScale(1, RoundingMode.HALF_EVEN).doubleValue()

  /** application/x-www-form-urlencoded body → field map (last value
    * wins, like Flask's `request.form[...]`).
    */
  private[serve] def parseForm(body: String): Map[String, String] =
    body.split("&").iterator.filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => URLDecoder.decode(k, UTF_8) -> URLDecoder.decode(v, UTF_8)
        case Array(k) => URLDecoder.decode(k, UTF_8) -> ""
      }
    }.toMap

  /** `request.form[name]` — absent key raises KeyError, whose str() is
    * the quoted key; that string is what the reference renders.
    */
  private def formField(form: Map[String, String], name: String): String =
    form.getOrElse(name, throw new NoSuchElementException(s"'$name'"))

  private def esc(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case '\'' => "&#39;"
    case c => c.toString
  }

  /** The six payment options — the same (code, label) literals as the
    * curated lookup (`Transformations.PaymentLookup`), which the
    * reference's form options mirror (`index.html:144-151`).
    */
  private val PaymentOptions = Seq(
    1 -> "Credit Card", 2 -> "Cash", 3 -> "No Charge",
    4 -> "Dispute", 5 -> "Unknown", 6 -> "Voided trip")

  /** The reference's fare-range ceiling for the gauge
    * (`index.html:221`: `maxFare = 80` — "rango de referencia").
    */
  private val GaugeMaxFare = 80.0

  /** The reference's semicircular fare gauge (`index.html:216-245`:
    * a Chart.js doughnut, yellow arc = fare within an 80-dollar
    * reference range) as SERVER-RENDERED inline SVG — same visual
    * content, no CDN, no JavaScript. Arc endpoint computed here instead
    * of by a charting library.
    */
  private[serve] def gaugeSvg(fare: Double): String = {
    val frac = math.min(math.max(fare / GaugeMaxFare, 0.0), 1.0)
    val (cx, cy, r) = (100.0, 100.0, 80.0)
    val theta = math.Pi * frac
    val endX = cx - r * math.cos(theta)
    val endY = cy - r * math.sin(theta)
    // Locale.ROOT: the f interpolator uses the JVM default locale, and a
    // comma-decimal locale (de_DE) would emit "100,00 20,00" — invalid
    // SVG path data
    def p2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val arc =
      if (frac < 0.005) "" // zero-length arc paths render as artifacts
      else s"""  <path d="M 20 100 A 80 80 0 0 1 ${p2(endX)} ${p2(endY)}" fill="none" stroke="#ffd60a" stroke-width="16" stroke-linecap="round"/>"""
    s"""<svg class="gauge" viewBox="0 0 200 112" role="img" aria-label="Fare gauge: $$$fare of $$${GaugeMaxFare.toInt} reference range">
       |  <path d="M 20 100 A 80 80 0 0 1 180 100" fill="none" stroke="#333" stroke-width="16" stroke-linecap="round"/>
       |$arc
       |  <text x="100" y="92" text-anchor="middle" class="gauge-num">$$${esc(fare.toString)}</text>
       |</svg>""".stripMargin
  }

  /** The reference's "Mapa ilustrativo NYC" (`index.html:246-…`: a
    * Leaflet/OSM tile map centered on 40.75,−73.98, explicitly labeled
    * illustrative — no per-trip data on it) as a static inline-SVG
    * sketch of the yellow-cab operating area: stylized Manhattan
    * between the Hudson and East rivers, marker at the reference's map
    * center. Same informational content (an illustrative locator, not
    * a data visualization), zero tiles fetched.
    */
  private[serve] val MapSvg: String =
    """<svg class="map" viewBox="0 0 220 160" role="img" aria-label="Illustrative map of the NYC yellow-cab operating area">
      |  <rect width="220" height="160" fill="#dce9f2"/>
      |  <path d="M 0 30 C 60 20 120 40 220 24 L 220 0 L 0 0 Z" fill="#c6d8b5"/>
      |  <path d="M 150 160 C 160 110 170 80 220 60 L 220 160 Z" fill="#c6d8b5"/>
      |  <path d="M 60 160 C 75 110 85 70 95 30 L 120 34 C 112 75 105 120 96 160 Z" fill="#f3e9c8" stroke="#b9a95f" stroke-width="1.5"/>
      |  <circle cx="104" cy="72" r="6" fill="#b00020"/>
      |  <circle cx="104" cy="72" r="2.4" fill="#fff"/>
      |  <text x="10" y="152" class="map-label">Manhattan &amp; surroundings (illustrative)</text>
      |</svg>""".stripMargin

  /** Render the page. `result` carries (prediction, distance,
    * passengers, hour, durationEst); `error` the failure message.
    * Fidelity note: the reference's `{% if prediction %}` treats a 0.0
    * fare as falsy and hides the block — replicated here.
    */
  private[serve] def page(
      result: Option[(Double, Double, Int, Int, Double)] = None,
      error: Option[String] = None): String = {
    val errorBlock = error.map(e =>
      s"""<p class="error" role="alert">Error: ${esc(e)}</p>""").getOrElse("")
    val resultBlock = result.filter(_._1 != 0.0).map {
      case (pred, dist, pax, hour, dur) =>
        s"""<section class="result">
           |  <h2>Estimated fare</h2>
           |  <p class="fare">$$${esc(pred.toString)}</p>
           |  <ul class="trip">
           |    <li>Distance: ${esc(dist.toString)} mi</li>
           |    <li>Passengers: $pax</li>
           |    <li>Hour: $hour h</li>
           |    <li>Estimated duration: ${esc(dur.toString)} min</li>
           |  </ul>
           |  <div class="panels">
           |    <figure>
           |      <figcaption>Fare gauge</figcaption>
           |${gaugeSvg(pred)}
           |      <small>The yellow arc places your fare within a $$${GaugeMaxFare.toInt} reference range.</small>
           |    </figure>
           |    <figure>
           |      <figcaption>NYC area</figcaption>
           |$MapSvg
           |      <small>Approximate yellow-cab operating zone (Manhattan and surroundings).</small>
           |    </figure>
           |  </div>
           |</section>""".stripMargin
    }.getOrElse("")
    val options = PaymentOptions.map { case (code, label) =>
      s"""        <option value="$code">${esc(label)}</option>"""
    }.mkString("\n")
    s"""<!doctype html>
       |<html lang="en">
       |<head>
       |  <meta charset="utf-8">
       |  <meta name="viewport" content="width=device-width, initial-scale=1">
       |  <title>NYC Taxi Fare Estimator</title>
       |  <style>
       |    body { font-family: system-ui, sans-serif; max-width: 34rem;
       |           margin: 2rem auto; padding: 0 1rem; }
       |    label { display: block; margin: .75rem 0 .25rem; }
       |    input, select { width: 100%; padding: .4rem; }
       |    button { margin-top: 1rem; padding: .5rem 1.5rem; }
       |    .fare { font-size: 2rem; margin: .25rem 0; }
       |    .trip li { margin: .15rem 0; }
       |    .error { color: #b00020; }
       |    .panels { display: flex; gap: 1rem; flex-wrap: wrap; }
       |    .panels figure { flex: 1 1 14rem; margin: 0; }
       |    .panels figcaption { font-weight: 600; margin-bottom: .25rem; }
       |    .panels small { color: #555; }
       |    .gauge, .map { width: 100%; height: auto; }
       |    .gauge-num { font: 700 1.1rem system-ui, sans-serif; }
       |    .map-label { font: .55rem system-ui, sans-serif; fill: #555; }
       |  </style>
       |</head>
       |<body>
       |  <h1>NYC Taxi fare estimator</h1>
       |$errorBlock
       |  <form method="POST" action="/predict_web">
       |    <label>Trip distance (miles)
       |      <input type="number" step="0.1" min="0.1" name="trip_distance" required>
       |    </label>
       |    <label>Passengers
       |      <input type="number" min="1" max="6" name="passenger_count" required>
       |    </label>
       |    <label>Pickup hour (0&ndash;23)
       |      <input type="number" min="0" max="23" name="pickup_hour" required>
       |    </label>
       |    <label>Payment type
       |      <select name="payment_type">
       |$options
       |      </select>
       |    </label>
       |    <button type="submit">Estimate fare</button>
       |  </form>
       |$resultBlock
       |</body>
       |</html>
       |""".stripMargin
  }

  /** Handle one /predict_web form post: the reference's five steps
    * (`webapp.py:33-77`) — read form, derive duration, build the row,
    * score, render. Returns (status, html). `fast` (wired from
    * `-Dgraft.serve.fast=true` at server start, like [[HttpScoring]])
    * scores via the driver-side [[Scoring.FastScorer]] — bit-for-bit
    * equal predictions, no per-request plan analysis.
    */
  private[serve] def predictWeb(
      spark: SparkSession,
      model: PipelineModel,
      body: String,
      fast: Option[Scoring.FastScorer] = None): (Int, String) =
    try {
      val form = parseForm(body)
      val tripDistance = HttpScoring.pyFloat(formField(form, "trip_distance"))
      val passengerCount = HttpScoring.pyInt(formField(form, "passenger_count"))
      val pickupHour = HttpScoring.pyInt(formField(form, "pickup_hour"))
      val paymentType = HttpScoring.pyInt(formField(form, "payment_type"))
      val durationEst = Scoring.estimateDurationMin(tripDistance)
      val req = Scoring.ScoringRequest(
        trip_distance = tripDistance,
        trip_duration_min = durationEst,
        passenger_count = passengerCount,
        pickup_hour = pickupHour,
        payment_type = paymentType)
      val pred = fast.fold(Scoring.predict(spark, model, req))(_.predict(req))
      (200, page(result =
        Some((pred, tripDistance, passengerCount, pickupHour, round1(durationEst)))))
    } catch {
      case scala.util.control.NonFatal(e) =>
        (500, page(error = Some(Option(e.getMessage).getOrElse(e.toString))))
    }

  /** Start the web front-end on `port` (0 → ephemeral). Caller owns the
    * lifecycle: `stop(0)` when done.
    */
  def start(spark: SparkSession, model: PipelineModel, port: Int): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    val fast: Option[Scoring.FastScorer] =
      if (sys.props.get("graft.serve.fast").contains("true"))
        Some(Scoring.fastScorer(model))
      else None

    def respond(ex: HttpExchange, code: Int, html: String): Unit = {
      val bytes = html.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "text/html; charset=utf-8")
      ex.sendResponseHeaders(code, bytes.length)
      try ex.getResponseBody.write(bytes)
      finally ex.close()
    }

    server.createContext("/predict_web", (ex: HttpExchange) =>
      try {
        if (ex.getRequestMethod != "POST")
          respond(ex, 405, page(error = Some("Method Not Allowed")))
        else {
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          val (code, html) = predictWeb(spark, model, body, fast)
          respond(ex, code, html)
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          respond(ex, 500, page(error = Some(Option(e.getMessage).getOrElse(e.toString))))
      })

    server.createContext("/", (ex: HttpExchange) =>
      try respond(ex, 200, page())
      catch { case scala.util.control.NonFatal(_) => ex.close() })

    server.start()
    server
  }
}
