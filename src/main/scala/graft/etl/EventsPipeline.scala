package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The SURVEY §7.2 vertical slice transplanted onto the driver's `events`
  * table: the same operator chain as [[Transformations.cleanAndTransform]]
  * (cast → duration → the four filter forms → date/hour derivations →
  * broadcast left lookup join) over the events schema, plus the
  * curated/agg writers. Used by the e2e correctness query and by Bench's
  * staged read/clean/write report.
  */
object EventsPipeline {

  /** Event-type lookup (S4 analog); omits 'error' → null desc exercises
    * the left-join miss path.
    */
  val EventLookup: Seq[(String, String)] = Seq(
    "click" -> "Click",
    "view" -> "View",
    "purchase" -> "Purchase",
    "signup" -> "Signup",
  )

  /** Clean-and-transform over a raw events frame (`ts` castable to
    * timestamp, numeric `value`/`user_id`, string `event_type`).
    */
  def clean(raw: DataFrame): DataFrame = {
    val spark = raw.sparkSession
    val sec = col("ts").cast("long")
    val durMin =
      (timestamp_seconds(sec + floor(col("value"))).cast("long") - sec) / 60.0
    val lookup =
      spark.createDataFrame(EventLookup).toDF("event_type", "event_desc")
    raw
      .withColumn("ts", col("ts").cast("timestamp")) // P1 (defensive re-cast)
      .withColumn("dur_min", durMin) // P2 analog
      .filter("value > 0 AND user_id >= 0") // F1
      .filter(col("dur_min").between(1, 180)) // F2
      .filter(col("value") > 0.5 && col("value") < 400.0 &&
        col("user_id") > 1 && col("user_id") < 140) // F3
      .withColumn("rate", col("value") / (col("dur_min") / 60.0)) // P6
      .filter(col("rate").between(0, 50000)) // F4
      .withColumn("d", to_date(col("ts"))) // P3
      .withColumn("hr", hour(col("ts"))) // P4
      .join(broadcast(lookup), Seq("event_type"), "left") // J1
  }

  /** Name under which [[cleanObserved]] registers its metrics. */
  val CleanMetricsName = "clean_metrics"

  /** [[clean]] instrumented with `Dataset.observe`: the pipeline's
    * data-quality counters (rows kept, value total, null lookup misses)
    * ride along with whatever action the caller runs — ZERO extra jobs,
    * the metrics accumulate inside the same pass. The production pattern
    * for pipeline observability at 100 TB, where a separate
    * count()/agg() audit pass would re-scan the corpus.
    *
    * The string-named `observe` overload deliberately, NOT the
    * `Observation` helper: the helper registers a listener holding the
    * session's (non-serializable) ObservationManager, which then leaks
    * into later closures on a shared session. Read metrics with
    * `df.queryExecution.observedMetrics(CleanMetricsName)` after an
    * action that executes THIS Dataset's queryExecution (collect /
    * toLocalIterator / a sink write of this frame) — count()/foreach
    * build separate executions whose metrics attach there instead. In
    * production the natural reader is a QueryExecutionListener on the
    * write job.
    */
  def cleanObserved(raw: DataFrame): DataFrame =
    clean(raw).observe(
      CleanMetricsName,
      count(lit(1)).as("rows_kept"),
      sum(col("value").cast("decimal(25,6)")).cast("double").as("value_total"),
      count(when(col("event_desc").isNull, 1)).as("lookup_misses"))

  /** A1 analog: per (date, hour, desc) counts and means. */
  def aggByHour(cleaned: DataFrame): DataFrame =
    cleaned
      .groupBy("d", "hr")
      .agg(
        count(lit(1)).as("total_events"),
        avg("value").as("avg_value"),
        avg("dur_min").as("avg_dur_min"),
        avg("rate").as("avg_rate"),
      )

  /** K1 analog: partitioned curated write. */
  def writeCurated(cleaned: DataFrame, path: String): Unit =
    cleaned.repartition(col("d"))
      .write.mode(SaveMode.Overwrite).partitionBy("d").parquet(path)

  /** K2+O5 analog: sampled aggregate, coalesced partitioned write. */
  def writeAggregates(cleaned: DataFrame, path: String,
      sampleFraction: Double = 0.05): Unit = {
    val input =
      if (sampleFraction < 1.0)
        cleaned.sample(withReplacement = false, sampleFraction, seed = 42)
      else cleaned
    aggByHour(input)
      .coalesce(4)
      .write.mode(SaveMode.Overwrite).partitionBy("d").parquet(path)
  }
}
