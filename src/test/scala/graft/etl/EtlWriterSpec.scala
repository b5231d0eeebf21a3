package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Tables

class EtlWriterSpec extends SparkTestBase {

  lazy val clean =
    Transformations.cleanAndTransform(Tables.csvInfer(spark, FixtureCsv)).cache()

  test("curated write: hive-partitioned by pickup_date, partition column last on read-back") {
    val out = tmpDir("curated")
    EtlWriter.writeCurated(clean, out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("pickup_date=")))

    val back = spark.read.parquet(out)
    assert(back.columns.last == "pickup_date") // SURVEY §7.5-3
    assert(back.count() == clean.count())
  }

  test("curated read-back prunes partitions on pickup_date predicates") {
    val out = tmpDir("curated_prune")
    EtlWriter.writeCurated(clean, out)
    val back = spark.read.parquet(out).filter(col("pickup_date") === "2015-01-03")
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("pickup_date"))
    assert(back.count() > 0)
  }

  test("trips_by_hour aggregate matches a hand-rolled recomputation") {
    val agg = EtlWriter.tripsByHour(clean)
    val row = agg.filter(col("pickup_hour") === 9)
      .orderBy("pickup_date").limit(1).collect().head
    val d = row.getAs[java.sql.Date]("pickup_date")
    val manual = clean
      .filter(col("pickup_date") === d && col("pickup_hour") === 9)
    assert(row.getAs[Long]("total_trips") == manual.count())
    val expectAvg = manual.agg(avg("trip_distance")).head().getDouble(0)
    assert(math.abs(row.getAs[Double]("avg_distance_mi") - expectAvg) < 1e-9)
  }

  test("aggregate write: coalesce(4) bounds file count, sample<1 reduces input") {
    val out = tmpDir("agg")
    EtlWriter.writeAggregates(clean, out, sampleFraction = 1.0, show = false)
    val back = spark.read.parquet(out)
    assert(back.columns.last == "pickup_date")
    assert(back.count() == EtlWriter.tripsByHour(clean).count())

    val outS = tmpDir("agg_sample")
    EtlWriter.writeAggregates(clean, outS, sampleFraction = 0.3, show = false)
    val sampled = spark.read.parquet(outS)
    val full = back.agg(sum("total_trips")).head().getLong(0)
    val part = sampled.agg(sum("total_trips")).head().getLong(0)
    assert(part > 0 && part < full)
  }

  test("observed clean: metrics ride the action, match direct aggregates") {
    val events = Tables.events(spark, Sf0001)
    val observed = EventsPipeline.cleanObserved(events)
    // drive the observed plan ITSELF via collect (count()/foreach build
    // SEPARATE QueryExecutions whose metrics attach elsewhere; collect
    // executes this Dataset's own queryExecution)
    val rows = observed.collect().length
    val m = observed.queryExecution
      .observedMetrics(EventsPipeline.CleanMetricsName)
    assert(m.getAs[Long]("rows_kept") == rows)
    val direct = EventsPipeline.clean(events)
      .agg(sum(col("value").cast("decimal(25,6)")).cast("double"),
        count(when(col("event_desc").isNull, 1)))
      .head()
    assert(m.getAs[Double]("value_total") == direct.getDouble(0))
    assert(m.getAs[Long]("lookup_misses") == direct.getLong(1))
  }

  test("MainEtl end-to-end on the fixture: report + layers exist") {
    val root = tmpDir("etl_root")
    val paths = EnginePaths.under(root).copy(raw = FixtureCsv)
    val report = MainEtl.run(spark, paths, sampleFraction = 1.0, show = false)
    assert(report.rows > 1000)
    assert(spark.read.parquet(paths.curated).count() == report.rows)
    assert(spark.read.parquet(paths.aggTripsByHour).count() > 0)
    assert(report.totalSec > 0)
    // read-back verification stage ran and re-read both layers: the agg
    // row count it reports must match an independent re-read, and its
    // wall-clock must be accounted in the report
    assert(report.aggRows == spark.read.parquet(paths.aggTripsByHour).count())
    assert(report.verifySec > 0)
  }
}
