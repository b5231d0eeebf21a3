package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Tables

/** The typed layer must be a zero-cost view: same rows, same physical
  * plan shape, and typed aggregates equal their untyped twins.
  */
class TypedLayerSpec extends SparkTestBase {

  lazy val clean =
    Transformations.cleanAndTransform(Tables.csvInfer(spark, FixtureCsv)).cache()

  test("typed dataset round-trips the curated rows losslessly") {
    val ds = TypedLayer.curated(clean)
    assert(ds.count() == clean.count())
    val t = ds.head()
    assert(t.trip_duration_min >= 1.0 && t.trip_duration_min <= 180.0)
    // lookup misses surface as None, not null NPEs
    assert(ds.collect().forall(t => t.payment_desc != null))
  }

  test("typed encoder attach adds no shuffle to the plan") {
    val p = TypedLayer.curated(clean).queryExecution.executedPlan.toString
    // the upstream lineage's BroadcastExchange (lookup join) is fine;
    // the typed view itself must add no data-moving shuffle
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning"),
      s"typed view must not shuffle:\n$p")
  }

  test("typed filter matches the untyped predicate") {
    val typedN = TypedLayer.longTrips(TypedLayer.curated(clean), 5.0).count()
    val untypedN = clean.filter(col("trip_distance") >= 5.0).count()
    assert(typedN == untypedN)
  }

  test("typed grouped aggregate equals the untyped twin") {
    val typed = TypedLayer.revenueByPayment(TypedLayer.curated(clean))
      .orderBy("payment_desc").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val untyped = clean
      .withColumn("payment_desc", coalesce(col("payment_desc"), lit("UNKNOWN")))
      .groupBy("payment_desc")
      .agg(count(lit(1)).as("n_trips"), sum("total_amount").as("revenue"))
      .orderBy("payment_desc").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(typed.sameElements(untyped))
  }
}
