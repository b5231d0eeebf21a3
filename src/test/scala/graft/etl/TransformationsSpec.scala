package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Tables

/** Boundary semantics of cleanAndTransform against the committed fixture
  * (FIXTURES.md: inclusive BETWEEN vs strict coords, lookup miss → null,
  * USING-join column placement).
  */
class TransformationsSpec extends SparkTestBase {

  lazy val raw = Tables.csvInfer(spark, FixtureCsv)
  lazy val clean = Transformations.cleanAndTransform(raw).cache()

  test("raw CSV infers timestamps for datetime columns") {
    val types = raw.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("tpep_pickup_datetime") == "timestamp")
    assert(types("tpep_dropoff_datetime") == "timestamp")
    assert(types("trip_distance") == "double")
    assert(types("passenger_count") == "integer")
  }

  test("inclusive duration bounds: exactly 1 and 180 min survive, 0.5/181 dropped") {
    val durs = clean.select("trip_duration_min").as[Double](spark.implicits.newDoubleEncoder)
      .collect()
    assert(durs.contains(1.0))
    assert(durs.contains(180.0))
    assert(durs.forall(d => d >= 1.0 && d <= 180.0))
  }

  test("inclusive speed bound: exactly 120 survives, above dropped") {
    val speeds = clean.select("avg_speed_kmh").as[Double](spark.implicits.newDoubleEncoder)
      .collect()
    assert(speeds.contains(120.0))
    assert(speeds.forall(s => s >= 0.0 && s <= 120.0))
  }

  test("strict coordinate bounds: boundary values -75/-72/40/42 dropped") {
    val n = clean.filter(
      col("pickup_longitude") === -75.0 || col("pickup_longitude") === -72.0 ||
        col("pickup_latitude") === 40.0 || col("dropoff_latitude") === 42.0).count()
    assert(n == 0)
  }

  test("amount/passenger filters drop non-positive rows") {
    assert(clean.filter("trip_distance <= 0 OR fare_amount <= 0 OR total_amount <= 0 OR passenger_count <= 0").count() == 0)
  }

  test("left lookup join: unmatched payment_type 7 kept with null desc") {
    val m = clean.filter(col("payment_type") === 7)
    assert(m.count() == 1)
    assert(m.filter(col("payment_desc").isNull).count() == 1)
  }

  test("left join preserves row count (no multiplication, no drops)") {
    val preJoin = clean.drop("payment_desc").count()
    assert(clean.count() == preJoin)
  }

  test("USING-join places payment_type first; derived columns present") {
    val cols = clean.columns
    assert(cols.head == "payment_type")
    assert(Seq("trip_duration_min", "pickup_date", "pickup_hour",
      "pickup_dow", "avg_speed_kmh", "payment_desc").forall(cols.contains))
  }

  test("pickup_dow uses en-US 'E' abbreviations") {
    val dows = clean.select("pickup_dow").distinct()
      .as[String](spark.implicits.newStringEncoder).collect().toSet
    val valid = Set("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
    assert(dows.subsetOf(valid))
  }

  test("plan: filters push below projections and join broadcasts") {
    val plan = clean.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // single fused scan stage: filters collapse into one Filter over scan
    assert(plan.contains("PushedFilters") || plan.contains("Filter"))
  }
}
