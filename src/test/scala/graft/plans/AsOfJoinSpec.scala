package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.TemporalJoins
import graft.sources.Tables

/** The native as-of join (custom LogicalPlan + Strategy + SparkPlan):
  * semantics against hand-built fixtures and against the union-merge
  * window form on real data, plus the physical-plan shape.
  */
class AsOfJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof semantics: latest strictly-earlier same-key right row, else null") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 12:00:00")),
      (2L, ts("2024-01-01 09:00:00")), // before any right row for key 2
      (3L, ts("2024-01-01 10:00:00")), // key absent on the right
    ).toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 11:00:00"), 20.0),
      (1L, ts("2024-01-01 12:00:00"), 99.0), // same-t: strict <, excluded
      (2L, ts("2024-01-01 09:30:00"), 7.0),
    ).toDF("k", "rt", "v")

    val got = AsOfJoinPlan.asofJoin(left, right, "k", "t", "rt", "v")
      .orderBy("k", "t")
      .select("k", "t", "asof_t", "asof_v")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), Option(r.getTimestamp(2)),
        Option(r.get(3)).map(_.asInstanceOf[Double])))

    assert(got.toSeq == Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 09:30:00")), Some(10.0)),
      (1L, ts("2024-01-01 12:00:00"), Some(ts("2024-01-01 11:00:00")), Some(20.0)),
      (2L, ts("2024-01-01 09:00:00"), None, None),
      (3L, ts("2024-01-01 10:00:00"), None, None),
    ))
  }

  test("native exec agrees row-for-row with the union-merge window form") {
    val ev = Tables.events(spark, Sf0001).select("event_id", "user_id", "ts", "value")
    val native = AsOfJoinPlan
      .asofJoin(ev, ev.select("user_id", "ts", "value"), "user_id", "ts", "ts", "value")
      .select(col("event_id"), col("asof_t"), col("asof_v"))
    val window = TemporalJoins
      .asofJoinBig(ev, ev.select("user_id", "ts", "value"), "user_id", "ts", "ts", "value")
      .select(col("event_id"), col("asof_t"), col("asof_v"))
    assert(native.count() == ev.count())
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
  }

  test("plan shape: AsOfJoinExec with per-side exchange+sort, no window, no union") {
    val ev = Tables.events(spark, Sf0001).select("event_id", "user_id", "ts", "value")
    val df = AsOfJoinPlan
      .asofJoin(ev, ev.select("user_id", "ts", "value"), "user_id", "ts", "ts", "value")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"native operator missing:\n$plan")
    assert(!plan.contains("Window"), s"window survived:\n$plan")
    assert(!plan.contains("Union"), s"union survived:\n$plan")
    // EnsureRequirements inserted the SMJ-shaped shuffle per side
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
  }

  test("self-join through the builder keeps expression ids distinct") {
    // same underlying frame on both sides — would be ambiguous without
    // the builder's right-side re-alias
    val df = Seq((1L, ts("2024-01-01 10:00:00"), 5.0))
      .toDF("k", "t", "v")
    val out = AsOfJoinPlan.asofJoin(df, df.withColumnRenamed("t", "rt"), "k", "t", "rt", "v")
    assert(out.columns.toSeq == Seq("k", "t", "v", "asof_t", "asof_v"))
    assert(out.count() == 1)
    assert(out.head().isNullAt(3)) // only right row is same-t → strict < excludes
  }
}
