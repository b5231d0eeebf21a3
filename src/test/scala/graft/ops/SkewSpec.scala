package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Tables

/** The salted two-phase aggregation must be a pure re-association of the
  * direct group-by: identical counts, identical integral sums, and
  * double aggregates equal up to parallel-sum re-association.
  */
class SkewSpec extends SparkTestBase {

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    // The OTHER half of the skew story: salting (below) is the
    // plan-level fix the engine controls; AQE's runtime skew split is
    // the safety net for skew nobody predicted. This exhibit pins that
    // the session tuning actually delivers it: a hot key whose shuffle
    // partition dwarfs the median must come out of AQE re-planning as a
    // skew-split sort-merge join, visible as skew=true in the final
    // adaptive plan. Thresholds are lowered to make a test-sized
    // fixture cross the (byte-denominated) production defaults.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val fact = spark.range(0, 60000)
        .select(lit(7L).as("k"), col("id").as("payload"))
        .unionAll(spark.range(0, 32)
          .select((col("id") + 100).as("k"), col("id").as("payload")))
      val dim = spark.range(0, 200).select(col("id").as("k"), col("id").as("dv"))
      val joined = fact.join(dim, "k")
      assert(joined.collect().length == 60032)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"no runtime skew split in:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("AQE upgrades a join to broadcast when a side turns out tiny at runtime") {
    // static stats can't size a post-aggregation side, so the planner
    // starts from a shuffle join; AQE re-plans from the REAL exchange
    // size and must land a BroadcastHashJoin — the replan that saves a
    // fact-table shuffle whenever a filter or aggregate collapses one
    // side in ways no one could cost up front
    val big = spark.range(0, 50000).select(col("id").as("k"), col("id").as("v"))
    // selective aggregate: 50k rows in, 3 groups out — tiny at runtime
    val smallAtRuntime = spark.range(0, 50000)
      .select((col("id") % 3).as("k"), col("id").as("w"))
      .groupBy("k").agg(sum("w").as("sw"))
    val joined = big.join(smallAtRuntime, "k")
    assert(joined.collect().length == 3)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"runtime-tiny side not upgraded to broadcast:\n$p")
  }

  test("AQE coalesces an over-partitioned tiny shuffle") {
    // 32 session shuffle partitions for a 10-group aggregate: the final
    // adaptive plan must read the exchange through a coalesced
    // AQEShuffleRead instead of scheduling 32 near-empty reducers —
    // at cluster scale this is what keeps small stages from paying
    // fixed per-task cost 200×.
    val df = spark.range(0, 1000).groupBy((col("id") % 10).as("g"))
      .agg(count(lit(1)).as("n"))
    assert(df.collect().length == 10)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AQEShuffleRead") && p.contains("coalesced"),
      s"tiny shuffle not coalesced:\n$p")
  }

  test("saltedAgg equals direct groupBy on a skewed key distribution") {
    val ev = Tables.events(spark, Sf0001)
      .withColumn("day", to_date(col("ts"))) // few distinct values = skewed keys
    val direct = ev.groupBy("day")
      .agg(count(lit(1)).as("n"), sum("user_id").as("sum_user_id"),
        avg("value").as("avg_value"))
    val saltedDf = Skew.saltedAgg(ev, Seq("day"), Seq("user_id"), Seq("value"), nSalts = 8)

    val d = direct.orderBy("day").collect()
    val s = saltedDf.orderBy("day").collect()
    assert(d.length == s.length && d.nonEmpty)
    d.zip(s).foreach { case (a, b) =>
      assert(a.getDate(0) == b.getDate(0))
      assert(a.getLong(1) == b.getLong(1), "count must be exact")
      assert(a.getLong(2) == b.getLong(2), "integral sum must be exact")
      assert(math.abs(a.getDouble(3) - b.getDouble(3)) <= 1e-9 * math.abs(a.getDouble(3)),
        "double avg equal up to re-association")
    }
  }

  test("salting is deterministic across reruns") {
    val ev = Tables.events(spark, Sf0001)
    val a = Skew.saltedAgg(ev, Seq("event_type"), Nil, Seq("value"), 8).collect()
    val b = Skew.saltedAgg(ev, Seq("event_type"), Nil, Seq("value"), 8).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
  }

  test("saltedJoin equals the plain inner join, row for row") {
    import spark.implicits._
    // skewed fact: key 1 dominates; dim with extra keys (unmatched rows
    // must vanish exactly as in a plain inner join)
    val fact = (1 to 1000).map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, i))
      .toDF("k", "payload")
    val dim = (0L to 20L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    val plain = fact.join(dim, "k")
    val salted = Skew.saltedJoin(fact, dim, "k", nSalts = 8)
    assert(salted.count() == plain.count())
    val cols = plain.columns.map(col)
    assert(salted.select(cols: _*).except(plain).isEmpty &&
      plain.except(salted.select(cols: _*)).isEmpty)
    // the degenerate hot key: BYTE-IDENTICAL rows (a content-only hash
    // would collapse them onto one salt). Same salt expression as the
    // op; the positional component must fan them out.
    val clones = Seq.fill(1000)((1L, 0)).toDF("k", "payload")
    val salts = clones.withColumn(
      "_salt",
      pmod(hash(clones.columns.map(col) :+ monotonically_increasing_id(): _*),
        lit(8)))
      .select("_salt").distinct().count()
    assert(salts > 1, "identical hot rows should fan out over multiple salts")
    // and semantics still hold for the clone fact
    val cloneJoin = Skew.saltedJoin(clones, dim, "k", nSalts = 8)
    assert(cloneJoin.count() == 1000)
  }
}
