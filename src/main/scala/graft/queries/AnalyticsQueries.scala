package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Behavior
import graft.sources.Tables

/** Gate queries for the behavioral / time-series analytics family
  * ([[graft.ops.Behavior]]): cohort retention, ordered funnels,
  * gaps-and-islands activity spans. DuckDB-hash-checked like the rest
  * of the gate; the operators are additionally unit-proven on crafted
  * event fixtures in BehaviorSpec.
  */
object AnalyticsQueries {

  /** Daily cohort retention (day granularity discriminates on the 30-day
    * synthetic window; weekly collapses to one cohort).
    */
  def qRetention(s: SparkSession, dir: String): DataFrame =
    Behavior.retention(Tables.events(s, dir), "user_id", "ts",
        truncUnit = "day", unitDays = 1)
      .orderBy("cohort", "periods_since")

  /** view → click → purchase within 24 h of the first view, each step
    * strictly after the previous.
    */
  def qFunnel(s: SparkSession, dir: String): DataFrame =
    Behavior.funnel(Tables.events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowSec = 86400)
      .orderBy("step_idx")

  /** Per-user activity islands split at 2 h of silence. */
  def qIslands(s: SparkSession, dir: String): DataFrame =
    Behavior.activityIslands(Tables.events(s, dir), "user_id", "ts",
        "event_id", "value", gapSec = 7200)
      .orderBy("user_id", "island_start")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_retention" -> (qRetention _),
    "q_funnel" -> (qFunnel _),
    "q_islands" -> (qIslands _),
  )

  val oracleSql: Map[String, String] = Map(
    // date_trunc returns DATE in DuckDB, TIMESTAMP in Spark → ::TIMESTAMP;
    // int division spelled // (DuckDB / on ints is float division)
    "q_retention" ->
      ("WITH wk AS (SELECT DISTINCT user_id AS u, " +
        "date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS period FROM events), " +
        "ch AS (SELECT u, min(period) AS cohort FROM wk GROUP BY u), " +
        "off AS (SELECT wk.u, cohort, " +
        "(date_diff('day', cohort::DATE, period::DATE) // 1)::INT AS periods_since " +
        "FROM wk JOIN ch ON wk.u = ch.u), " +
        "c AS (SELECT cohort, periods_since, count(DISTINCT u) AS n_users " +
        "FROM off GROUP BY 1, 2) " +
        "SELECT cohort, periods_since, n_users, n_users::DOUBLE / " +
        "first(n_users) OVER (PARTITION BY cohort ORDER BY periods_since) AS retention " +
        "FROM c ORDER BY cohort, periods_since"),
    // nested min-ts CTE per step mirrors the operator's join chain
    "q_funnel" ->
      ("WITH e AS (SELECT user_id AS u, event_type AS ty, ts::TIMESTAMP AS t FROM events), " +
        "s1 AS (SELECT u, min(t) AS t1 FROM e WHERE ty = 'view' GROUP BY u), " +
        "s2 AS (SELECT s1.u, t1, min(e.t) AS t2 FROM s1 JOIN e ON e.u = s1.u " +
        "AND e.ty = 'click' AND e.t > s1.t1 " +
        "AND e.t <= s1.t1 + INTERVAL 86400 SECONDS GROUP BY s1.u, t1), " +
        "s3 AS (SELECT s2.u, min(e.t) AS t3 FROM s2 JOIN e ON e.u = s2.u " +
        "AND e.ty = 'purchase' AND e.t > s2.t2 " +
        "AND e.t <= s2.t1 + INTERVAL 86400 SECONDS GROUP BY s2.u, s2.t1, s2.t2), " +
        "c AS (SELECT 1::INT AS step_idx, 'view' AS step, count(*)::BIGINT AS n_users FROM s1 " +
        "UNION ALL SELECT 2::INT, 'click', count(*)::BIGINT FROM s2 " +
        "UNION ALL SELECT 3::INT, 'purchase', count(*)::BIGINT FROM s3) " +
        "SELECT step_idx, step, n_users, n_users::DOUBLE / " +
        "first(n_users) OVER (ORDER BY step_idx) AS conversion " +
        "FROM c ORDER BY step_idx"),
    // second-granularity gap compare: Spark ts.cast(long) truncates to
    // seconds == DuckDB floor(epoch()) for post-epoch data
    "q_islands" ->
      ("WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS t, value, " +
        "floor(epoch(ts::TIMESTAMP))::BIGINT AS sec FROM events), " +
        "f AS (SELECT *, CASE WHEN sec - lag(sec) OVER w > 7200 " +
        "OR lag(sec) OVER w IS NULL THEN 1 ELSE 0 END AS nw FROM e " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), " +
        "g AS (SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY t, event_id " +
        "ROWS UNBOUNDED PRECEDING)::BIGINT AS island_id FROM f) " +
        "SELECT user_id, island_id, min(t) AS island_start, max(t) AS island_end, " +
        "count(*) AS n_events, " + Oracle.dsum("value") + " AS sum_value " +
        "FROM g GROUP BY user_id, island_id ORDER BY user_id, island_start"),
  )
}
