package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Behavior, Graphs, Stats, TimeSeries}
import graft.queries.Det._
import graft.sources.Tables

/** Gate queries for the behavioral / time-series analytics family
  * ([[graft.ops.Behavior]], [[graft.ops.TimeSeries]],
  * [[graft.ops.Stats]]): cohort retention, ordered funnels,
  * gaps-and-islands activity spans, grid resampling with forward fill,
  * SCD2 validity intervals, fixed-width histograms, per-key z-score
  * anomalies, and graph analytics ([[graft.ops.Graphs]]: co-occurrence
  * edge derivation + degree-ordered triangle counting).
  * DuckDB-hash-checked like the rest of the gate; the operators are
  * additionally unit-proven on crafted fixtures in BehaviorSpec /
  * TimeSeriesSpec / GraphsSpec.
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

  /** Hourly per-user grid with forward-filled value sums. */
  def qResample(s: SparkSession, dir: String): DataFrame =
    TimeSeries.resampleFill(Tables.events(s, dir), "user_id", "ts", "value")
      .orderBy("user_id", "bucket")

  /** SCD2 state history of each user's event_type change log. */
  def qScd2(s: SparkSession, dir: String): DataFrame =
    TimeSeries.scd2(Tables.events(s, dir), "user_id", "ts", "event_id",
        "event_type")
      .orderBy("user_id", "valid_from")

  /** Recency-weighted per-user value: half-life-decayed sums against
    * the corpus's last day ([[TimeSeries.decayedSum]]); weights are
    * exact dyadic rationals (0.5^k), so no rounding discipline is
    * needed before the decimal sums.
    */
  def qDecay(s: SparkSession, dir: String): DataFrame =
    TimeSeries.decayedSum(Tables.events(s, dir), "user_id", "ts", "value",
        halfLifeDays = 7)
      .orderBy("user_id")

  /** 20-bin fixed-width histogram of event values. */
  def qHistogram(s: SparkSession, dir: String): DataFrame =
    Stats.fixedWidthHistogram(Tables.events(s, dir), "value", nBins = 20)
      .orderBy("bin")

  /** Users' 2-sigma daily-activity outliers against their own history. */
  def qAnomaly(s: SparkSession, dir: String): DataFrame =
    Stats.dailyCountAnomalies(Tables.events(s, dir), "user_id", "ts",
        zThreshold = 2.0)
      .orderBy("user_id", "day")

  /** Per-part triangle counts in the co-purchase graph (parts sharing
    * an order), via the degree-ordered wedge join.
    */
  def qTriangles(s: SparkSession, dir: String): DataFrame =
    Graphs.triangleCounts(
        Graphs.coOccurrenceEdges(
          Tables.table(s, dir, "lineitem"), "l_orderkey", "l_partkey"))
      .orderBy("vertex")

  /** 3-iteration PageRank over the co-purchase graph; ranks ×1000 so
    * the 6-dp rounding keeps ~6 significant digits.
    */
  def qPageRank(s: SparkSession, dir: String): DataFrame =
    Graphs.pageRank(
        Graphs.coOccurrenceEdges(
          Tables.table(s, dir, "lineitem"), "l_orderkey", "l_partkey"),
        damping = 0.85, iters = 3)
      .select(col("x").as("vertex"), r6(col("r") * lit(1000.0)).as("rank_k"))
      .orderBy("vertex")

  /** Join-skew audit ([[graft.ops.Skew.joinSkewAudit]]) over the
    * co-purchase self-join that motivated the q_triangles strategy
    * work: top-20 order keys by `n_left · n_right` fanout — the keys a
    * salting/blacklist decision targets, measured without running the
    * skewed join.
    */
  def qSkewAudit(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.table(s, dir, "lineitem")
    graft.ops.Skew.joinSkewAudit(li, li, "l_orderkey", topN = 20)
  }

  /** Leave-one-out target encoding
    * ([[graft.ops.Features.targetEncodeLoo]]) of event_type by `value`
    * — each row's feature is the mean of the OTHER rows of its
    * category, the leak-free high-cardinality encoding.
    */
  def qTargetEnc(s: SparkSession, dir: String): DataFrame =
    graft.ops.Features.targetEncodeLoo(
        Tables.events(s, dir), "event_type", "value")
      .select("event_id", "event_type", "value", "event_type_enc")
      .orderBy("event_id")

  /** Winsorization summary ([[graft.ops.Features.winsorizeSummary]]):
    * per-type [p05, p95] exact-discrete cuts, clip counts, and the
    * winsorized decimal sum — robust-statistics pre-pass.
    */
  def qWinsorize(s: SparkSession, dir: String): DataFrame =
    graft.ops.Features.winsorizeSummary(
        Tables.events(s, dir), "event_type", "value", pLo = 0.05, pHi = 0.95)
      .orderBy("event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_retention" -> (qRetention _),
    "q_funnel" -> (qFunnel _),
    "q_islands" -> (qIslands _),
    "q_resample" -> (qResample _),
    "q_scd2" -> (qScd2 _),
    "q_histogram" -> (qHistogram _),
    "q_anomaly" -> (qAnomaly _),
    "q_triangles" -> (qTriangles _),
    "q_decay" -> (qDecay _),
    "q_pagerank" -> (qPageRank _),
    "q_skew_audit" -> (qSkewAudit _),
    "q_target_enc" -> (qTargetEnc _),
    "q_winsorize" -> (qWinsorize _),
  )

  private def coPurchaseEdgesSql: String =
    "SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v " +
      "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey " +
      "AND a.l_partkey < b.l_partkey"

  val oracleSql: Map[String, String] = Map(
    "q_skew_audit" ->
      ("WITH l AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_left " +
        "FROM lineitem GROUP BY 1), " +
        "r AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_right " +
        "FROM lineitem GROUP BY 1), " +
        "f AS (SELECT l_orderkey, n_left, n_right, " +
        "n_left * n_right AS fanout FROM l JOIN r USING (l_orderkey)), " +
        "t AS (SELECT CAST(sum(fanout) AS BIGINT) AS tot FROM f) " +
        "SELECT l_orderkey, n_left, n_right, fanout, " +
        Oracle.r6("fanout / tot") + " AS share FROM f, t " +
        "ORDER BY fanout DESC, l_orderkey LIMIT 20"),
    // decimal numerators subtracted exactly, ONE double division, r6 —
    // the same chain Features.targetEncodeLoo spells
    "q_target_enc" ->
      ("WITH c AS (SELECT event_type, " +
        "sum(CAST(value AS DECIMAL(25,6))) AS csum, " +
        "CAST(count(*) AS BIGINT) AS cn FROM events GROUP BY 1), " +
        "g AS (SELECT sum(CAST(value AS DECIMAL(25,6))) AS gsum, " +
        "CAST(count(*) AS BIGINT) AS gn FROM events) " +
        "SELECT event_id, event_type, value, " +
        "CASE WHEN cn > 1 THEN " +
        Oracle.r6("CAST(CAST(csum - CAST(value AS DECIMAL(25,6)) " +
          "AS VARCHAR) AS DOUBLE) / (cn - 1)") +
        " ELSE " +
        Oracle.r6("CAST(CAST(gsum - CAST(value AS DECIMAL(25,6)) " +
          "AS VARCHAR) AS DOUBLE) / (gn - 1)") +
        " END AS event_type_enc " +
        "FROM events JOIN c USING (event_type), g ORDER BY event_id"),
    // percentile_disc spelled as its SQL-standard cume_dist definition
    // (the q_ppl_band discipline); cut values are data, not arithmetic
    "q_winsorize" ->
      ("WITH cd AS (SELECT event_type, value AS v, " +
        "cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd " +
        "FROM events), " +
        "lo AS (SELECT event_type, min(v) AS cut_lo FROM cd " +
        "WHERE cd >= 0.05 GROUP BY 1), " +
        "hi AS (SELECT event_type, min(v) AS cut_hi FROM cd " +
        "WHERE cd >= 0.95 GROUP BY 1), " +
        "j AS (SELECT e.event_type, value, cut_lo, cut_hi FROM events e " +
        "JOIN lo USING (event_type) JOIN hi USING (event_type)) " +
        "SELECT event_type, count(*) AS n, " +
        "CAST(sum(CASE WHEN value < cut_lo THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_clip_lo, " +
        "CAST(sum(CASE WHEN value > cut_hi THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_clip_hi, " +
        "max(cut_lo) AS cut_lo, max(cut_hi) AS cut_hi, " +
        Oracle.r6("CAST(CAST(sum(CAST(CASE WHEN value < cut_lo THEN cut_lo " +
          "WHEN value > cut_hi THEN cut_hi ELSE value END " +
          "AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE)") + " AS sum_winsorized " +
        "FROM j GROUP BY 1 ORDER BY event_type"),
    "q_decay" ->
      ("WITH m AS (SELECT date_trunc('day', max(ts)) AS max_day FROM events), " +
        "e AS (SELECT user_id, value, pow(0.5, (date_diff('day', " +
        "date_trunc('day', ts), max_day) // 7)::INT) AS w FROM events, m), " +
        "g AS (SELECT user_id, count(*) AS n_events, " +
        Oracle.dsum("value") + " AS sum_value, " +
        Oracle.dsum("value * w") + " AS decayed_value FROM e GROUP BY 1) " +
        "SELECT user_id, n_events, sum_value, decayed_value, " +
        Oracle.r6("decayed_value / sum_value") + " AS recency " +
        "FROM g ORDER BY user_id"),
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
    // Spark sequence(lo, hi, 1 hour) == DuckDB unnest(generate_series);
    // last_value IGNORE NULLS == Spark last(ignoreNulls) (default frames
    // agree: unbounded preceding → current row, bucket unique per key)
    "q_resample" ->
      ("WITH h AS (SELECT user_id, date_trunc('hour', ts::TIMESTAMP)::TIMESTAMP AS bucket, " +
        "count(*)::BIGINT AS n_events, " + Oracle.dsum("value") + " AS sum_value " +
        "FROM events GROUP BY 1, 2), " +
        "sp AS (SELECT user_id, unnest(generate_series(min(bucket), max(bucket), " +
        "INTERVAL 1 HOUR)) AS bucket FROM h GROUP BY user_id), " +
        "j AS (SELECT sp.user_id, sp.bucket, coalesce(h.n_events, 0) AS n_events, " +
        "h.sum_value FROM sp LEFT JOIN h ON sp.user_id = h.user_id AND sp.bucket = h.bucket) " +
        "SELECT user_id, bucket, n_events, sum_value, " +
        "last_value(sum_value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket) " +
        "AS filled_value FROM j ORDER BY user_id, bucket"),
    "q_scd2" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, ts::TIMESTAMP AS t FROM events), " +
        "c AS (SELECT *, lag(event_type) OVER " +
        "(PARTITION BY user_id ORDER BY t, event_id) AS prev FROM e), " +
        "ch AS (SELECT * FROM c WHERE prev IS NULL OR prev <> event_type) " +
        "SELECT user_id, event_type AS state, t AS valid_from, " +
        "lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS valid_to, " +
        "(lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL) AS is_current " +
        "FROM ch ORDER BY user_id, valid_from"),
    // bin arithmetic spelled identically on both engines (no
    // width_bucket in DuckDB); doubles are IEEE-identical given the
    // same expression tree
    "q_histogram" ->
      ("WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events), " +
        "g AS (SELECT least(floor((e.value - b.lo) / ((b.hi - b.lo) / 20)), 19.0)::INT AS bin, " +
        "e.value AS v, b.lo, b.hi FROM events e CROSS JOIN b) " +
        "SELECT bin, first(lo + bin * ((hi - lo) / 20)) AS bin_lo, " +
        "count(*)::BIGINT AS n, " + Oracle.davg("v") + " AS avg_value " +
        "FROM g GROUP BY bin ORDER BY bin"),
    // integer moment sums are exact in BIGINT; the z expression is the
    // same double tree on both engines
    "q_anomaly" ->
      ("WITH d AS (SELECT user_id, date_trunc('day', ts::TIMESTAMP)::TIMESTAMP AS day, " +
        "count(*)::BIGINT AS cnt FROM events GROUP BY 1, 2), " +
        "s AS (SELECT user_id, count(*)::BIGINT AS n, sum(cnt)::BIGINT AS sm, " +
        "sum(cnt*cnt)::BIGINT AS sq FROM d GROUP BY user_id HAVING count(*) > 1), " +
        // zero variance → z = NaN, which both engines order above any
        // threshold — the var > 0 guard matches the operator's
        "v AS (SELECT user_id, sm::DOUBLE / n AS mean, " +
        "(sq::DOUBLE - sm::DOUBLE * sm::DOUBLE / n) / (n - 1) AS var FROM s), " +
        "z AS (SELECT d.user_id, d.day, d.cnt, " +
        "(d.cnt::DOUBLE - v.mean) / sqrt(v.var) AS zscore " +
        "FROM d JOIN v ON d.user_id = v.user_id WHERE v.var > 0) " +
        "SELECT user_id, day, cnt, " + Oracle.r6("zscore") + " AS zscore " +
        "FROM z WHERE abs(zscore) > 2 ORDER BY user_id, day"),
    // degree-oriented adjacency-list intersection (r11, VERDICT r10
    // task 3). The previous spelling enumerated the wedge join and
    // closed it against the edge table — semantically identical, but
    // DuckDB's planner, misestimating the wedge cardinality, built a
    // hash table ON the wedge stream and spilled past 78 GB at sf1
    // (reproduced this round before rewriting). This form bounds every
    // intermediate structurally: orientation (low (deg,id) → high)
    // caps out-degree at ~√(2m), adjacency lists group ONCE over the
    // 1×|dir| stream, and each triangle x→y,x→z,y→z is found exactly
    // once at its base edge (x,y) as z ∈ adj[x] ∩ adj[y] — the only
    // big stream (unnested triangles) flows straight into the final
    // aggregate with no join or build after it. Same per-vertex
    // multiset as the engine's wedge formulation.
    "q_triangles" ->
      ("WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v " +
        "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey " +
        "AND a.l_partkey < b.l_partkey), " +
        "deg AS (SELECT x, count(*) AS d FROM " +
        "(SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY x), " +
        "dir AS (SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s, " +
        "CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS t " +
        "FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v), " +
        "adj AS (SELECT s, list(t) AS nb FROM dir GROUP BY s), " +
        "tri AS (SELECT d.s AS a, d.t AS b, " +
        "unnest(list_intersect(na.nb, nb.nb)) AS c " +
        "FROM dir d JOIN adj na ON na.s = d.s JOIN adj nb ON nb.s = d.t) " +
        "SELECT vertex, count(*)::BIGINT AS n_triangles FROM " +
        "(SELECT unnest([a, b, c]) AS vertex FROM tri) " +
        "GROUP BY vertex ORDER BY vertex"),
    "q_pagerank" -> Graphs.pageRankOracleSql(
      coPurchaseEdgesSql, damping = 0.85, iters = 3,
      finalSelect = "SELECT x AS vertex, " + Oracle.r6("r * 1000.0") +
        " AS rank_k FROM r3 ORDER BY vertex"),
  )
}
